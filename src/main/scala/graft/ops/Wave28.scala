package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-eighth wave (round 8): the native mergeable sketch tier —
  *
  *  - q252: KMV distinct sketches per group through the engine's own
  *    [[graft.functions.KmvSketch]] TypedImperativeAggregate. q241
  *    proved the estimator compositionally (limit-64 TakeOrdered per
  *    set); this is the production shape — ONE pass over the fact
  *    table, partial sketches merged through the shuffle at ≤8·k bytes
  *    per (partition, group), the same mergeable-sketch contract as
  *    HLL but with an exactly-specified result the DuckDB oracle
  *    emulates verbatim (`(array_agg(DISTINCT h ORDER BY h))[1:k]`).
  *    Every sketch element is still oracle-gated, but as a '|'-joined
  *    STRING — the driver's comparer lexsorts result cells through
  *    pandas, which cannot hash a raw ARRAY cell (the one red row of
  *    round 8), so gated outputs must be atomic-typed (enforced
  *    repo-wide by AtomicOutputSchemaSpec).
  *
  * Hash note: ids are reduced mod the prime 1,000,000,007 before the
  * Knuth multiply so the product stays under 2^63 for any key the
  * scale ladder can produce ((p−1)·2654435761 ≈ 2.65e18 < 2^63). The
  * prime exceeds every table's key cardinality through sf100
  * (lineitem partkeys at sf100 ≈ 2e8), so the reduction is
  * collision-free at all scales this engine is specified for — unlike
  * the earlier 1,000,003 modulus which collided pairwise from sf10's
  * 2M part keys up.
  */
object Wave28 {

  private val K = 64L
  private val M = 2147483648L

  /** q252: per-returnflag distinct-part sketches + estimates from the
    * native KMV aggregate, exact distinct counts alongside. */
  private def qKmvNative(s: SparkSession, dir: String): DataFrame = {
    val h = load(s, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      expr("((l_partkey % 1000000007) * 2654435761) % 2147483648").as("h"),
      col("l_partkey"))
    h.groupBy(col("flag"))
      .agg(graft.functions.KmvSketch.kmv(col("h"), K.toInt).as("sketch"),
        countDistinct(col("l_partkey")).as("exact_distinct"))
      .select(col("flag"),
        size(col("sketch")).cast("long").as("n_sketch"),
        element_at(col("sketch"), size(col("sketch"))).as("theta"),
        expr(s"CASE WHEN size(sketch) < $K THEN CAST(size(sketch) AS " +
          s"BIGINT) ELSE (${K - 1} * ${M}L) div element_at(sketch, " +
          "size(sketch)) END").as("est_distinct"),
        col("exact_distinct"),
        array_join(expr("CAST(sketch AS ARRAY<STRING>)"), "|")
          .as("sketch_str"))
      .orderBy(col("flag"))
  }

  private val qKmvNativeSql =
    s"""WITH h AS (
       |  SELECT l_returnflag AS flag,
       |    ((l_partkey % 1000000007) * 2654435761) % 2147483648 AS hh,
       |    l_partkey
       |  FROM lineitem),
       |g AS (
       |  SELECT flag,
       |    (array_agg(DISTINCT hh ORDER BY hh))[1:$K] AS sketch,
       |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
       |  FROM h GROUP BY 1)
       |SELECT flag, CAST(len(sketch) AS BIGINT) AS n_sketch,
       |  CAST(sketch[len(sketch)] AS BIGINT) AS theta,
       |  CAST(CASE WHEN len(sketch) < $K THEN len(sketch)
       |    ELSE (${K - 1} * $M) // sketch[len(sketch)] END AS BIGINT)
       |    AS est_distinct,
       |  exact_distinct, array_to_string(sketch, '|') AS sketch_str
       |FROM g ORDER BY flag""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q252_kmv_native" -> QueryDef(qKmvNative, Some(qKmvNativeSql),
      "per-group KMV sketches via the native mergeable aggregate, " +
        "every sketch element oracle-gated"))
}
