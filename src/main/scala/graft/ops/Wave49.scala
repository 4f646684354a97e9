package graft.ops

import graft.{QueryDef, Tables}
import graft.util.Ranks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Forty-ninth wave (round 10): optimizer statistics export —
  *
  *  - q295: ANALYZE-GRADE COLUMN STATS — the equi-depth histogram +
  *    most-common-values pair every cost-based optimizer keeps per
  *    column (and what q289 showed uniformity-only stats get wrong).
  *    Three measure columns are melted to (col, value) on the exact
  *    cent/unit grid; each column's values are ranked by the
  *    DISTRIBUTED per-group prefix-scan ([[Ranks.prefixSum]] with the
  *    column name as the partition key — never a single-task global
  *    sort), cut into 16 equal-depth buckets by rank arithmetic, and
  *    each bucket reports its [lo, hi] bounds and count; beside the
  *    histogram, the 4 most common values per column (count desc,
  *    value asc — deterministic) with their frequencies. Histogram
  *    boundaries and MCVs are exactly the stats a 100-TB planner
  *    feeds its selectivity model; everything is rank arithmetic on
  *    integers, so both engines agree bit-for-bit.
  *
  * Scale shape: one melt scan, one range-partitioned prefix-scan per
  * the Ranks device (parallel at any size), one ≤(3×16)-row histogram
  * aggregate, one keyed top-4 window over per-value counts. */
object Wave49 {

  // ------------------------------------------------------------- q295

  private val HistBuckets = 16
  private val McvK = 4

  private def qColumnStats(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val melt = graft.util.Pin(Seq(
      li.select(lit("l_quantity").as("c"),
        expr("CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)").as("v")),
      li.select(lit("l_extendedprice").as("c"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .as("v")),
      li.select(lit("l_suppkey").as("c"), col("l_suppkey").as("v")))
      .reduce(_ unionByName _))
    val n = melt.groupBy(col("c")).agg(count(lit(1)).as("n"))
    // per-column global rank by (value): ties are interchangeable for
    // equi-depth bounds, counts per bucket are rank arithmetic either
    // way; the per-(value) pre-aggregate keeps the scan keyed
    val byVal = melt.groupBy(col("c"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = Ranks.prefixSum(byVal, Seq("c"), Seq(col("v")),
      col("cnt"), "cum")
    // a value spans ranks (cum-cnt, cum]; assign the value's rows to
    // buckets by slicing that rank interval on the 16 equal cuts
    val hist = ranked.join(broadcast(n), Seq("c"))
      .select(col("c"), col("v"), col("cnt"), col("cum"), col("n"),
        explode(expr(s"sequence(0, ${HistBuckets - 1})")).as("b"))
      // bucket b covers ranks (b*n div 16, (b+1)*n div 16]
      .withColumn("blo", expr(s"b * n div $HistBuckets"))
      .withColumn("bhi", expr(s"(b + 1) * n div $HistBuckets"))
      .filter(col("cum") > col("blo") &&
        col("cum") - col("cnt") < col("bhi"))
      .withColumn("in_bucket",
        least(col("cum"), col("bhi")) -
          greatest(col("cum") - col("cnt"), col("blo")))
      .groupBy(col("c"), col("b"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("in_bucket")).as("n_rows"))
      .select(col("c"), lit("hist").as("kind"),
        col("b").cast("long").as("idx"), col("lo"), col("hi"),
        col("n_rows"))
    val w = Window.partitionBy(col("c"))
      .orderBy(col("cnt").desc, col("v").asc)
    val mcv = byVal.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= McvK)
      .select(col("c"), lit("mcv").as("kind"),
        (col("rk") - 1).cast("long").as("idx"), col("v").as("lo"),
        col("v").as("hi"), col("cnt").as("n_rows"))
    hist.unionByName(mcv)
      .orderBy(col("c"), col("kind"), col("idx"))
  }

  private val qColumnStatsSql = {
    val melt =
      """SELECT 'l_quantity' AS c,
        |  CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS v
        |FROM lineitem
        |UNION ALL SELECT 'l_extendedprice',
        |  CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |FROM lineitem
        |UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem"""
        .stripMargin
    s"""WITH melt AS MATERIALIZED ($melt),
       |n AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM melt
       |      GROUP BY 1),
       |bv AS MATERIALIZED (
       |  SELECT c, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM melt
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT c, v, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY c ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM bv),
       |hist AS (
       |  SELECT c, 'hist' AS kind, CAST(b AS BIGINT) AS idx,
       |    MIN(v) AS lo, MAX(v) AS hi,
       |    CAST(SUM(LEAST(cum, (b + 1) * n.n // $HistBuckets) -
       |      GREATEST(cum - cnt, b * n.n // $HistBuckets)) AS BIGINT)
       |      AS n_rows
       |  FROM r JOIN n USING (c), range(0, $HistBuckets) t(b)
       |  WHERE cum > b * n.n // $HistBuckets
       |    AND cum - cnt < (b + 1) * n.n // $HistBuckets
       |  GROUP BY 1, 2, 3),
       |mcv AS (
       |  SELECT c, 'mcv' AS kind,
       |    CAST(row_number() OVER (PARTITION BY c
       |      ORDER BY cnt DESC, v) - 1 AS BIGINT) AS idx,
       |    v AS lo, v AS hi, cnt AS n_rows
       |  FROM bv QUALIFY row_number() OVER (PARTITION BY c
       |    ORDER BY cnt DESC, v) <= $McvK)
       |SELECT * FROM hist
       |UNION ALL SELECT * FROM mcv
       |ORDER BY c, kind, idx""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q295_column_stats" -> QueryDef(qColumnStats, Some(qColumnStatsSql),
      "ANALYZE-grade column statistics: 16-bucket equi-depth " +
        "histogram (distributed per-column prefix-scan ranks, rank- " +
        "interval slicing) + 4 most-common values per column, all on " +
        "the exact integer grid"))
}
