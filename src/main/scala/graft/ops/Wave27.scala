package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-seventh wave (round 8): physical-layout planning — the two
  * reports a lakehouse optimizer reads before rewriting a table:
  *
  *  - q250: ZONE-MAP (min/max) PRUNING effectiveness. Given the q245
  *    compaction plan, how many bins would a predicate skip, and how
  *    much over-read survives inside the scanned bins? The number that
  *    decides whether a sort/cluster rewrite pays for itself.
  *  - q251: EXACT RANGE-SPLIT planning. Equal-depth partition
  *    boundaries for a range shuffle, computed EXACTLY with the
  *    engine's distributed prefix-sum device (`Ranks.prefixSum`) —
  *    what Spark's RangePartitioner estimates by sampling, as a
  *    deterministic oracle-checkable plan, with per-bucket skew ppm.
  *
  * House rules: integer exactness, deterministic orders, DuckDB
  * oracle per query, windows partitioned or provably bounded. */
object Wave27 {

  // ------------------------------------------------------------- q250

  private val BinChars = 4096L
  private val Thresholds = Seq(1000L, 3000L, 5000L)

  /** q250: zone-map pruning audit. Bins come from q245's greedy plan
    * (source-partitioned prefix-sum); each bin carries min/max n_chars
    * zone stats. For each `n_chars ≥ T` probe: bins pruned (max < T),
    * files scanned in surviving bins, exactly-matching files, and the
    * over-read share — scanned-but-not-matching, the cost zone maps
    * cannot remove without a sort. Thresholds ride an explode (×3
    * bounded blowup), never a join against the growing bins table. */
  private def qMinmaxPruning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val docs = load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val bins = docs
      .withColumn("before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("bin", expr(s"before div $BinChars"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), max(col("n_chars")).as("max_c"))
    val thArr = array(Thresholds.map(lit): _*)
    val audited = bins
      .select(col("n_files"), col("max_c"), explode(thArr).as("threshold"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_bins"),
        sum(when(col("max_c") < col("threshold"), 1L).otherwise(0L))
          .as("pruned_bins"),
        sum(when(col("max_c") >= col("threshold"), col("n_files"))
          .otherwise(0L)).as("scanned_files"))
    val matching = docs
      .select(explode(thArr).as("threshold"), col("n_chars"))
      .groupBy(col("threshold"))
      .agg(sum(when(col("n_chars") >= col("threshold"), 1L)
        .otherwise(0L)).as("matching_files"))
    audited.join(matching, Seq("threshold"))
      .select(col("threshold"), col("n_bins"), col("pruned_bins"),
        col("scanned_files"), col("matching_files"),
        expr("CASE WHEN scanned_files = 0 THEN 0 ELSE " +
          "(scanned_files - matching_files) * 1000000 div scanned_files" +
          " END").as("overread_ppm"))
      .orderBy(col("threshold"))
  }

  private val qMinmaxPruningSql = {
    val values = Thresholds.mkString("(", "), (", ")")
    s"""WITH planned AS (
       |  SELECT source, doc_id, n_chars,
       |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $BinChars AS bin
       |  FROM documents),
       |bins AS (
       |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       |    CAST(MAX(n_chars) AS BIGINT) AS max_c
       |  FROM planned GROUP BY 1, 2),
       |th AS (SELECT * FROM (VALUES $values) v(threshold)),
       |audited AS (
       |  SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_bins,
       |    CAST(SUM(CASE WHEN max_c < threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS pruned_bins,
       |    CAST(SUM(CASE WHEN max_c >= threshold THEN n_files ELSE 0 END)
       |      AS BIGINT) AS scanned_files
       |  FROM bins CROSS JOIN th GROUP BY 1),
       |matching AS (
       |  SELECT threshold,
       |    CAST(SUM(CASE WHEN n_chars >= threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS matching_files
       |  FROM documents CROSS JOIN th GROUP BY 1)
       |SELECT threshold, n_bins, pruned_bins, scanned_files,
       |  matching_files,
       |  CASE WHEN scanned_files = 0 THEN 0 ELSE
       |    (scanned_files - matching_files) * 1000000 // scanned_files
       |    END AS overread_ppm
       |FROM audited JOIN matching USING (threshold)
       |ORDER BY threshold""".stripMargin
  }

  // ------------------------------------------------------------- q251

  private val Buckets = 8L

  /** q251: exact equal-depth RANGE-SPLIT plan over l_partkey. Keys are
    * pre-aggregated (ties collapse — also shrinks the shuffle), the
    * global running row count comes from `Ranks.prefixSum` (range-
    * repartition + per-partition offsets: no single-task window), and
    * each key's bucket is `(cum−1)·B div N` by its END position — a
    * key never splits, so a mega-key's skew lands visibly in one
    * bucket's dev_ppm instead of being hidden by fractional math.
    * Output: per bucket the upper boundary key, key/row counts, and
    * the deviation from the ideal N/B in ppm of N. */
  private def qRangeSplits(s: SparkSession, dir: String): DataFrame = {
    val counts = load(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("key"))
      .agg(count(lit(1)).as("n"))
    val cum = graft.util.Ranks.prefixSum(counts, Seq.empty,
      Seq(col("key")), col("n"), "cum")
    val total = cum.agg(max(col("cum")).as("total")) // one-row scalar
    cum.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"(cum - 1) * $Buckets div total + 1"))
      .groupBy(col("bucket"))
      .agg(max(col("key")).as("upper_key"),
        count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("total")).as("total"))
      .select(col("bucket"), col("upper_key"), col("n_keys"),
        col("n_rows"),
        expr(s"(n_rows - total div $Buckets) * 1000000 div total")
          .as("dev_ppm"))
      .orderBy(col("bucket"))
  }

  private val qRangeSplitsSql =
    s"""WITH counts AS (
       |  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM lineitem GROUP BY 1),
       |cum AS (
       |  SELECT key, n, CAST(SUM(n) OVER (ORDER BY key
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum
       |  FROM counts),
       |tot AS (SELECT CAST(MAX(cum) AS BIGINT) AS total FROM cum)
       |SELECT (cum - 1) * $Buckets // total + 1 AS bucket,
       |  CAST(MAX(key) AS BIGINT) AS upper_key,
       |  CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(n) AS BIGINT) AS n_rows,
       |  CAST((SUM(n) - total // $Buckets) * 1000000 // total AS BIGINT)
       |    AS dev_ppm
       |FROM cum, tot
       |GROUP BY 1, total ORDER BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q250_minmax_pruning" -> QueryDef(qMinmaxPruning,
      Some(qMinmaxPruningSql),
      "zone-map pruning effectiveness audit over the compaction plan"),
    "q251_range_splits" -> QueryDef(qRangeSplits, Some(qRangeSplitsSql),
      "exact equal-depth range-split plan via distributed prefix sum"))
}
