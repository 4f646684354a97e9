package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-fifth wave (round 8): lakehouse maintenance and supervised
  * time-series preparation —
  *
  *  - q245: FILE-COMPACTION planner. Small-file compaction is the
  *    single most common table-maintenance job at lake scale; the
  *    sequential "pack files until the bin is full" greedy is the
  *    same prefix-sum interval device as q237's FIFO: a file starts
  *    in bin `running_before div target`, so planning is one
  *    partitioned window, no loop.
  *  - q246: LAG-FEATURE matrix. The canonical feature-engineering
  *    shape for training tabular/forecast models: per-entity daily
  *    lags, rolling sums, and a next-period label, all through
  *    entity-partitioned windows (never a global sort).
  *  - q247: WALK-FORWARD BACKTEST of naive vs seasonal-naive
  *    forecasters on the daily series — the standard "which baseline
  *    do we have to beat" report, exact integer errors.
  *
  * House rules: integer exactness, deterministic orders, DuckDB
  * oracle per query, windows partitioned or provably bounded. */
object Wave25 {

  // ------------------------------------------------------------- q245

  /** Compaction bin capacity in characters (the stand-in for target
    * file bytes). */
  private val BinChars = 4096L

  /** q245: COMPACTION plan per source. Files (documents) pack
    * greedily in (doc_id) order: a file's bin is its exclusive
    * prefix-sum div capacity — one source-partitioned window. The
    * report aggregates the plan per source: bins used vs the lower
    * bound ceil(total/capacity), mean fill ppm, and the heaviest
    * bin — the numbers an operator reads before running a rewrite.
    * Oversized single files (> capacity) legitimately overflow their
    * bin; they surface through max_bin_chars. */
  private def qCompactionBins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val planned = load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("before", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("bin", expr(s"before div $BinChars"))
    val bins = planned.groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("chars"))
    bins.groupBy(col("source"))
      .agg(sum(col("n_files")).as("n_files"),
        sum(col("chars")).as("total_chars"),
        count(lit(1)).as("n_bins"),
        max(col("chars")).as("max_bin_chars"),
        max(col("n_files")).as("max_bin_files"))
      .select(col("source"), col("n_files"), col("total_chars"),
        col("n_bins"),
        expr(s"(total_chars + ${BinChars - 1}) div $BinChars")
          .as("min_bins"),
        expr(s"total_chars * 1000000 div (n_bins * $BinChars)")
          .as("fill_ppm"),
        col("max_bin_chars"), col("max_bin_files"))
      .orderBy(col("source"))
  }

  private val qCompactionBinsSql =
    s"""WITH planned AS (
       |  SELECT source, doc_id, n_chars,
       |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $BinChars AS bin
       |  FROM documents),
       |bins AS (
       |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       |    CAST(SUM(n_chars) AS BIGINT) AS chars
       |  FROM planned GROUP BY 1, 2)
       |SELECT source, CAST(SUM(n_files) AS BIGINT) AS n_files,
       |  CAST(SUM(chars) AS BIGINT) AS total_chars,
       |  CAST(COUNT(*) AS BIGINT) AS n_bins,
       |  CAST((SUM(chars) + ${BinChars - 1}) // $BinChars AS BIGINT)
       |    AS min_bins,
       |  CAST(SUM(chars) * 1000000 // (COUNT(*) * $BinChars) AS BIGINT)
       |    AS fill_ppm,
       |  CAST(MAX(chars) AS BIGINT) AS max_bin_chars,
       |  CAST(MAX(n_files) AS BIGINT) AS max_bin_files
       |FROM bins GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q246

  /** q246: LAG-FEATURE matrix for the 5 busiest users: per active
    * day — event count, exact cents, count lagged 1 and 7 ACTIVE days
    * back, a 7-active-day rolling count, and the next active day's
    * count as the supervised label. Active-day lags (not calendar) —
    * the per-entity calendar spine is the one shape that explodes at
    * scale, and the busiest-user cap keeps the report bounded while
    * the windows stay entity-partitioned and linear. */
  private def qLagFeatures(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.util.Pin(load(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
          .as("cents"))) // consumed twice: top-user pick + feature join
    val top = daily.groupBy(col("user_id"))
      .agg(sum(col("n")).as("total"))
      .orderBy(col("total").desc, col("user_id")).limit(5)
      .select(col("user_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    daily.join(broadcast(top), Seq("user_id"))
      .withColumn("lag1_n", lag(col("n"), 1).over(w))
      .withColumn("lag7_n", lag(col("n"), 7).over(w))
      .withColumn("roll7_n", sum(col("n")).over(w.rowsBetween(-6, 0)))
      .withColumn("next_n", lead(col("n"), 1).over(w))
      .select(col("user_id"), col("day"), col("n"), col("cents"),
        col("lag1_n"), col("lag7_n"), col("roll7_n"), col("next_n"))
      .orderBy(col("user_id"), col("day"))
  }

  private val qLagFeaturesSql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2),
      |top AS (
      |  SELECT user_id FROM daily GROUP BY user_id
      |  ORDER BY SUM(n) DESC, user_id LIMIT 5)
      |SELECT user_id, day, n, cents,
      |  lag(n, 1) OVER w AS lag1_n,
      |  lag(n, 7) OVER w AS lag7_n,
      |  CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll7_n,
      |  lead(n, 1) OVER w AS next_n
      |FROM daily SEMI JOIN top USING (user_id)
      |WINDOW w AS (PARTITION BY user_id ORDER BY day)
      |ORDER BY user_id, day""".stripMargin

  // ------------------------------------------------------------- q247

  /** q247: WALK-FORWARD BACKTEST — naive (t−1) vs seasonal-naive (t−7)
    * on the zero-filled global daily event-count series. The spine is
    * bounded by the observation span (days, not rows), so its global
    * window is audited-bounded; errors are exact integers; the verdict
    * row reports each forecaster's MAE (ppm-scaled) and head-to-head
    * wins over the days where both are defined. */
  private def qBacktest(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = span.select(
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    // bounded: one row per day of span (PlanAuditSpec allow-list)
    val w = Window.orderBy(col("day"))
    val scored = spine
      .withColumn("naive", lag(col("n"), 1).over(w))
      .withColumn("seasonal", lag(col("n"), 7).over(w))
      .filter(col("naive").isNotNull && col("seasonal").isNotNull)
      .select(col("n"), abs(col("n") - col("naive")).as("e1"),
        abs(col("n") - col("seasonal")).as("e7"))
    // empty-series guard: n_days = 0 would throw under ANSI div
    scored.agg(count(lit(1)).as("n_days"),
        coalesce(sum(col("e1")), lit(0L)).as("abs_err_naive"),
        coalesce(sum(col("e7")), lit(0L)).as("abs_err_seasonal"),
        coalesce(sum(when(col("e7") < col("e1"), 1L).otherwise(0L)),
          lit(0L)).as("seasonal_wins"),
        coalesce(sum(when(col("e1") < col("e7"), 1L).otherwise(0L)),
          lit(0L)).as("naive_wins"))
      .select(col("n_days"), col("abs_err_naive"), col("abs_err_seasonal"),
        expr("CASE WHEN n_days = 0 THEN 0 ELSE " +
          "abs_err_naive * 1000000 div n_days END").as("mae_naive_micro"),
        expr("CASE WHEN n_days = 0 THEN 0 ELSE " +
          "abs_err_seasonal * 1000000 div n_days END")
          .as("mae_seasonal_micro"),
        col("seasonal_wins"), col("naive_wins"))
  }

  private val qBacktestSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT CAST(u.day AS DATE) AS day FROM (
      |    SELECT unnest(generate_series(
      |      (SELECT MIN(day) FROM daily),
      |      (SELECT MAX(day) FROM daily), INTERVAL 1 DAY)) AS day) u),
      |filled AS (
      |  SELECT spine.day, COALESCE(n, 0) AS n
      |  FROM spine LEFT JOIN daily ON daily.day = spine.day),
      |scored AS (
      |  SELECT n, abs(n - lag(n, 1) OVER w) AS e1,
      |    abs(n - lag(n, 7) OVER w) AS e7
      |  FROM filled WINDOW w AS (ORDER BY day))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(COALESCE(SUM(e1), 0) AS BIGINT) AS abs_err_naive,
      |  CAST(COALESCE(SUM(e7), 0) AS BIGINT) AS abs_err_seasonal,
      |  CAST(CASE WHEN COUNT(*) = 0 THEN 0
      |    ELSE SUM(e1) * 1000000 // COUNT(*) END AS BIGINT)
      |    AS mae_naive_micro,
      |  CAST(CASE WHEN COUNT(*) = 0 THEN 0
      |    ELSE SUM(e7) * 1000000 // COUNT(*) END AS BIGINT)
      |    AS mae_seasonal_micro,
      |  CAST(COALESCE(SUM(CASE WHEN e7 < e1 THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS seasonal_wins,
      |  CAST(COALESCE(SUM(CASE WHEN e1 < e7 THEN 1 ELSE 0 END), 0)
      |    AS BIGINT) AS naive_wins
      |FROM scored WHERE e1 IS NOT NULL AND e7 IS NOT NULL""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q245_compaction_bins" -> QueryDef(qCompactionBins,
      Some(qCompactionBinsSql),
      "file-compaction planner via source-partitioned prefix-sum bins"),
    "q246_lag_features" -> QueryDef(qLagFeatures, Some(qLagFeaturesSql),
      "per-entity lag/rolling feature matrix with next-period label"),
    "q247_forecast_backtest" -> QueryDef(qBacktest, Some(qBacktestSql),
      "walk-forward naive vs seasonal-naive backtest, exact errors"))
}
