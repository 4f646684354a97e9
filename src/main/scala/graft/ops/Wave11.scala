package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Eleventh wave (round 7): the MODEL-EVALUATION battery — the reports
  * a training-data pipeline runs on a scored validation slice before a
  * model (or a data-quality classifier feeding the curation queries)
  * is allowed to gate anything: calibration (reliability diagram +
  * ECE), the Brier score with its Murphy decomposition, gains/lift,
  * the precision/recall operating table, and a Hellinger drift check
  * between serving windows.
  *
  * One shared device: a deterministic synthetic "classifier" over
  * `events` — score_ppm in [0, 10^6) derived from an md5-seeded
  * uniform plus a +0.25 shift on true positives (purchases). The
  * shift makes every metric non-trivial (AUC ≈ 0.7, miscalibrated by
  * construction) while staying integer-exact in both engines
  * (hex→int via `conv`/`0x`-cast, the q166 device).
  *
  * House rules throughout: the ONLY per-row work is one map-side-
  * combinable groupBy onto a ≤(segments×bins) histogram; every
  * statistic is then bounded-table arithmetic in BIGINT with
  * DECIMAL(38,0)/HUGEINT routing where products can pass 2^63; square
  * roots go through the `graft_isqrt` ±1-corrected integer device
  * (MathExpressions.scala) so no float ever reaches a compared value. */
object Wave11 {

  /** Scored validation slice: (segment, pos, score_ppm). Positives are
    * shifted up 250k ppm, then clamped — uniform noise*3/4 keeps
    * negatives in [0, 749999] so the top bin is positive-only. */
  private def scored(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .select(pmod(col("user_id"), lit(4)).as("segment"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"),
        expr("CAST(conv(substring(md5(concat('cal:', " +
          "CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT)").as("h"))
      .withColumn("score_ppm",
        least(lit(999999L), expr("(h % 1000000) * 3 div 4") +
          col("pos") * 250000L))
      .drop("h")

  private val scoredSql =
    """ev AS (
      |  SELECT user_id % 4 AS segment,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
      |    CAST(('0x' || substring(md5('cal:' || CAST(event_id AS VARCHAR)),
      |      1, 6)) AS BIGINT) AS h
      |  FROM events),
      |sc AS (
      |  SELECT segment, CAST(pos AS BIGINT) AS pos,
      |    least(999999, (h % 1000000) * 3 // 4 + pos * 250000)
      |      AS score_ppm
      |  FROM ev)""".stripMargin

  // ------------------------------------------------------------- q201

  /** q201: RELIABILITY DIAGRAM + ECE per segment — the calibration
    * report: ten equal-width confidence bins; per bin the mean
    * predicted confidence vs the observed positive rate and their gap;
    * per segment the expected calibration error Σ n_b·|gap_b| / N.
    *
    * Scale shape: one groupBy(segment, bin) histogram (map-side
    * combinable), then window arithmetic over ≤40 rows. */
  private def qReliabilityEce(s: SparkSession, dir: String): DataFrame =
    scored(s, dir)
      .groupBy(col("segment"), expr("score_ppm div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("score_ppm")).as("sum_score"))
      .withColumn("conf_ppm", expr("sum_score div n"))
      .withColumn("acc_ppm", expr("n_pos * 1000000 div n"))
      .withColumn("gap_ppm", abs(col("conf_ppm") - col("acc_ppm")))
      .withColumn("ece_ppm", expr(
        "CAST(sum(CAST(n AS DECIMAL(38,0)) * gap_ppm)" +
          " OVER (PARTITION BY segment)" +
          " div sum(n) OVER (PARTITION BY segment) AS BIGINT)"))
      .select(col("segment"), col("bin"), col("n"), col("n_pos"),
        col("conf_ppm"), col("acc_ppm"), col("gap_ppm"), col("ece_ppm"))
      .orderBy(col("segment"), col("bin"))

  private val qReliabilityEceSql =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT segment, score_ppm // 100000 AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(score_ppm) AS BIGINT) AS sum_score
      |  FROM sc GROUP BY 1, 2),
      |g AS (
      |  SELECT segment, bin, n, n_pos,
      |    sum_score // n AS conf_ppm,
      |    n_pos * 1000000 // n AS acc_ppm
      |  FROM b)
      |SELECT segment, bin, n, n_pos,
      |  CAST(conf_ppm AS BIGINT) AS conf_ppm,
      |  CAST(acc_ppm AS BIGINT) AS acc_ppm,
      |  CAST(abs(conf_ppm - acc_ppm) AS BIGINT) AS gap_ppm,
      |  CAST(SUM(CAST(n AS HUGEINT) * abs(conf_ppm - acc_ppm))
      |      OVER (PARTITION BY segment)
      |    // SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS ece_ppm
      |FROM g ORDER BY segment, bin""".stripMargin

  // ------------------------------------------------------------- q202

  /** q202: HELLINGER DRIFT between serving windows — the second drift
    * statistic next to KS (q190) and decile gaps (q163): per event
    * type, the value distribution of the first half-month vs the rest
    * over 20 fixed $25 buckets; Bhattacharyya coefficient
    * Σ √(p_i·q_i) via `graft_isqrt` on ppm products, H² = 10^6 − BC.
    * Hellinger is bounded and symmetric where KS is sup-norm — the
    * pair catches different drift shapes.
    *
    * Scale shape: one groupBy(type, bucket, period) histogram; the
    * sqrt/sum arithmetic runs on ≤(types×20) rows. Zero-count guards
    * keep degenerate windows (a type absent from one period) at
    * p=0 rather than a division error. */
  private def qHellingerDrift(s: SparkSession, dir: String): DataFrame = {
    val h = load(s, dir, "events")
      .select(col("event_type"),
        when(col("ts") < to_timestamp(lit("2024-01-16")), 1L)
          .otherwise(0L).as("ref"),
        expr("least(19L, CAST(floor(value * 100 + 0.5) AS BIGINT)" +
          " div 2500)").as("bkt"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(sum(col("ref")).as("n_ref"), sum(lit(1L) - col("ref")).as("n_cur"))
      .withColumn("t_ref",
        sum(col("n_ref")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .withColumn("t_cur",
        sum(col("n_cur")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))))
      .withColumn("p_ppm", expr(
        "CASE WHEN t_ref = 0 THEN 0L ELSE n_ref * 1000000 div t_ref END"))
      .withColumn("q_ppm", expr(
        "CASE WHEN t_cur = 0 THEN 0L ELSE n_cur * 1000000 div t_cur END"))
      .withColumn("bc_term",
        graft.functions.IntegerSqrt(col("p_ppm") * col("q_ppm")))
    h.groupBy(col("event_type"))
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        sum(col("bc_term")).as("bc_ppm"))
      .withColumn("hellinger2_ppm", lit(1000000L) - col("bc_ppm"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        col("bc_ppm"), col("hellinger2_ppm"))
      .orderBy(col("event_type"))
  }

  private val qHellingerDriftSql =
    """WITH h AS (
      |  SELECT event_type,
      |    least(19, CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500)
      |      AS bkt,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_ref,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1
      |      END) AS BIGINT) AS n_cur
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, bkt, n_ref, n_cur,
      |    SUM(n_ref) OVER (PARTITION BY event_type) AS t_ref,
      |    SUM(n_cur) OVER (PARTITION BY event_type) AS t_cur
      |  FROM h),
      |p AS (
      |  SELECT event_type, t_ref, t_cur,
      |    (CASE WHEN t_ref = 0 THEN 0 ELSE n_ref * 1000000 // t_ref END)
      |    * (CASE WHEN t_cur = 0 THEN 0 ELSE n_cur * 1000000 // t_cur END)
      |      AS x
      |  FROM t),
      |r AS (
      |  SELECT event_type, t_ref, t_cur, x,
      |    CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT) AS s0
      |  FROM p),
      |q AS (
      |  SELECT event_type, t_ref, t_cur,
      |    s0 - CASE WHEN s0 > 0 AND s0 * s0 > x THEN 1 ELSE 0 END
      |       + CASE WHEN s0 < 3037000499 AND (s0 + 1) * (s0 + 1) <= x
      |           THEN 1 ELSE 0 END AS bc_term
      |  FROM r)
      |SELECT event_type,
      |  CAST(MAX(t_ref) AS BIGINT) AS n_ref,
      |  CAST(MAX(t_cur) AS BIGINT) AS n_cur,
      |  CAST(SUM(bc_term) AS BIGINT) AS bc_ppm,
      |  CAST(1000000 - SUM(bc_term) AS BIGINT) AS hellinger2_ppm
      |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- q203

  /** q203: BRIER SCORE + MURPHY DECOMPOSITION per segment — the proper
    * scoring rule behind the q201 diagram: the direct mean squared
    * error of the probabilistic forecast, plus its reliability /
    * resolution / uncertainty components over the same ten bins.
    * (With integer-truncated bin means the Murphy identity
    * brier ≈ rel − res + unc holds to rounding; all four are reported
    * independently, each exact under its own ppm convention.)
    *
    * Scale shape: the per-row pass folds score and score² into the
    * same single histogram groupBy (score² ≤ 10^12 per row, summed in
    * DECIMAL(38,0)); everything after is ≤40-row arithmetic. */
  private def qBrierDecomposition(s: SparkSession, dir: String): DataFrame = {
    val bins = scored(s, dir)
      .groupBy(col("segment"), expr("score_ppm div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("score_ppm")).as("sum_score"),
        sum(expr("CAST(score_ppm AS DECIMAL(38,0)) * score_ppm"))
          .as("sum_score2"),
        sum(expr("score_ppm * pos")).as("sum_score_pos"))
      .withColumn("conf_ppm", expr("sum_score div n"))
      .withColumn("acc_ppm", expr("n_pos * 1000000 div n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("segment"))
    bins
      .withColumn("tot_n", sum(col("n")).over(w))
      .withColumn("tot_pos", sum(col("n_pos")).over(w))
      .withColumn("base_ppm", expr("tot_pos * 1000000 div tot_n"))
      .groupBy(col("segment"))
      .agg(max(col("tot_n")).as("n"), max(col("base_ppm")).as("base_ppm"),
        sum(expr("sum_score2 - 2 * CAST(sum_score_pos AS DECIMAL(38,0))" +
          " * 1000000 + CAST(n_pos AS DECIMAL(38,0)) * 1000000000000"))
          .as("brier_num"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * (conf_ppm - acc_ppm)" +
          " * (conf_ppm - acc_ppm)")).as("rel_num"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * (acc_ppm - base_ppm)" +
          " * (acc_ppm - base_ppm)")).as("res_num"))
      .withColumn("brier_ppm", expr(
        "CAST(brier_num div (CAST(n AS DECIMAL(38,0)) * 1000000)" +
          " AS BIGINT)"))
      .withColumn("rel_ppm", expr(
        "CAST(rel_num div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
      .withColumn("res_ppm", expr(
        "CAST(res_num div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
      .withColumn("unc_ppm", expr(
        "base_ppm * (1000000 - base_ppm) div 1000000"))
      .select(col("segment"), col("n"), col("base_ppm"), col("brier_ppm"),
        col("rel_ppm"), col("res_ppm"), col("unc_ppm"))
      .orderBy(col("segment"))
  }

  private val qBrierDecompositionSql =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT segment, score_ppm // 100000 AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(score_ppm) AS BIGINT) AS sum_score,
      |    SUM(CAST(score_ppm AS HUGEINT) * score_ppm) AS sum_score2,
      |    CAST(SUM(score_ppm * pos) AS BIGINT) AS sum_score_pos
      |  FROM sc GROUP BY 1, 2),
      |g AS (
      |  SELECT segment, bin, n, n_pos, sum_score2, sum_score_pos,
      |    sum_score // n AS conf_ppm, n_pos * 1000000 // n AS acc_ppm,
      |    SUM(n) OVER (PARTITION BY segment) AS tot_n,
      |    SUM(n_pos) OVER (PARTITION BY segment) AS tot_pos
      |  FROM b),
      |g2 AS (
      |  SELECT *, tot_pos * 1000000 // tot_n AS base_ppm FROM g)
      |SELECT segment, CAST(MAX(tot_n) AS BIGINT) AS n,
      |  CAST(MAX(base_ppm) AS BIGINT) AS base_ppm,
      |  CAST(SUM(sum_score2 - 2 * CAST(sum_score_pos AS HUGEINT) * 1000000
      |      + CAST(n_pos AS HUGEINT) * 1000000000000)
      |    // (CAST(MAX(tot_n) AS HUGEINT) * 1000000) AS BIGINT)
      |    AS brier_ppm,
      |  CAST(SUM(CAST(n AS HUGEINT) * (conf_ppm - acc_ppm)
      |      * (conf_ppm - acc_ppm))
      |    // (CAST(MAX(tot_n) AS HUGEINT) * 1000000) AS BIGINT) AS rel_ppm,
      |  CAST(SUM(CAST(n AS HUGEINT) * (acc_ppm - base_ppm)
      |      * (acc_ppm - base_ppm))
      |    // (CAST(MAX(tot_n) AS HUGEINT) * 1000000) AS BIGINT) AS res_ppm,
      |  CAST(MAX(base_ppm) * (1000000 - MAX(base_ppm)) // 1000000
      |    AS BIGINT) AS unc_ppm
      |FROM g2 GROUP BY segment ORDER BY segment""".stripMargin

  // ------------------------------------------------------------- q204

  /** q204: GAINS / LIFT TABLE — "score the corpus, take the top slice
    * first": per descending confidence bin, cumulative share of all
    * positives captured (gain) and the capture rate relative to random
    * (lift). The campaign-targeting / active-learning budget report.
    *
    * Scale shape: the same single histogram groupBy; cumulative sums
    * are a window over ten rows, lift products routed DECIMAL. */
  private def qDecileLift(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    scored(s, dir)
      .groupBy(expr("score_ppm div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("tot_n", sum(col("n")).over(wAll))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("gain_ppm", expr("cum_pos * 1000000 div tot_pos"))
      .withColumn("lift_ppm", expr(
        "CAST(CAST(cum_pos AS DECIMAL(38,0)) * tot_n * 1000000" +
          " div (CAST(cum_n AS DECIMAL(38,0)) * tot_pos) AS BIGINT)"))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_n"),
        col("cum_pos"), col("gain_ppm"), col("lift_ppm"))
      .orderBy(col("bin").desc)
  }

  private val qDecileLiftSql =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT score_ppm // 100000 AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
      |  FROM sc GROUP BY 1),
      |c AS (
      |  SELECT bin, n, n_pos,
      |    SUM(n) OVER (ORDER BY bin DESC
      |      ROWS UNBOUNDED PRECEDING) AS cum_n,
      |    SUM(n_pos) OVER (ORDER BY bin DESC
      |      ROWS UNBOUNDED PRECEDING) AS cum_pos,
      |    SUM(n) OVER () AS tot_n, SUM(n_pos) OVER () AS tot_pos
      |  FROM b)
      |SELECT bin, n, n_pos, CAST(cum_n AS BIGINT) AS cum_n,
      |  CAST(cum_pos AS BIGINT) AS cum_pos,
      |  CAST(cum_pos * 1000000 // tot_pos AS BIGINT) AS gain_ppm,
      |  CAST(CAST(cum_pos AS HUGEINT) * tot_n * 1000000
      |    // (CAST(cum_n AS HUGEINT) * tot_pos) AS BIGINT) AS lift_ppm
      |FROM c ORDER BY bin DESC""".stripMargin

  // ------------------------------------------------------------- q205

  /** q205: PRECISION/RECALL OPERATING TABLE — confusion counts,
    * precision, recall and F1 at every decision threshold on the bin
    * grid; the table an operator reads to pick the cutoff a quality
    * classifier ships with. Emitted via the bounded fan-out
    * `sequence(0, bin)` (a bin serves every threshold at or below it)
    * — the q163 device — so no cross join and no row_number anywhere.
    *
    * Scale shape: histogram first (map-side combinable), then a ≤10×10
    * fan-out and a ten-row groupBy. */
  private def qPrCurve(s: SparkSession, dir: String): DataFrame = {
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    scored(s, dir)
      .groupBy(expr("score_ppm div 100000").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
      .withColumn("k", explode(expr("sequence(0L, bin)")))
      .groupBy(col("k"))
      .agg(sum(col("n_pos")).as("tp"),
        sum(col("n") - col("n_pos")).as("fp"),
        max(col("tot_pos")).as("tot_pos"))
      .withColumn("fn", col("tot_pos") - col("tp"))
      .withColumn("precision_ppm", expr("tp * 1000000 div (tp + fp)"))
      .withColumn("recall_ppm", expr("tp * 1000000 div tot_pos"))
      .withColumn("f1_ppm", expr(
        "CASE WHEN precision_ppm + recall_ppm = 0 THEN 0L" +
          " ELSE 2 * precision_ppm * recall_ppm" +
          " div (precision_ppm + recall_ppm) END"))
      .select((col("k") * 100000L).as("threshold_ppm"), col("tp"),
        col("fp"), col("fn"), col("precision_ppm"), col("recall_ppm"),
        col("f1_ppm"))
      .orderBy(col("threshold_ppm"))
  }

  private val qPrCurveSql =
    s"""WITH $scoredSql,
      |b AS (
      |  SELECT score_ppm // 100000 AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
      |  FROM sc GROUP BY 1),
      |t AS (SELECT *, SUM(n_pos) OVER () AS tot_pos FROM b),
      |f AS (
      |  SELECT CAST(u.k AS BIGINT) AS k, t.n, t.n_pos, t.tot_pos
      |  FROM t CROSS JOIN unnest(generate_series(0, t.bin)) AS u(k)),
      |g AS (
      |  SELECT k, CAST(SUM(n_pos) AS BIGINT) AS tp,
      |    CAST(SUM(n - n_pos) AS BIGINT) AS fp,
      |    CAST(MAX(tot_pos) AS BIGINT) AS tot_pos
      |  FROM f GROUP BY k),
      |p AS (
      |  SELECT k, tp, fp, tot_pos - tp AS fn,
      |    tp * 1000000 // (tp + fp) AS precision_ppm,
      |    tp * 1000000 // tot_pos AS recall_ppm
      |  FROM g)
      |SELECT k * 100000 AS threshold_ppm, tp, fp,
      |  CAST(fn AS BIGINT) AS fn,
      |  CAST(precision_ppm AS BIGINT) AS precision_ppm,
      |  CAST(recall_ppm AS BIGINT) AS recall_ppm,
      |  CAST(CASE WHEN precision_ppm + recall_ppm = 0 THEN 0
      |    ELSE 2 * precision_ppm * recall_ppm
      |      // (precision_ppm + recall_ppm) END AS BIGINT) AS f1_ppm
      |FROM p ORDER BY threshold_ppm""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q201_reliability_ece" -> QueryDef(qReliabilityEce,
      Some(qReliabilityEceSql),
      "calibration reliability diagram + ECE per segment, histogram-shaped, ppm-exact"),
    "q202_hellinger_drift" -> QueryDef(qHellingerDrift,
      Some(qHellingerDriftSql),
      "Hellinger^2 drift between serving windows per event type via graft_isqrt on ppm histograms"),
    "q203_brier_decomposition" -> QueryDef(qBrierDecomposition,
      Some(qBrierDecompositionSql),
      "Brier score + Murphy reliability/resolution/uncertainty per segment, DECIMAL-routed"),
    "q204_decile_lift" -> QueryDef(qDecileLift, Some(qDecileLiftSql),
      "gains/lift table over descending confidence bins, windowed cumulatives"),
    "q205_pr_curve" -> QueryDef(qPrCurve, Some(qPrCurveSql),
      "precision/recall/F1 operating table at every bin threshold via bounded sequence fan-out"))
}
