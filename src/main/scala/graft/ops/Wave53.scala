package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load
import graft.util.Ranks

/** Fifty-third wave (round 11): the CBO loop CLOSED — q295 exports
  * ANALYZE-grade histograms+MCVs and q289 audits join-cardinality
  * estimates; this wave adds the query that CONSUMES those stats to
  * make planning decisions, and audits the decisions themselves
  * (round-10 verdict ask #5).
  *
  *  - q314: STATS-DRIVEN PLANNING AUDIT. A 3-step plan over the skewed
  *    fact table (events: `value` has an exponential right tail —
  *    p50 $34.59, max $490.02 at sf0.01) is estimated twice:
  *      (a) UNIFORMITY stats (row count, min/max, NDV — what a catalog
  *          without histograms knows): range selectivity by min-max
  *          linear interpolation, join size by the containment rule
  *          |R⋈S| = |R|·|S| / max(ndv), categorical selectivity 1/ndv;
  *      (b) HISTOGRAM/MCV stats (the q295 exports): range selectivity
  *          from a 32-bucket equi-depth histogram with within-bucket
  *          interpolation, categorical selectivity from the value's
  *          measured frequency.
  *    Each estimate drives the broadcast-vs-shuffle choice for the
  *    filtered fact side at a stated threshold (5% of the table); the
  *    audit reports estimate error (integer ppm) and CHOSEN vs OPTIMAL
  *    (from exact cardinalities) per step. On the skewed tail
  *    predicate, uniformity over-estimates ~80× and picks a shuffle
  *    where broadcast is optimal — the histogram stats fix exactly
  *    that decision, while on the uniform categorical step both
  *    estimators agree (the audit flags only REAL mis-estimates).
  *
  * Everything is integer-exact in BOTH engines (cents grid, identical
  * rank/bucket arithmetic `(rk−1)·B div n`, ppm errors by integer
  * division), so the estimates themselves — not just the exact counts —
  * hash-match the DuckDB oracle.
  *
  * Scale shape: the histogram builds on the distributed Ranks device
  * (range repartition + offset broadcast, never a global window); all
  * estimator/stat frames are one-row or B-row bounded broadcasts; the
  * exact counts are keyed joins/aggregates. */
object Wave53 {

  private val B = 32 // equi-depth buckets
  private val Tc = 24500L // range predicate: value > $245.00 (cents)
  private val BcastDiv = 20L // broadcast if est <= n/20 (5%)

  private def qCboPlanningAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
    val cust = load(s, dir, "customer").select(col("c_custkey"))

    // ---- catalog stats (one-row / B-row bounded frames)
    val base = ev.agg(
      count(lit(1)).as("n"),
      min(col("vc")).as("minc"), max(col("vc")).as("maxc"),
      countDistinct(col("event_type")).as("ndv_type"))
    val ranked = Ranks.globalRank(ev.select(col("vc"), col("event_id")),
      "rk", col("vc"), col("event_id"))
    val buckets = ranked.crossJoin(broadcast(base.select(col("n"))))
      .withColumn("b", expr(s"(rk - 1) * $B div n"))
      .groupBy(col("b"))
      .agg(min(col("vc")).as("lb"), max(col("vc")).as("ub"),
        count(lit(1)).as("nb"))
    // histogram range estimate: full buckets above T + straddle part
    val histEst = buckets.agg(
      sum(expr(
        s"CASE WHEN lb > $Tc THEN nb " +
          s"WHEN ub > $Tc THEN nb * (ub - $Tc) div (ub - lb) " +
          "ELSE 0 END")).as("est_hist1"))
    val mcv = ev.filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n_purchase"))

    // ---- exact cardinalities (ground truth; keyed joins only)
    val sel = ev.filter(col("vc") > Tc)
    val j2 = sel.join(cust, col("user_id") === col("c_custkey"))
    val exact = sel.agg(count(lit(1)).as("exact1")).crossJoin(
      broadcast(j2.agg(count(lit(1)).as("exact2")))).crossJoin(
      broadcast(j2.filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("exact3"))))

    // ---- one row carrying every stat (all one-row broadcasts)
    val row = base.crossJoin(broadcast(histEst))
      .crossJoin(broadcast(mcv)).crossJoin(broadcast(exact))
      // greatest(..., 1) denominator guard: a constant-valued events
      // table makes maxc = minc, where Spark `div` yields NULL silently
      // but DuckDB's `//` errors — divergent gate failure modes
      .withColumn("est_uni1", expr(
        s"greatest(0, least(n, n * (maxc - $Tc) div greatest(maxc - minc, 1)))"))
      // the fact side joins a PK dim: |sel ⋈ cust| = |sel| (containment,
      // ndv(c_custkey) >= ndv(user_id)) — both estimators propagate
      .withColumn("est_uni2", col("est_uni1"))
      .withColumn("est_hist2", col("est_hist1"))
      .withColumn("est_uni3", expr("est_uni2 div ndv_type"))
      .withColumn("est_hist3", expr("est_hist2 * n_purchase div n"))
      .withColumn("thr", expr(s"n div $BcastDiv"))

    def step(name: String, exact: String, eu: String, eh: String,
        decide: Boolean): DataFrame = {
      val d = row
        .withColumn("step", lit(name))
        .withColumn("exact_rows", col(exact))
        .withColumn("est_uniform_rows", col(eu))
        .withColumn("est_hist_rows", col(eh))
        .withColumn("err_uniform_ppm", expr(
          s"abs($eu - $exact) * 1000000 div greatest($exact, 1)"))
        .withColumn("err_hist_ppm", expr(
          s"abs($eh - $exact) * 1000000 div greatest($exact, 1)"))
      val withPlan =
        if (decide) d
          .withColumn("plan_uniform", expr(
            s"CASE WHEN $eu <= thr THEN 'broadcast' ELSE 'shuffle' END"))
          .withColumn("plan_hist", expr(
            s"CASE WHEN $eh <= thr THEN 'broadcast' ELSE 'shuffle' END"))
          .withColumn("plan_optimal", expr(
            s"CASE WHEN $exact <= thr THEN 'broadcast' ELSE 'shuffle' END"))
        else d
          .withColumn("plan_uniform", lit("n/a"))
          .withColumn("plan_hist", lit("n/a"))
          .withColumn("plan_optimal", lit("n/a"))
      withPlan
        .withColumn("misplanned_uniform",
          expr("CAST(plan_uniform <> plan_optimal AS BIGINT)"))
        .withColumn("misplanned_hist",
          expr("CAST(plan_hist <> plan_optimal AS BIGINT)"))
        .select(col("step"), col("exact_rows"), col("est_uniform_rows"),
          col("est_hist_rows"), col("err_uniform_ppm"),
          col("err_hist_ppm"), col("plan_uniform"), col("plan_hist"),
          col("plan_optimal"), col("misplanned_uniform"),
          col("misplanned_hist"))
    }

    step("1_range_filter", "exact1", "est_uni1", "est_hist1",
        decide = false)
      .unionByName(step("2_join_customer", "exact2", "est_uni2",
        "est_hist2", decide = true))
      .unionByName(step("3_categorical", "exact3", "est_uni3",
        "est_hist3", decide = false))
      .orderBy(col("step"))
  }

  private val qCboPlanningAuditSql =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT event_id, user_id, event_type,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
       |  FROM events),
       |base AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    MIN(vc) AS minc, MAX(vc) AS maxc,
       |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ndv_type
       |  FROM ev),
       |ranked AS (
       |  SELECT vc, CAST(row_number() OVER (ORDER BY vc, event_id)
       |    AS BIGINT) AS rk FROM ev),
       |buckets AS (
       |  SELECT (rk - 1) * $B // n AS b, MIN(vc) AS lb, MAX(vc) AS ub,
       |    CAST(COUNT(*) AS BIGINT) AS nb
       |  FROM ranked, base GROUP BY 1),
       |hist AS (
       |  SELECT CAST(SUM(CASE WHEN lb > $Tc THEN nb
       |    WHEN ub > $Tc THEN nb * (ub - $Tc) // (ub - lb)
       |    ELSE 0 END) AS BIGINT) AS est_hist1 FROM buckets),
       |mcv AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_purchase FROM ev
       |  WHERE event_type = 'purchase'),
       |sel AS MATERIALIZED (
       |  SELECT * FROM ev WHERE vc > $Tc),
       |j2 AS MATERIALIZED (
       |  SELECT sel.* FROM sel JOIN customer
       |    ON user_id = c_custkey),
       |exact AS (
       |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) AS exact1,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM j2) AS exact2,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM j2
       |     WHERE event_type = 'purchase') AS exact3),
       |r AS (
       |  SELECT *,
       |    greatest(0, least(n, n * (maxc - $Tc) // greatest(maxc - minc, 1)))
       |      AS est_uni1,
       |    n // $BcastDiv AS thr
       |  FROM base, hist, mcv, exact),
       |r2 AS (
       |  SELECT *, est_uni1 AS est_uni2, est_hist1 AS est_hist2,
       |    est_uni1 // ndv_type AS est_uni3,
       |    est_hist1 * n_purchase // n AS est_hist3
       |  FROM r),
       |steps AS (
       |  SELECT '1_range_filter' AS step, exact1 AS exact_rows,
       |    est_uni1 AS est_uniform_rows, est_hist1 AS est_hist_rows,
       |    'n/a' AS plan_uniform, 'n/a' AS plan_hist,
       |    'n/a' AS plan_optimal, exact1 AS ex, est_uni1 AS eu,
       |    est_hist1 AS eh
       |  FROM r2
       |  UNION ALL
       |  SELECT '2_join_customer', exact2, est_uni2, est_hist2,
       |    CASE WHEN est_uni2 <= thr THEN 'broadcast' ELSE 'shuffle' END,
       |    CASE WHEN est_hist2 <= thr THEN 'broadcast' ELSE 'shuffle' END,
       |    CASE WHEN exact2 <= thr THEN 'broadcast' ELSE 'shuffle' END,
       |    exact2, est_uni2, est_hist2
       |  FROM r2
       |  UNION ALL
       |  SELECT '3_categorical', exact3, est_uni3, est_hist3,
       |    'n/a', 'n/a', 'n/a', exact3, est_uni3, est_hist3
       |  FROM r2)
       |SELECT step, exact_rows, est_uniform_rows, est_hist_rows,
       |  CAST(abs(eu - ex) * 1000000 // greatest(ex, 1) AS BIGINT)
       |    AS err_uniform_ppm,
       |  CAST(abs(eh - ex) * 1000000 // greatest(ex, 1) AS BIGINT)
       |    AS err_hist_ppm,
       |  plan_uniform, plan_hist, plan_optimal,
       |  CAST(plan_uniform <> plan_optimal AS BIGINT)
       |    AS misplanned_uniform,
       |  CAST(plan_hist <> plan_optimal AS BIGINT) AS misplanned_hist
       |FROM steps ORDER BY step""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q314_cbo_planning_audit" -> QueryDef(qCboPlanningAudit,
      Some(qCboPlanningAuditSql),
      "stats-driven planning audit: uniformity vs histogram/MCV " +
        "estimates drive broadcast-vs-shuffle; chosen vs optimal " +
        "reported per step with integer-ppm errors (closes the " +
        "q289/q295 CBO loop)"))
}
