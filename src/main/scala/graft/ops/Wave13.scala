package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Thirteenth wave (round 7): the EXPERIMENTATION & UNCERTAINTY
  * battery — leave-one-out target encoding (the leakage-safe
  * categorical feature), split-conformal prediction thresholds with
  * their finite-sample coverage check, next-order recommendation
  * hit-rate, an inverse-propensity-weighted treatment-effect estimate,
  * and the Nelson–Aalen cumulative hazard (the log/product-free
  * member of the survival family — a pure Σ d/n, unlike Kaplan–Meier's
  * running product which no integer convention can gate).
  *
  * House rules: integer ppm conventions, DECIMAL(38,0)/HUGEINT
  * routing, histogram-shaped rank lookups (q154/q168 device), no
  * row_number over raw fact tables unless the partition is per-entity
  * bounded. */
object Wave13 {

  // ------------------------------------------------------------- q210

  /** q210: LEAVE-ONE-OUT TARGET ENCODING of part brand against the
    * return flag — the leakage-safe way to turn a categorical into a
    * model feature: each row's encoding excludes its own label
    * ((pos_c − y)/(n_c − 1)), plus the m-estimate smoothed encoding
    * ((pos_c + m·global)/(n_c + m), m = 100). Binary target ⇒ the LOO
    * value takes exactly two values per brand, so the full per-row
    * encoding is REPORTABLE as (loo_pos_ppm, loo_neg_ppm) without
    * materializing a per-row column.
    *
    * Scale shape: one fact⋈dim equi-join (brand is on `part`; AQE
    * picks the join strategy), one map-side-combinable groupBy(brand),
    * then 25-row arithmetic with a 1-row global broadcast. */
  private def qTargetEncoding(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_partkey").as("pk"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val pt = load(s, dir, "part")
      .select(col("p_partkey").as("pk"), col("p_brand").as("brand"))
    val byBrand = li.join(pt, "pk")
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val g = byBrand.agg(sum(col("n")).as("tot_n"), sum(col("pos")).as("tot_pos"))
      .withColumn("global_ppm", expr("tot_pos * 1000000 div tot_n"))
    byBrand.crossJoin(broadcast(g))
      .withColumn("rate_ppm", expr("pos * 1000000 div n"))
      .withColumn("smoothed_ppm", expr(
        "(pos * 1000000 + 100 * global_ppm) div (n + 100)"))
      .withColumn("loo_pos_ppm", expr(
        "CASE WHEN n <= 1 THEN global_ppm" +
          " ELSE (pos - 1) * 1000000 div (n - 1) END"))
      .withColumn("loo_neg_ppm", expr(
        "CASE WHEN n <= 1 THEN global_ppm" +
          " ELSE pos * 1000000 div (n - 1) END"))
      .select(col("brand"), col("n"), col("pos"), col("rate_ppm"),
        col("global_ppm"), col("smoothed_ppm"), col("loo_pos_ppm"),
        col("loo_neg_ppm"))
      .orderBy(col("brand"))
  }

  private val qTargetEncodingSql =
    """WITH li AS (
      |  SELECT l_partkey AS pk,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      |  FROM lineitem),
      |bb AS (
      |  SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM li JOIN part ON p_partkey = pk GROUP BY 1),
      |g AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
      |    CAST(SUM(pos) AS BIGINT) AS tot_pos,
      |    CAST(SUM(pos) * 1000000 // SUM(n) AS BIGINT) AS global_ppm
      |  FROM bb)
      |SELECT brand, n, pos,
      |  CAST(pos * 1000000 // n AS BIGINT) AS rate_ppm, global_ppm,
      |  CAST((pos * 1000000 + 100 * global_ppm) // (n + 100) AS BIGINT)
      |    AS smoothed_ppm,
      |  CAST(CASE WHEN n <= 1 THEN global_ppm
      |    ELSE (pos - 1) * 1000000 // (n - 1) END AS BIGINT)
      |    AS loo_pos_ppm,
      |  CAST(CASE WHEN n <= 1 THEN global_ppm
      |    ELSE pos * 1000000 // (n - 1) END AS BIGINT) AS loo_neg_ppm
      |FROM bb CROSS JOIN g ORDER BY brand""".stripMargin

  // ------------------------------------------------------------- q211

  /** q211: SPLIT-CONFORMAL PREDICTION THRESHOLDS + COVERAGE — the
    * distribution-free uncertainty wrapper around the wave-11
    * classifier: an md5 split makes a calibration half; nonconformity
    * is score for negatives, 10^6 − score for positives; for each
    * α ∈ {10%, 5%, 1%} the threshold is the ⌈(n_cal+1)(1−α)⌉-th
    * smallest calibration nonconformity; the report checks the
    * finite-sample guarantee by measuring coverage on the held-out
    * half (claim: ≥ 1−α in expectation).
    *
    * Scale shape: the rank lookup is the q168 histogram device — one
    * map-side-combinable groupBy(split, nonconformity), running
    * counts on the bounded value table, a conditional-min per α; the
    * coverage probe joins the 3-row threshold table back to the same
    * histogram, never the raw rows. */
  private def qConformal(s: SparkSession, dir: String): DataFrame = {
    val sc = load(s, dir, "events")
      .select(
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"),
        expr("CAST(conv(substring(md5(concat('cal:', " +
          "CAST(event_id AS STRING))), 1, 6), 16, 10) AS BIGINT)").as("h"),
        when(substring(md5(concat(lit("split:"), col("event_id"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "cal")
          .otherwise("test").as("half"))
      .withColumn("score_ppm",
        least(lit(999999L), expr("(h % 1000000) * 3 div 4") +
          col("pos") * 250000L))
      .withColumn("nc",
        when(col("pos") === 1L, lit(1000000L) - col("score_ppm"))
          .otherwise(col("score_ppm")))
    val hist = sc.groupBy(col("half"), col("nc"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("half")).orderBy(col("nc"))))
      .withColumn("n_half", sum(col("c")).over(
        Window.partitionBy(col("half"))))
    val alphas = hist.filter(col("half") === "cal")
      .withColumn("alpha_ppm", explode(expr(
        "array(100000L, 50000L, 10000L)")))
      .withColumn("k", expr(
        "(CAST(n_half + 1 AS DECIMAL(38,0)) * (1000000 - alpha_ppm)" +
          " + 999999) div 1000000"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("alpha_ppm"))
      .agg(min(col("nc")).as("threshold"), max(col("n_half")).as("n_cal"),
        max(col("k")).as("k_rank"))
    val cover = alphas.join(
      hist.filter(col("half") === "test")
        .select(col("nc"), col("c"), col("n_half").as("n_test")),
      col("nc") <= col("threshold"), "left")
      .groupBy(col("alpha_ppm"), col("n_cal"), col("k_rank"),
        col("threshold"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("covered"),
        max(col("n_test")).as("n_test"))
    cover
      .withColumn("coverage_ppm", expr("covered * 1000000 div n_test"))
      .select(col("alpha_ppm"), col("n_cal"), col("k_rank"),
        col("threshold"), col("n_test"), col("covered"),
        col("coverage_ppm"))
      .orderBy(col("alpha_ppm"))
  }

  private val qConformalSql =
    """WITH ev AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
      |    CAST(('0x' || substring(md5('cal:' || CAST(event_id AS VARCHAR)),
      |      1, 6)) AS BIGINT) AS h,
      |    CASE WHEN substring(md5('split:' || event_id), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'cal' ELSE 'test'
      |      END AS half
      |  FROM events),
      |sc AS (
      |  SELECT half, pos,
      |    least(999999, (h % 1000000) * 3 // 4 + pos * 250000) AS score_ppm
      |  FROM ev),
      |nc AS (
      |  SELECT half, CASE WHEN pos = 1 THEN 1000000 - score_ppm
      |    ELSE score_ppm END AS nc
      |  FROM sc),
      |hist AS (
      |  SELECT half, nc, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM nc GROUP BY 1, 2),
      |cumh AS (
      |  SELECT half, nc, c,
      |    SUM(c) OVER (PARTITION BY half ORDER BY nc) AS cum,
      |    SUM(c) OVER (PARTITION BY half) AS n_half
      |  FROM hist),
      |al AS (
      |  SELECT CAST(u.a AS BIGINT) AS alpha_ppm, cumh.*
      |  FROM cumh CROSS JOIN
      |    unnest([100000, 50000, 10000]) AS u(a)
      |  WHERE half = 'cal'),
      |th AS (
      |  SELECT alpha_ppm,
      |    CAST(MIN(CASE WHEN cum >= (CAST(n_half + 1 AS HUGEINT)
      |        * (1000000 - alpha_ppm) + 999999) // 1000000
      |      THEN nc END) AS BIGINT) AS threshold,
      |    CAST(MAX(n_half) AS BIGINT) AS n_cal,
      |    CAST(MAX((CAST(n_half + 1 AS HUGEINT) * (1000000 - alpha_ppm)
      |      + 999999) // 1000000) AS BIGINT) AS k_rank
      |  FROM al GROUP BY 1)
      |SELECT th.alpha_ppm, th.n_cal, th.k_rank, th.threshold,
      |  CAST(MAX(t.n_half) AS BIGINT) AS n_test,
      |  CAST(COALESCE(SUM(CASE WHEN t.nc <= th.threshold THEN t.c END), 0)
      |    AS BIGINT) AS covered,
      |  CAST(COALESCE(SUM(CASE WHEN t.nc <= th.threshold THEN t.c END), 0)
      |    * 1000000 // MAX(t.n_half) AS BIGINT) AS coverage_ppm
      |FROM th, cumh t
      |WHERE t.half = 'test'
      |GROUP BY 1, 2, 3, 4 ORDER BY alpha_ppm""".stripMargin

  // ------------------------------------------------------------- q212

  /** q212: NEXT-ORDER RECOMMENDATION HIT-RATE — the offline eval of a
    * popularity recommender: per customer the LAST order (by date,
    * order-key tie-break) is held out; the top-10 most-ordered parts
    * across all EARLIER orders are "recommended"; a customer counts as
    * hit if the held-out order contains any recommended part. Reported
    * per market segment so the lift of personalization work has a
    * baseline to beat.
    *
    * Scale shape: the last-order pick is a per-customer max (orders
    * per customer are bounded ~10 — one map-side-combinable groupBy +
    * re-join, no global window); popularity is a groupBy(part) with a
    * 10-row TakeOrdered broadcast back; the hit probe is one semi-join
    * of held-out lineitems against that 10-row table. */
  private def qNextOrderHitrate(s: SparkSession, dir: String): DataFrame = {
    val ord = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    // last order = max (date, key) packed — bounded per-customer agg,
    // the q164/q70 shape, never a global row_number
    val last = ord
      .withColumn("dk", expr(
        "CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)" +
          " * 10000000000 + o_orderkey"))
      .groupBy(col("o_custkey")).agg(max(col("dk")).as("dk"))
      .withColumn("last_key", expr("dk % 10000000000"))
      .select(col("o_custkey"), col("last_key"))
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val withCust = li.join(
      ord.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
      "l_orderkey")
      .join(last, "o_custkey")
      .withColumn("held_out", col("l_orderkey") === col("last_key"))
    val top10 = withCust.filter(!col("held_out"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
      .select(col("l_partkey").as("rec_part"))
    val seg = load(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    withCust.filter(col("held_out"))
      .join(broadcast(top10), col("l_partkey") === col("rec_part"),
        "left")
      .groupBy(col("o_custkey"))
      .agg(max(when(col("rec_part").isNotNull, 1L).otherwise(0L))
        .as("hit"))
      .join(seg, "o_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("hit")).as("n_hits"))
      .withColumn("hitrate_ppm", expr("n_hits * 1000000 div n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  private val qNextOrderHitrateSql =
    """WITH ord AS (
      |  SELECT o_orderkey, o_custkey,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) * 10000000000 + o_orderkey AS dk
      |  FROM orders),
      |last AS (
      |  SELECT o_custkey, MAX(dk) % 10000000000 AS last_key
      |  FROM ord GROUP BY 1),
      |wc AS (
      |  SELECT li.l_orderkey, li.l_partkey, o.o_custkey,
      |    li.l_orderkey = last.last_key AS held_out
      |  FROM lineitem li
      |  JOIN orders o ON o.o_orderkey = li.l_orderkey
      |  JOIN last ON last.o_custkey = o.o_custkey),
      |top10 AS (
      |  SELECT l_partkey AS rec_part FROM wc WHERE NOT held_out
      |  GROUP BY 1 ORDER BY COUNT(*) DESC, l_partkey LIMIT 10),
      |hits AS (
      |  SELECT wc.o_custkey,
      |    CAST(MAX(CASE WHEN t.rec_part IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS hit
      |  FROM wc LEFT JOIN top10 t ON t.rec_part = wc.l_partkey
      |  WHERE wc.held_out GROUP BY 1)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(hit) AS BIGINT) AS n_hits,
      |  CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) AS hitrate_ppm
      |FROM hits JOIN customer ON c_custkey = o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q213

  /** q213: INVERSE-PROPENSITY-WEIGHTED TREATMENT EFFECT — the
    * observational-data estimator: treatment = "user ever signed up",
    * outcome = "user ever purchased", confounder = user segment;
    * e(x) = P(T=1 | segment) from counts, ATE = mean over users of
    * T·Y/e − (1−T)·Y/(1−e), all in exact ppm (weights are 10^6 div
    * e_ppm rationals; the two weighted sums accumulate in
    * DECIMAL(38,0) before the single release division). The naive
    * (confounded) rate difference rides along per segment so the
    * report shows what the reweighting corrected.
    *
    * Scale shape: one groupBy(user) over events (map-side
    * combinable), one groupBy(segment) over users, 4-row arithmetic,
    * one broadcast of the 4-row propensity table back onto the user
    * table for the weighted sums. */
  private def qIpwAte(s: SparkSession, dir: String): DataFrame = {
    val users = load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "signup", 1L).otherwise(0L))
        .as("t"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("segment", pmod(col("user_id"), lit(4)))
    val prop = users.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_seg"), sum(col("t")).as("n_treat"),
        sum(when(col("t") === 1L, col("y")).otherwise(0L)).as("y_treat"),
        sum(when(col("t") === 0L, col("y")).otherwise(0L)).as("y_ctrl"))
      .withColumn("e_ppm", expr("n_treat * 1000000 div n_seg"))
      .withColumn("naive_diff_ppm", expr(
        "CASE WHEN n_treat = 0 OR n_treat = n_seg THEN 0L" +
          " ELSE y_treat * 1000000 div n_treat" +
          " - y_ctrl * 1000000 div (n_seg - n_treat) END"))
    val ate = users.join(broadcast(prop.select(col("segment"),
        col("e_ppm"))), "segment")
      .agg(count(lit(1)).as("n_users"),
        sum(expr("CASE WHEN t = 1 AND y = 1" +
          " THEN CAST(1000000000000 AS DECIMAL(38,0)) div e_ppm" +
          " ELSE CAST(0 AS DECIMAL(38,0)) END")).as("w_treat"),
        sum(expr("CASE WHEN t = 0 AND y = 1" +
          " THEN CAST(1000000000000 AS DECIMAL(38,0))" +
          " div (1000000 - e_ppm) ELSE CAST(0 AS DECIMAL(38,0)) END"))
          .as("w_ctrl"))
      .withColumn("ate_ppm", expr(
        "CAST((w_treat - w_ctrl) div n_users AS BIGINT)"))
      .select(col("n_users"), col("ate_ppm"))
    prop.crossJoin(broadcast(ate))
      .select(col("segment"), col("n_seg"), col("n_treat"), col("e_ppm"),
        col("naive_diff_ppm"), col("n_users"), col("ate_ppm"))
      .orderBy(col("segment"))
  }

  private val qIpwAteSql =
    """WITH users AS (
      |  SELECT user_id,
      |    CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS t,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y,
      |    user_id % 4 AS segment
      |  FROM events GROUP BY 1),
      |prop AS (
      |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_seg,
      |    CAST(SUM(t) AS BIGINT) AS n_treat,
      |    CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT)
      |      AS y_treat,
      |    CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT)
      |      AS y_ctrl,
      |    CAST(SUM(t) * 1000000 // COUNT(*) AS BIGINT) AS e_ppm
      |  FROM users GROUP BY 1),
      |ate AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST((SUM(CASE WHEN t = 1 AND y = 1
      |        THEN CAST(1000000000000 AS HUGEINT) // e_ppm
      |        ELSE CAST(0 AS HUGEINT) END)
      |      - SUM(CASE WHEN t = 0 AND y = 1
      |        THEN CAST(1000000000000 AS HUGEINT) // (1000000 - e_ppm)
      |        ELSE CAST(0 AS HUGEINT) END)) // COUNT(*) AS BIGINT)
      |      AS ate_ppm
      |  FROM users JOIN prop USING (segment))
      |SELECT segment, n_seg, n_treat, e_ppm,
      |  CAST(CASE WHEN n_treat = 0 OR n_treat = n_seg THEN 0
      |    ELSE y_treat * 1000000 // n_treat
      |      - y_ctrl * 1000000 // (n_seg - n_treat) END AS BIGINT)
      |    AS naive_diff_ppm,
      |  n_users, ate_ppm
      |FROM prop CROSS JOIN ate ORDER BY segment""".stripMargin

  // ------------------------------------------------------------- q214

  /** q214: NELSON–AALEN CUMULATIVE HAZARD of session end — units are
    * user sessions (6-hour inactivity gap, the q106 device); duration
    * is the session span in 10-minute bins; sessions still open near
    * the window edge (last event within 6 h of the data's end) are
    * CENSORED. The estimator is the survival workhorse that stays
    * integer-exact: H(t) = Σ_{s≤t} d_s/n_s, with the at-risk count
    * n_s derived from the duration histogram by a reverse running sum
    * — no per-unit ranking, no product, no log (user-level churn is
    * degenerate on this corpus — every user spans the full window —
    * so the session family is the one with an actual curve: 126
    * distinct bins measured at sf0.01).
    *
    * Scale shape: the sessionizer's lag/sum windows partition by
    * user (per-entity bounded, ~150 events); then one
    * groupBy(user, sid) and one bounded histogram with windows on it. */
  private def qNelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("brk",
        when(expr("unix_micros(ts)") -
          expr("unix_micros(lag(ts, 1) OVER (PARTITION BY user_id" +
            " ORDER BY ts, event_id))") > 21600000000L ||
          lag(col("ts"), 1).over(wU).isNull,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        wU.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .withColumn("duration", expr(
        "(unix_micros(last_ts) - unix_micros(first_ts))" +
          " div 600000000"))
      .withColumn("churned",
        when(col("last_ts") < to_timestamp(lit("2024-01-30 18:00:00")),
          1L).otherwise(0L))
    val hist = sess.groupBy(col("duration"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d"))
    val wRisk = Window.orderBy(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCum = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .withColumn("h_step_ppm", expr("d * 1000000 div n_risk"))
      .withColumn("cum_hazard_ppm", sum(col("h_step_ppm")).over(wCum))
      .select(col("duration"), col("n_risk"), col("d"),
        col("h_step_ppm"), col("cum_hazard_ppm"))
      .orderBy(col("duration"))
  }

  private val qNelsonAalenSql =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |      OR ts - LAG(ts) OVER w > INTERVAL 6 HOUR THEN 1 ELSE 0 END
      |      AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e),
      |ses AS (
      |  SELECT user_id, sid, MIN(ts) AS first_ts, MAX(ts) AS last_ts
      |  FROM g GROUP BY 1, 2),
      |du AS (
      |  SELECT (epoch_us(last_ts) - epoch_us(first_ts)) // 600000000
      |      AS duration,
      |    CASE WHEN last_ts < TIMESTAMP '2024-01-30 18:00:00'
      |      THEN 1 ELSE 0 END AS churned
      |  FROM ses),
      |hist AS (
      |  SELECT duration, CAST(COUNT(*) AS BIGINT) AS n_at,
      |    CAST(SUM(churned) AS BIGINT) AS d
      |  FROM du GROUP BY 1),
      |r AS (
      |  SELECT duration, n_at, d,
      |    SUM(n_at) OVER (ORDER BY duration DESC
      |      ROWS UNBOUNDED PRECEDING) AS n_risk
      |  FROM hist)
      |SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, d,
      |  CAST(d * 1000000 // n_risk AS BIGINT) AS h_step_ppm,
      |  CAST(SUM(d * 1000000 // n_risk) OVER (ORDER BY duration
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hazard_ppm
      |FROM r ORDER BY duration""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q210_target_encoding" -> QueryDef(qTargetEncoding,
      Some(qTargetEncodingSql),
      "leave-one-out + m-estimate target encoding of part brand vs return flag, 25-row report"),
    "q211_conformal" -> QueryDef(qConformal, Some(qConformalSql),
      "split-conformal thresholds at three alphas via histogram rank + held-out coverage check"),
    "q212_next_order_hitrate" -> QueryDef(qNextOrderHitrate,
      Some(qNextOrderHitrateSql),
      "popularity-recommender hit-rate on each customer's held-out last order, per segment"),
    "q213_ipw_ate" -> QueryDef(qIpwAte, Some(qIpwAteSql),
      "inverse-propensity-weighted treatment effect with per-segment propensities and naive baseline"),
    "q214_nelson_aalen" -> QueryDef(qNelsonAalen, Some(qNelsonAalenSql),
      "Nelson-Aalen cumulative churn hazard from the duration histogram, censoring-aware"))
}
