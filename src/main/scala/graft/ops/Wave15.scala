package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Fifteenth wave (round 7): MONITORING & VARIANCE REDUCTION — the
  * statistical-process-control chart (p-chart with per-day 3σ limits),
  * the jackknife standard error (the resampling estimator that is
  * deterministic by construction — no RNG to reconcile across
  * engines), and CUPED covariate adjustment (the experimentation
  * workhorse that shrinks metric variance with pre-period data).
  *
  * House rules: integer ppm/micro/milli conventions, `graft_isqrt`
  * for every square root, DECIMAL(38,0)/HUGEINT routing, signed
  * division as sign·(|x| div y), all statistics computed from
  * bounded per-day / per-variant moment tables. */
object Wave15 {

  /** Shared SQL fragment for isqrt with the ±1 correction. */
  private def sqlIsqrt(x: String, s0: String): String =
    s"$s0 - CASE WHEN $s0 > 0 AND $s0 * $s0 > $x THEN 1 ELSE 0 END" +
      s" + CASE WHEN $s0 < 3037000499 AND ($s0 + 1) * ($s0 + 1) <= $x" +
      s" THEN 1 ELSE 0 END"

  // ------------------------------------------------------------- q219

  /** q219: P-CHART (attribute control chart) of the daily error rate —
    * center line p̄ from the whole window, per-day 3σ limits
    * p̄ ± 3·√(p̄(1−p̄)/n_t) (limits vary with the day's volume, the
    * textbook varying-sample-size form), LCL clamped at 0, out-of-
    * control days flagged. The monitoring primitive an ingest pipeline
    * alarms on.
    *
    * Scale shape: one map-side-combinable groupBy(day); limits and
    * flags on the ≤31-row day table against a 1-row center broadcast. */
  private def qPChart(s: SparkSession, dir: String): DataFrame = {
    val days = load(s, dir, "events")
      .groupBy(expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)")
        .as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"))
    val center = days.agg(sum(col("errors")).as("te"), sum(col("n")).as("tn"))
      .withColumn("pbar_ppm", expr("te * 1000000 div tn"))
      .select(col("pbar_ppm"))
    days.crossJoin(broadcast(center))
      .withColumn("p_ppm", expr("errors * 1000000 div n"))
      .withColumn("sigma_ppm", graft.functions.IntegerSqrt(expr(
        "pbar_ppm * (1000000 - pbar_ppm) div n")))
      .withColumn("lcl_ppm", greatest(lit(0L),
        expr("pbar_ppm - 3 * sigma_ppm")))
      .withColumn("ucl_ppm", expr("pbar_ppm + 3 * sigma_ppm"))
      .withColumn("ooc",
        (col("p_ppm") < col("lcl_ppm") || col("p_ppm") > col("ucl_ppm"))
          .cast("int"))
      .select(col("day"), col("n"), col("errors"), col("p_ppm"),
        col("pbar_ppm"), col("lcl_ppm"), col("ucl_ppm"), col("ooc"))
      .orderBy(col("day"))
  }

  private val qPChartSql = {
    val x = "pbar_ppm * (1000000 - pbar_ppm) // n"
    s"""WITH days AS (
      |  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS errors
      |  FROM events GROUP BY 1),
      |center AS (
      |  SELECT CAST(SUM(errors) * 1000000 // SUM(n) AS BIGINT)
      |    AS pbar_ppm
      |  FROM days),
      |lim AS (
      |  SELECT day, n, errors, pbar_ppm,
      |    errors * 1000000 // n AS p_ppm,
      |    CAST(floor(sqrt(CAST($x AS DOUBLE))) AS BIGINT) AS s0,
      |    $x AS xx
      |  FROM days CROSS JOIN center),
      |sig AS (
      |  SELECT day, n, errors, p_ppm, pbar_ppm,
      |    ${sqlIsqrt("xx", "s0")} AS sigma_ppm
      |  FROM lim)
      |SELECT day, n, errors, CAST(p_ppm AS BIGINT) AS p_ppm, pbar_ppm,
      |  CAST(greatest(0, pbar_ppm - 3 * sigma_ppm) AS BIGINT) AS lcl_ppm,
      |  CAST(pbar_ppm + 3 * sigma_ppm AS BIGINT) AS ucl_ppm,
      |  CAST(CASE WHEN p_ppm < greatest(0, pbar_ppm - 3 * sigma_ppm)
      |    OR p_ppm > pbar_ppm + 3 * sigma_ppm THEN 1 ELSE 0 END AS INT)
      |    AS ooc
      |FROM sig ORDER BY day""".stripMargin
  }

  // ------------------------------------------------------------- q220

  /** q220: JACKKNIFE STANDARD ERROR of the mean event value per type,
    * leave-one-DAY-out (the delete-group jackknife practitioners use
    * when rows within a day are correlated): θ₍ᵢ₎ = (S − sᵢ)/(n − nᵢ)
    * in exact micro units, SE² = (d−1)/d · Σ(θ₍ᵢ₎ − θ̄)², released via
    * `graft_isqrt`. Resampling uncertainty with zero RNG — the only
    * bootstrap-family estimator two engines can hash-agree on.
    *
    * Scale shape: one groupBy(type, day) over events folds values to
    * day moments; the d ≤ 31 leave-one-out replicates are algebra on
    * that table — the raw data is never touched twice. */
  private def qJackknife(s: SparkSession, dir: String): DataFrame = {
    val days = load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("ni"),
        sum(expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)"))
          .as("si"))
    val tot = days.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("ni")).as("n"),
        sum(col("si")).as("s"))
    // d = 1 leaves nothing to leave out: θ₍ᵢ₎'s denominator n − nᵢ is
    // zero and the jackknife is statistically undefined — such types
    // drop from the report (both engines; gate scales all have d ≥ 2)
    val loo = days.join(tot, "event_type")
      .filter(col("d") >= 2)
      .withColumn("theta_i", expr("(s - si) div (n - ni)"))
    val jbar = loo.groupBy(col("event_type"))
      .agg(max(col("d")).as("d"), max(col("n")).as("n"),
        max(col("s")).as("s"),
        sum(col("theta_i")).as("ts"),
        sum(expr("CAST(theta_i AS DECIMAL(38,0)) * theta_i")).as("tss"))
      // Σ(θᵢ−θ̄)² · d² = d·Σθᵢ² · d − (Σθᵢ)²·d ... keep exact: d·tss − ts²
      .withColumn("dev2_d", expr(
        "CAST(d AS DECIMAL(38,0)) * tss - CAST(ts AS DECIMAL(38,0)) * ts"))
      .withColumn("se2_micro2", expr(
        "CAST((d - 1) * dev2_d div (CAST(d AS DECIMAL(38,0)) * d * d)" +
          " AS BIGINT)"))
      .withColumn("jk_se_micro",
        graft.functions.IntegerSqrt(col("se2_micro2")))
      .withColumn("mean_micro", expr("s div n"))
    jbar.select(col("event_type"), col("n"), col("d"), col("mean_micro"),
        col("jk_se_micro"))
      .orderBy(col("event_type"))
  }

  private val qJackknifeSql = {
    s"""WITH days AS (
      |  SELECT event_type,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS ni,
      |    CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
      |      AS BIGINT) AS si
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
      |    CAST(SUM(ni) AS BIGINT) AS n, CAST(SUM(si) AS BIGINT) AS s
      |  FROM days GROUP BY 1),
      |loo AS (
      |  SELECT days.event_type, d, n, s,
      |    (s - si) // (n - ni) AS theta_i
      |  FROM days JOIN tot USING (event_type) WHERE d >= 2),
      |agg AS (
      |  SELECT event_type, MAX(d) AS d, MAX(n) AS n, MAX(s) AS s,
      |    CAST(SUM(theta_i) AS HUGEINT) AS ts,
      |    SUM(CAST(theta_i AS HUGEINT) * theta_i) AS tss
      |  FROM loo GROUP BY 1),
      |se AS (
      |  SELECT event_type, n, d, s,
      |    CAST((d - 1) * (CAST(d AS HUGEINT) * tss - ts * ts)
      |      // (CAST(d AS HUGEINT) * d * d) AS BIGINT) AS se2,
      |    CAST(floor(sqrt(CAST((d - 1) * (CAST(d AS HUGEINT) * tss
      |      - ts * ts) // (CAST(d AS HUGEINT) * d * d) AS DOUBLE)))
      |      AS BIGINT) AS s0
      |  FROM agg)
      |SELECT event_type, n, d, CAST(s // n AS BIGINT) AS mean_micro,
      |  CAST(${sqlIsqrt("se2", "s0")} AS BIGINT) AS jk_se_micro
      |FROM se ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------- q221

  /** q221: CUPED VARIANCE REDUCTION — the A/B-test adjustment: per
    * user, Y = second-half purchase count, X = first-half purchase
    * count (the pre-period covariate), variant by user hash;
    * θ = cov(X,Y)/var(X) POOLED (computed once, applied to both arms —
    * computing θ per-arm reintroduces bias), adjusted mean per arm =
    * Ȳ_v − θ·(X̄_v − X̄), and the realized variance-reduction ratio
    * 1 − var(Y−θX)/var(Y). Everything from one pass of (X, Y)
    * moments; θ carried in milli, means in micro, reduction in ppm.
    *
    * Scale shape: one groupBy(user) over events, one 2-row variant
    * moment table + a 1-row pooled moment broadcast. */
  private def qCuped(s: SparkSession, dir: String): DataFrame = {
    val users = load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          col("ts") < to_timestamp(lit("2024-01-16")), 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase" &&
          col("ts") >= to_timestamp(lit("2024-01-16")), 1L).otherwise(0L))
          .as("y"))
      .withColumn("variant",
        when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    val pooled = users.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      .withColumn("cov_num", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("varx_num", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("vary_num", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("theta_milli", expr(
        "CASE WHEN varx_num = 0 THEN 0L ELSE CAST(" +
          "CASE WHEN cov_num < 0 THEN -1 ELSE 1 END" +
          " * (abs(cov_num) * 1000 div varx_num) AS BIGINT) END"))
      // var(Y−θX)·n² = vary − 2θ·cov + θ²·varx, θ in milli
      .withColumn("adj_var_num", expr(
        "vary_num - 2 * theta_milli * cov_num div 1000" +
          " + CAST(theta_milli AS DECIMAL(38,0)) * theta_milli" +
          " * varx_num div 1000000"))
      .withColumn("var_reduction_ppm", expr(
        "CASE WHEN vary_num = 0 THEN 0L ELSE CAST(" +
          "1000000 - adj_var_num * 1000000 div vary_num AS BIGINT) END"))
      .withColumn("xbar_micro", expr("sx * 1000000 div n"))
      .select(col("theta_milli"), col("var_reduction_ppm"),
        col("xbar_micro"))
    users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"))
      .crossJoin(broadcast(pooled))
      .withColumn("mean_y_micro", expr("sy * 1000000 div n"))
      .withColumn("adj_mean_micro", expr(
        "mean_y_micro - theta_milli" +
          " * (sx * 1000000 div n - xbar_micro) div 1000"))
      .select(col("variant"), col("n"), col("mean_y_micro"),
        col("adj_mean_micro"), col("theta_milli"),
        col("var_reduction_ppm"))
      .orderBy(col("variant"))
  }

  private val qCupedSql =
    """WITH users AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      AND ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y,
      |    CASE WHEN substring(md5('ab:' || user_id), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
      |      AS variant
      |  FROM events GROUP BY 1),
      |pooled AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM users),
      |m AS (
      |  SELECT n, sx, sy,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_num,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS varx_num,
      |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vary_num
      |  FROM pooled),
      |th AS (
      |  SELECT n, sx,
      |    CASE WHEN varx_num = 0 THEN 0 ELSE
      |      CASE WHEN cov_num < 0 THEN -1 ELSE 1 END
      |      * (abs(cov_num) * 1000 // varx_num) END AS theta_milli,
      |    cov_num, varx_num, vary_num
      |  FROM m),
      |red AS (
      |  SELECT CAST(theta_milli AS BIGINT) AS theta_milli,
      |    CAST(CASE WHEN vary_num = 0 THEN 0 ELSE
      |      1000000 - (vary_num - 2 * theta_milli * cov_num // 1000
      |        + CAST(theta_milli AS HUGEINT) * theta_milli * varx_num
      |          // 1000000) * 1000000 // vary_num END AS BIGINT)
      |      AS var_reduction_ppm,
      |    CAST(sx * 1000000 // n AS BIGINT) AS xbar_micro
      |  FROM th)
      |SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS mean_y_micro,
      |  CAST(SUM(y) * 1000000 // COUNT(*) - theta_milli
      |    * (SUM(x) * 1000000 // COUNT(*) - xbar_micro) // 1000
      |    AS BIGINT) AS adj_mean_micro,
      |  theta_milli, var_reduction_ppm
      |FROM users CROSS JOIN red
      |GROUP BY variant, theta_milli, var_reduction_ppm, xbar_micro
      |ORDER BY variant""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q219_p_chart" -> QueryDef(qPChart, Some(qPChartSql),
      "p-chart control limits on daily error rate: varying-n 3-sigma bands via isqrt, out-of-control flags"),
    "q220_jackknife_se" -> QueryDef(qJackknife, Some(qJackknifeSql),
      "leave-one-day-out jackknife standard error of the mean, RNG-free resampling from day moments"),
    "q221_cuped" -> QueryDef(qCuped, Some(qCupedSql),
      "CUPED covariate adjustment: pooled theta, per-arm adjusted means, realized variance reduction"))
}
