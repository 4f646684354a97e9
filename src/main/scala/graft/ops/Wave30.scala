package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Thirtieth wave (round 8): causal-inference and count-model
  * diagnostics — two estimator shapes the experimentation battery
  * (q210–q224) did not yet cover:
  *
  *  - q254: DIFFERENCE-IN-DIFFERENCES. The workhorse quasi-
  *    experimental estimator when randomization isn't available:
  *    (post−pre) for the treated arm minus (post−pre) for control.
  *    One conditional-aggregation pass builds all four cells; the
  *    estimate is exact integer micro-cents arithmetic on a one-row
  *    frame.
  *  - q255: INDEX OF DISPERSION (variance-to-mean ratio) on the
  *    zero-filled daily count series per event type — the diagnostic
  *    that decides Poisson vs negative-binomial rate modeling.
  *    Skipping the zero days would bias the variance, so the series
  *    is completed on the (span × type-alphabet) spine — bounded by
  *    calendar days, not rows.
  *
  * House rules: integer exactness, deterministic orders, DuckDB
  * oracle per query, windows bounded. */
object Wave30 {

  // ------------------------------------------------------------- q254

  /** Deterministic quasi-experiment over orders: treatment = even
    * customer key, post-period = orderdate year ≥ 1996. Metric: mean
    * order value in micro-cents (exact DECIMAL cents sum, truncated
    * micro division). */
  private def qDiffInDiff(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders").select(
      (col("o_custkey") % 2 === 0).cast("int").as("treated"),
      (year(col("o_orderdate")) >= 1996).cast("int").as("post"),
      expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
        .as("cents"))
    def cell(t: Int, p: Int, what: String) = what match {
      case "n" => sum(when(col("treated") === t && col("post") === p, 1L)
        .otherwise(0L))
      case "s" => sum(when(col("treated") === t && col("post") === p,
        col("cents")).otherwise(0L))
    }
    o.agg(
        cell(1, 0, "n").as("n_pre_t"), cell(1, 0, "s").as("s_pre_t"),
        cell(1, 1, "n").as("n_post_t"), cell(1, 1, "s").as("s_post_t"),
        cell(0, 0, "n").as("n_pre_c"), cell(0, 0, "s").as("s_pre_c"),
        cell(0, 1, "n").as("n_post_c"), cell(0, 1, "s").as("s_post_c"))
      .select(col("n_pre_t"), col("n_post_t"), col("n_pre_c"),
        col("n_post_c"),
        // cents-sum × 1e6 passes 2^63 at sf1 — route through DECIMAL
        expr("CASE WHEN n_pre_t = 0 THEN 0L ELSE CAST(" +
          "CAST(s_pre_t AS DECIMAL(38,0)) * 1000000 div n_pre_t " +
          "AS BIGINT) END").as("pre_t_micro"),
        expr("CASE WHEN n_post_t = 0 THEN 0L ELSE CAST(" +
          "CAST(s_post_t AS DECIMAL(38,0)) * 1000000 div n_post_t " +
          "AS BIGINT) END").as("post_t_micro"),
        expr("CASE WHEN n_pre_c = 0 THEN 0L ELSE CAST(" +
          "CAST(s_pre_c AS DECIMAL(38,0)) * 1000000 div n_pre_c " +
          "AS BIGINT) END").as("pre_c_micro"),
        expr("CASE WHEN n_post_c = 0 THEN 0L ELSE CAST(" +
          "CAST(s_post_c AS DECIMAL(38,0)) * 1000000 div n_post_c " +
          "AS BIGINT) END").as("post_c_micro"))
      .select(col("*"),
        (col("post_t_micro") - col("pre_t_micro")
          - (col("post_c_micro") - col("pre_c_micro"))).as("did_micro"))
  }

  private val qDiffInDiffSql =
    """WITH o AS (
      |  SELECT CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END AS treated,
      |    CASE WHEN year(o_orderdate) >= 1996 THEN 1 ELSE 0 END AS post,
      |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |cells AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN treated=1 AND post=0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_pre_t,
      |    CAST(SUM(CASE WHEN treated=1 AND post=1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_post_t,
      |    CAST(SUM(CASE WHEN treated=0 AND post=0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_pre_c,
      |    CAST(SUM(CASE WHEN treated=0 AND post=1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_post_c,
      |    CAST(SUM(CASE WHEN treated=1 AND post=0 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s_pre_t,
      |    CAST(SUM(CASE WHEN treated=1 AND post=1 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s_post_t,
      |    CAST(SUM(CASE WHEN treated=0 AND post=0 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s_pre_c,
      |    CAST(SUM(CASE WHEN treated=0 AND post=1 THEN cents ELSE 0 END)
      |      AS BIGINT) AS s_post_c
      |  FROM o),
      |m AS (
      |  SELECT n_pre_t, n_post_t, n_pre_c, n_post_c,
      |    CAST(CASE WHEN n_pre_t = 0 THEN 0
      |      ELSE CAST(s_pre_t AS HUGEINT) * 1000000 // n_pre_t END
      |      AS BIGINT) AS pre_t_micro,
      |    CAST(CASE WHEN n_post_t = 0 THEN 0
      |      ELSE CAST(s_post_t AS HUGEINT) * 1000000 // n_post_t END
      |      AS BIGINT) AS post_t_micro,
      |    CAST(CASE WHEN n_pre_c = 0 THEN 0
      |      ELSE CAST(s_pre_c AS HUGEINT) * 1000000 // n_pre_c END
      |      AS BIGINT) AS pre_c_micro,
      |    CAST(CASE WHEN n_post_c = 0 THEN 0
      |      ELSE CAST(s_post_c AS HUGEINT) * 1000000 // n_post_c END
      |      AS BIGINT) AS post_c_micro
      |  FROM cells)
      |SELECT *, post_t_micro - pre_t_micro
      |  - (post_c_micro - pre_c_micro) AS did_micro
      |FROM m""".stripMargin

  // ------------------------------------------------------------- q255

  /** q255: variance-to-mean ratio per event type on the zero-filled
    * daily series. Moments are n²-scaled integers (var·n² =
    * n·Σx²−S²), the ratio is exact ppm, and `overdispersed` flags
    * I > 1 — the negative-binomial signal. The spine is
    * (span days × observed type alphabet): both factors bounded, so
    * the completion join is broadcast-bounded. */
  private def qDispersionIndex(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val days = span.select(
      explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val types = daily.select(col("event_type")).distinct()
    val filled = days.crossJoin(broadcast(types)) // span × alphabet
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), coalesce(col("x"), lit(0L)).as("x"))
    filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total"),
        sum(col("x") * col("x")).as("sum_sq"))
      .select(col("event_type"), col("n_days"), col("total"),
        expr("CASE WHEN n_days = 0 THEN 0 ELSE total * 1000000 div " +
          "n_days END").as("mean_micro"),
        // n·Σx²·1e6 passes 2^63 for a high-variance type at large SF —
        // route through DECIMAL(38,0) like q254's cents sums
        expr("CASE WHEN total = 0 THEN 0L ELSE " +
          "(CAST(n_days AS DECIMAL(38,0)) * sum_sq - " +
          "CAST(total AS DECIMAL(38,0)) * total) * 1000000 div " +
          "(CAST(n_days AS DECIMAL(38,0)) * total) END")
          .as("dispersion_ppm"))
      .withColumn("overdispersed", col("dispersion_ppm") > 1000000L)
      .orderBy(col("event_type"))
  }

  private val qDispersionIndexSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |days AS (
      |  SELECT CAST(u.day AS DATE) AS day FROM (
      |    SELECT unnest(generate_series(
      |      (SELECT MIN(day) FROM daily),
      |      (SELECT MAX(day) FROM daily), INTERVAL 1 DAY)) AS day) u),
      |filled AS (
      |  SELECT t.event_type, COALESCE(x, 0) AS x
      |  FROM days CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      |  LEFT JOIN daily ON daily.event_type = t.event_type
      |    AND daily.day = days.day),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS total,
      |    CAST(SUM(x * x) AS BIGINT) AS sum_sq
      |  FROM filled GROUP BY 1)
      |SELECT event_type, n_days, total,
      |  CASE WHEN n_days = 0 THEN 0
      |    ELSE total * 1000000 // n_days END AS mean_micro,
      |  CAST(CASE WHEN total = 0 THEN 0 ELSE
      |    (CAST(n_days AS HUGEINT) * sum_sq - CAST(total AS HUGEINT)
      |     * total) * 1000000 // (CAST(n_days AS HUGEINT) * total)
      |    END AS BIGINT) AS dispersion_ppm,
      |  CASE WHEN total = 0 THEN FALSE ELSE
      |    (CAST(n_days AS HUGEINT) * sum_sq - CAST(total AS HUGEINT)
      |     * total) * 1000000 // (CAST(n_days AS HUGEINT) * total)
      |    > 1000000 END AS overdispersed
      |FROM m ORDER BY event_type""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q254_diff_in_diff" -> QueryDef(qDiffInDiff, Some(qDiffInDiffSql),
      "difference-in-differences estimate, exact integer micro-cents"),
    "q255_dispersion_index" -> QueryDef(qDispersionIndex,
      Some(qDispersionIndexSql),
      "variance-to-mean dispersion index on the zero-filled daily series"))
}
