package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Seventeenth wave (round 7): experiment DESIGN — the sample-size /
  * duration planner that closes the experimentation loop the waves
  * 13/15/16 opened (design → assign → SRM → CUPED → delta-CI):
  * given the observed baseline conversion and traffic, how many users
  * per arm and how many days does each minimum-detectable-effect
  * need. */
object Wave17 {

  /** q224: MDE PLANNER — per user segment: baseline DAILY purchase
    * conversion p = P(an active user-day contains a purchase) — the
    * unit is the user-day, because per-user "ever purchased"
    * SATURATES at p ≈ 1 on a 30-day window (measured: the naive
    * framing sent the variance term negative) — and for each absolute MDE
    * δ ∈ {1%, 2%, 5%} the two-proportion sample size per arm
    * n = (z_{α/2} + z_β)² · 2·p̄(1−p̄) / δ² at α = 5% two-sided,
    * power 80% (z constants as exact micro literals: 1.959964,
    * 0.841621 — the planner every experiment platform hard-codes),
    * p̄ = p + δ/2, ceil division so the plan never under-powers, and
    * the run length in days at the segment's observed daily user
    * traffic. Everything integer: z² products in DECIMAL(38,0), the
    * δ² denominator in ppm².
    *
    * Scale shape: one groupBy(user) pass, one 4-row segment moment
    * table, a 3-literal explode — arithmetic on ≤12 rows. */
  private def qMdePlanner(s: SparkSession, dir: String): DataFrame = {
    val userDays = load(s, dir, "events")
      .groupBy(col("user_id"),
        expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("segment", pmod(col("user_id"), lit(4)))
    val segs = userDays.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("conv"),
        expr("CAST(count(DISTINCT day) AS BIGINT)").as("window_days"))
      .withColumn("p_ppm", expr("conv * 1000000 div n_users"))
      .withColumn("daily_users", expr(
        "greatest(1L, n_users div window_days)"))
    segs
      .withColumn("mde_ppm", explode(expr(
        "array(10000L, 20000L, 50000L)")))
      // p̄ = p + δ/2; variance term 2·p̄(1−p̄) in ppm²
      // clamp: a saturated baseline must not send the variance negative
      .withColumn("pbar_ppm", expr(
        "least(999999L, p_ppm + mde_ppm div 2)"))
      .withColumn("n_per_arm", expr(
        // (z_a + z_b)² = 2801585² micro² → carry in DECIMAL, divide by
        // 10¹² to return to ppm scale, ceil against δ² ppm²
        "CAST((CAST(2801585 AS DECIMAL(38,0)) * 2801585" +
          " * 2 * pbar_ppm * (1000000 - pbar_ppm) div 1000000000000" +
          " + CAST(mde_ppm AS DECIMAL(38,0)) * mde_ppm - 1)" +
          " div (CAST(mde_ppm AS DECIMAL(38,0)) * mde_ppm) AS BIGINT)"))
      .withColumn("days_required", expr(
        // both arms drawn from the segment's daily traffic, ceil
        "(2 * n_per_arm + daily_users - 1) div daily_users"))
      .select(col("segment"), col("n_users"), col("p_ppm"),
        col("daily_users"), col("mde_ppm"), col("n_per_arm"),
        col("days_required"))
      .orderBy(col("segment"), col("mde_ppm"))
  }

  private val qMdePlannerSql =
    """WITH ud AS (
      |  SELECT user_id,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS converted,
      |    user_id % 4 AS segment
      |  FROM events GROUP BY 1, 2),
      |segs AS (
      |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(converted) AS BIGINT) AS conv,
      |    CAST(COUNT(DISTINCT day) AS BIGINT) AS window_days
      |  FROM ud GROUP BY 1),
      |base AS (
      |  SELECT segment, n_users,
      |    conv * 1000000 // n_users AS p_ppm,
      |    greatest(1, n_users // window_days) AS daily_users
      |  FROM segs),
      |grid AS (
      |  SELECT b.*, CAST(u.m AS BIGINT) AS mde_ppm,
      |    least(999999, b.p_ppm + CAST(u.m AS BIGINT) // 2) AS pbar_ppm
      |  FROM base b CROSS JOIN unnest([10000, 20000, 50000]) AS u(m)),
      |plan AS (
      |  SELECT segment, n_users, p_ppm, daily_users, mde_ppm,
      |    CAST((CAST(2801585 AS HUGEINT) * 2801585
      |        * 2 * pbar_ppm * (1000000 - pbar_ppm) // 1000000000000
      |      + CAST(mde_ppm AS HUGEINT) * mde_ppm - 1)
      |      // (CAST(mde_ppm AS HUGEINT) * mde_ppm) AS BIGINT)
      |      AS n_per_arm
      |  FROM grid)
      |SELECT segment, n_users, CAST(p_ppm AS BIGINT) AS p_ppm,
      |  CAST(daily_users AS BIGINT) AS daily_users, mde_ppm, n_per_arm,
      |  CAST((2 * n_per_arm + daily_users - 1) // daily_users AS BIGINT)
      |    AS days_required
      |FROM plan ORDER BY segment, mde_ppm""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q224_mde_planner" -> QueryDef(qMdePlanner, Some(qMdePlannerSql),
      "two-proportion sample-size/duration planner per segment at three MDEs, exact-micro z constants, ceil-safe"))
}
