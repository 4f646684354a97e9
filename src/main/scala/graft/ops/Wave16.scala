package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Sixteenth wave (round 7): the two experiment-integrity checks that
  * complete the wave-13/15 experimentation family — sample-ratio
  * mismatch (the assignment-health alarm every A/B platform runs
  * before trusting any metric) and the delta-method confidence
  * interval for RATIO metrics (value per event — the metric family
  * whose naive per-user variance is simply wrong).
  *
  * House rules: integer micro/ppm conventions, `graft_isqrt`,
  * DECIMAL(38,0)/HUGEINT routing, one histogram/moment groupBy per
  * query. */
object Wave16 {

  // ------------------------------------------------------------- q222

  /** q222: SAMPLE-RATIO MISMATCH — per user segment, are the A/B arm
    * counts consistent with the designed 50/50 split: the df=1
    * goodness-of-fit statistic χ² = (2·n_A − n)²/n in exact micro
    * units (algebraically Σ(Oᵢ−n/2)²/(n/2) without ever forming the
    * fractional expectation), flagged at the 3.84 critical value
    * (α = 5%). An SRM flag means the assignment itself is broken and
    * every downstream metric is garbage — it runs FIRST.
    *
    * Scale shape: one groupBy(user) to fix each user's arm, one
    * groupBy(segment) count — 4-row arithmetic. */
  private def qSrm(s: SparkSession, dir: String): DataFrame = {
    val users = load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
      .withColumn("segment", pmod(col("user_id"), lit(4)))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    users.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"))
      .withColumn("n_b", col("n") - col("n_a"))
      .withColumn("chi2_micro", expr(
        "CAST((2 * n_a - n) * (2 * n_a - n) AS DECIMAL(38,0))" +
          " * 1000000 div n"))
      .withColumn("chi2_micro", expr("CAST(chi2_micro AS BIGINT)"))
      .withColumn("srm", (col("chi2_micro") > 3841459L).cast("int"))
      .select(col("segment"), col("n"), col("n_a"), col("n_b"),
        col("chi2_micro"), col("srm"))
      .orderBy(col("segment"))
  }

  private val qSrmSql =
    """WITH users AS (
      |  SELECT user_id, user_id % 4 AS segment,
      |    CASE WHEN substring(md5('ab:' || user_id), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
      |      AS arm
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_a
      |  FROM users GROUP BY 1)
      |SELECT segment, n, n_a, n - n_a AS n_b,
      |  CAST(CAST((2 * n_a - n) * (2 * n_a - n) AS HUGEINT) * 1000000
      |    // n AS BIGINT) AS chi2_micro,
      |  CAST(CASE WHEN CAST((2 * n_a - n) * (2 * n_a - n) AS HUGEINT)
      |    * 1000000 // n > 3841459 THEN 1 ELSE 0 END AS INT) AS srm
      |FROM c ORDER BY segment""".stripMargin

  // ------------------------------------------------------------- q223

  /** q223: DELTA-METHOD CI FOR A RATIO METRIC — value per event, per
    * A/B arm: R = ΣY/ΣX with user-level clustering, so
    * Var(R) ≈ (σ_y² − 2R·σ_xy + R²·σ_x²) / (n·x̄²) — the delta-method
    * form every experimentation platform uses for ratio metrics
    * (naive row-level variance ignores that users, not events, are
    * the randomization unit). Carried exactly: R in micro, the three
    * central moments as DECIMAL numerators over n², SE via
    * `graft_isqrt`, CI at z = 1.959964.
    *
    * Scale shape: one groupBy(user) folding (x, y), one 2-row arm
    * moment aggregate; everything after is scalar algebra. */
  private def qRatioDelta(s: SparkSession, dir: String): DataFrame = {
    val users = load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("y"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      // R in micro cents-per-event
      .withColumn("r_micro", expr("sy * 1000000 div sx"))
      // central-moment numerators (×n²): nΣaa − (Σa)²
      .withColumn("vy", expr(
        "CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("vx", expr(
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("cxy", expr(
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      // numerator of Var(R): vy − 2R·cxy + R²·vx, R carried in micro
      .withColumn("var_num", expr(
        "vy - 2 * r_micro * cxy div 1000000" +
          " + CAST(r_micro AS DECIMAL(38,0)) * r_micro * vx" +
          " div 1000000000000"))
      // Var(R̄) = var_num / (n² · n · x̄²) with x̄ = sx/n →
      // = var_num / (n · sx²); SE in micro = isqrt(var_num·10¹² / (n·sx²))
      .withColumn("se2_micro2", expr(
        "CAST(greatest(CAST(0 AS DECIMAL(38,0))," +
          " var_num * 1000000000000" +
          " div (CAST(n AS DECIMAL(38,0)) * sx * sx)) AS BIGINT)"))
      .withColumn("se_micro",
        graft.functions.IntegerSqrt(col("se2_micro2")))
      .withColumn("ci_lo_micro", expr(
        "r_micro - 1959964 * se_micro div 1000000"))
      .withColumn("ci_hi_micro", expr(
        "r_micro + 1959964 * se_micro div 1000000"))
      .select(col("arm"), col("n"), col("r_micro"), col("se_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"))
      .orderBy(col("arm"))
  }

  private val qRatioDeltaSql =
    """WITH u0 AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
      |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM events GROUP BY 1),
      |users AS (
      |  SELECT user_id, x, y,
      |    CASE WHEN substring(md5('ab:' || user_id), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
      |      AS arm
      |  FROM u0),
      |m AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM users GROUP BY 1),
      |r AS (
      |  SELECT arm, n, sx, sy,
      |    sy * 1000000 // sx AS r_micro,
      |    CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy,
      |    CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
      |    CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cxy
      |  FROM m),
      |v AS (
      |  SELECT arm, n, sx, r_micro,
      |    vy - 2 * r_micro * cxy // 1000000
      |      + CAST(r_micro AS HUGEINT) * r_micro * vx // 1000000000000
      |      AS var_num
      |  FROM r),
      |se AS (
      |  SELECT arm, n, r_micro,
      |    CAST(greatest(CAST(0 AS HUGEINT), var_num * 1000000000000
      |      // (CAST(n AS HUGEINT) * sx * sx)) AS BIGINT) AS se2,
      |    CAST(floor(sqrt(CAST(greatest(CAST(0 AS HUGEINT),
      |      var_num * 1000000000000 // (CAST(n AS HUGEINT) * sx * sx))
      |      AS DOUBLE))) AS BIGINT) AS s0
      |  FROM v),
      |f AS (
      |  SELECT arm, n, CAST(r_micro AS BIGINT) AS r_micro,
      |    s0 - CASE WHEN s0 > 0 AND s0 * s0 > se2 THEN 1 ELSE 0 END
      |       + CASE WHEN s0 < 3037000499 AND (s0 + 1) * (s0 + 1) <= se2
      |           THEN 1 ELSE 0 END AS se_micro
      |  FROM se)
      |SELECT arm, n, r_micro, CAST(se_micro AS BIGINT) AS se_micro,
      |  CAST(r_micro - 1959964 * se_micro // 1000000 AS BIGINT)
      |    AS ci_lo_micro,
      |  CAST(r_micro + 1959964 * se_micro // 1000000 AS BIGINT)
      |    AS ci_hi_micro
      |FROM f ORDER BY arm""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q222_srm_check" -> QueryDef(qSrm, Some(qSrmSql),
      "sample-ratio-mismatch goodness-of-fit per segment, exact micro chi-square, 3.84 alarm"),
    "q223_ratio_delta_ci" -> QueryDef(qRatioDelta, Some(qRatioDeltaSql),
      "delta-method CI for the value-per-event ratio metric, user-clustered moments, isqrt SE"))
}
