package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Twenty-sixth wave (round 8): cooperative attribution and privacy
  * planning —
  *
  *  - q248: EXACT SHAPLEY channel attribution. The model-based upgrade
  *    of q141's rule-based attribution: each touch channel's credit is
  *    its exact Shapley value over the empirical conversion-rate
  *    characteristic function v(S) = conversion ppm of users whose
  *    touch set is exactly S. With m=4 channels the lattice is 16
  *    subsets, so after ONE user-level groupBy every Shapley term is
  *    arithmetic on a broadcast-bounded table — the textbook "heavy
  *    scan, tiny lattice" decomposition that survives any corpus size.
  *  - q249: K-ANONYMITY GENERALIZATION LADDER. q146 audits one QI
  *    grid; release planning needs the minimal generalization level
  *    that reaches k — computed here for the whole ladder in ONE scan
  *    via GROUPING SETS (month → quarter → year → drop-priority),
  *    never four passes.
  *
  * House rules: integer exactness (ppm, factorial-scaled credits),
  * deterministic orders, DuckDB oracle per query, windows bounded. */
object Wave26 {

  // ------------------------------------------------------------- q248

  /** Touch channels (bit weights) and the conversion event. Shapley
    * coefficients for m=4: weight(|S|) = |S|!·(3−|S|)! over 4! = 24. */
  private val Channels = Seq(("click", 1L), ("error", 2L),
    ("signup", 4L), ("view", 8L))

  /** q248: exact SHAPLEY attribution. One linear pass folds each user
    * to (touch-bitmask, converted); the 16-row mask lattice (zero-
    * completed so v is total on the lattice) carries conversion ppm;
    * each channel's marginal Σ w(|S|)·(v(S∪i)−v(S)) runs over the 8
    * S∌i subsets — a ≤4×16 broadcast theta-join, exact integers with
    * denominator 24 reported alongside the truncated ppm. */
  private def qShapley(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perUser = load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(Channels.map { case (name, bit) =>
          max(when(col("event_type") === name, bit).otherwise(0L))
            .as(s"b_$name")
        }.reduce(_ + _).as("mask"), // each term is a distinct bit
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val byMask = perUser.groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("nconv"))
    val lattice = (0L until 16L).toDF("mask")
      .join(byMask, Seq("mask"), "left")
      .select(col("mask"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("nconv"), lit(0L)).as("nconv"))
      .withColumn("v_ppm", expr(
        "CASE WHEN n = 0 THEN 0 ELSE nconv * 1000000 div n END"))
    val ch = Channels.toDF("channel", "bit")
    // S ∌ i lattice join: 4×8 pairs, all broadcast-bounded
    val pairs = broadcast(ch)
      .join(broadcast(lattice.select(col("mask").as("s"),
        col("v_ppm").as("v_s"))), expr("(s & bit) = 0"))
      .join(broadcast(lattice.select(col("mask").as("si"),
        col("v_ppm").as("v_si"))), expr("si = (s | bit)"))
      .withColumn("coef", expr(
        """CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2
          |WHEN 2 THEN 2 ELSE 6 END""".stripMargin))
    val phi = pairs.groupBy(col("channel"), col("bit"))
      .agg(sum(col("coef") * (col("v_si") - col("v_s")))
        .as("phi_scaled_24"))
    val exposure = broadcast(ch)
      .join(broadcast(lattice), expr("(mask & bit) <> 0"))
      .groupBy(col("channel"))
      .agg(sum(col("n")).as("n_exposed"),
        sum(col("nconv")).as("conv_exposed"))
    phi.join(exposure, Seq("channel"))
      .select(col("channel"), col("n_exposed"), col("conv_exposed"),
        col("phi_scaled_24"),
        expr("phi_scaled_24 div 24").as("phi_ppm"))
      .orderBy(col("channel"))
  }

  private val qShapleySql = {
    val values = Channels.map { case (n, b) => s"('$n', $b)" }
      .mkString(", ")
    s"""WITH per_user AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
       |    + MAX(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END)
       |      AS mask,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS conv
       |  FROM events GROUP BY 1),
       |by_mask AS (
       |  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(conv) AS BIGINT) AS nconv
       |  FROM per_user GROUP BY 1),
       |lattice AS (
       |  SELECT u.mask, COALESCE(n, 0) AS n, COALESCE(nconv, 0) AS nconv,
       |    CASE WHEN COALESCE(n, 0) = 0 THEN 0
       |      ELSE COALESCE(nconv, 0) * 1000000 // n END AS v_ppm
       |  FROM (SELECT unnest(range(0, 16)) AS mask) u
       |  LEFT JOIN by_mask ON by_mask.mask = u.mask),
       |ch AS (SELECT * FROM (VALUES $values) v(channel, bit)),
       |pairs AS (
       |  SELECT channel, bit,
       |    CASE bit_count(ls.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
       |      WHEN 2 THEN 2 ELSE 6 END AS coef,
       |    li.v_ppm - ls.v_ppm AS dv
       |  FROM ch
       |  JOIN lattice ls ON (ls.mask & bit) = 0
       |  JOIN lattice li ON li.mask = (ls.mask | bit)),
       |phi AS (
       |  SELECT channel, bit,
       |    CAST(SUM(coef * dv) AS BIGINT) AS phi_scaled_24
       |  FROM pairs GROUP BY 1, 2),
       |expo AS (
       |  SELECT channel,
       |    CAST(SUM(n) AS BIGINT) AS n_exposed,
       |    CAST(SUM(nconv) AS BIGINT) AS conv_exposed
       |  FROM ch JOIN lattice ON (lattice.mask & bit) <> 0
       |  GROUP BY 1)
       |SELECT phi.channel, n_exposed, conv_exposed, phi_scaled_24,
       |  phi_scaled_24 // 24 AS phi_ppm
       |FROM phi JOIN expo ON expo.channel = phi.channel
       |ORDER BY phi.channel""".stripMargin
  }

  // ------------------------------------------------------------- q249

  private val AnonK = 10L

  /** q249: k-anonymity GENERALIZATION LADDER in one scan. Level 0
    * (priority, year, month) → 1 (priority, year, quarter) → 2
    * (priority, year) → 3 (year): GROUPING SETS computes all four QI
    * grids in one aggregate; each level then folds to group count,
    * smallest/largest group, and whether min ≥ k; `chosen` marks the
    * first (least-generalized) level that satisfies k — the level a
    * release pipeline would publish at. The final fold runs on ≤4
    * rows. */
  private def qGeneralizationLadder(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val o = load(s, dir, "orders").select(
      col("o_orderpriority").as("prio"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      quarter(col("o_orderdate")).as("qt"))
    val grids = o.groupingSets(
        Seq(Seq(col("prio"), col("yr"), col("mo")),
          Seq(col("prio"), col("yr"), col("qt")),
          Seq(col("prio"), col("yr")),
          Seq(col("yr"))),
        col("prio"), col("yr"), col("mo"), col("qt"))
      .agg(grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n"))
    // gid over (prio, yr, mo, qt): bit 8=prio, 4=yr, 2=mo, 1=qt
    val perLevel = grids.withColumn("level", expr(
        "CASE gid WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 3 END"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"), min(col("n")).as("min_group"),
        max(col("n")).as("max_group"))
    val levels = (0L until 4L).toDF("level")
      .join(perLevel, Seq("level"), "left")
      .select(col("level"), coalesce(col("n_groups"), lit(0L))
          .as("n_groups"),
        coalesce(col("min_group"), lit(0L)).as("min_group"),
        coalesce(col("max_group"), lit(0L)).as("max_group"))
      .withColumn("meets_k",
        col("n_groups") > 0L && col("min_group") >= AnonK)
    // 4-row fold: the least-generalized passing level wins
    val best = levels.filter(col("meets_k"))
      .agg(min(col("level")).as("best_level"))
    levels.crossJoin(broadcast(best)) // one-row scalar
      .withColumn("chosen", col("best_level").isNotNull &&
        col("level") === col("best_level"))
      .select(col("level"), col("n_groups"), col("min_group"),
        col("max_group"), col("meets_k"), col("chosen"))
      .orderBy(col("level"))
  }

  private val qGeneralizationLadderSql =
    s"""WITH o AS (
       |  SELECT o_orderpriority AS prio,
       |    CAST(year(o_orderdate) AS INTEGER) AS yr,
       |    CAST(month(o_orderdate) AS INTEGER) AS mo,
       |    CAST(quarter(o_orderdate) AS INTEGER) AS qt
       |  FROM orders),
       |grids AS (
       |  SELECT CAST(GROUPING(prio, yr, mo, qt) AS BIGINT) AS gid,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM o GROUP BY GROUPING SETS
       |    ((prio, yr, mo), (prio, yr, qt), (prio, yr), (yr))),
       |per_level AS (
       |  SELECT CASE gid WHEN 1 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 2
       |      ELSE 3 END AS level,
       |    CAST(COUNT(*) AS BIGINT) AS n_groups,
       |    CAST(MIN(n) AS BIGINT) AS min_group,
       |    CAST(MAX(n) AS BIGINT) AS max_group
       |  FROM grids GROUP BY 1),
       |levels AS (
       |  SELECT u.level, COALESCE(n_groups, 0) AS n_groups,
       |    COALESCE(min_group, 0) AS min_group,
       |    COALESCE(max_group, 0) AS max_group,
       |    COALESCE(n_groups, 0) > 0 AND COALESCE(min_group, 0) >= $AnonK
       |      AS meets_k
       |  FROM (SELECT unnest(range(0, 4)) AS level) u
       |  LEFT JOIN per_level ON per_level.level = u.level),
       |best AS (
       |  SELECT MIN(level) AS best_level FROM levels WHERE meets_k)
       |SELECT levels.level, n_groups, min_group, max_group, meets_k,
       |  best_level IS NOT NULL AND levels.level = best_level AS chosen
       |FROM levels, best
       |ORDER BY levels.level""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q248_shapley_attribution" -> QueryDef(qShapley, Some(qShapleySql),
      "exact Shapley channel attribution over the empirical 16-subset lattice"),
    "q249_generalization_ladder" -> QueryDef(qGeneralizationLadder,
      Some(qGeneralizationLadderSql),
      "k-anonymity generalization ladder in one GROUPING SETS scan"))
}
