package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load
import graft.util.Pin

/** Twenty-first wave (round 8): robust statistics and pattern mining —
  * three operators a production analytics platform layers over the
  * relational core:
  *
  *  - q234: THEIL–SEN robust trend (median of pairwise slopes) per
  *    nation, with the exact OLS slope beside it for contrast. The
  *    pair set is TIME-bounded (weeks², never rows²), so the classic
  *    "O(n²) estimator" is scale-free here by construction.
  *  - q235: ASSOCIATION RULES (A,B)→C over order baskets at the brand
  *    granularity — frequent-triple mining with support/confidence/
  *    lift in exact ppm. Alphabet-bounded counting (≤25 brands), but
  *    the basket expansion is the real distributed work and stays a
  *    linear multiple of lineitem.
  *  - q236: top session PATHS (ordered event-type trigrams within a
  *    30-minute session) — the length-3 complement of q231's
  *    transition matrix, finished by TakeOrdered, never a global sort.
  *
  * House rules: integer/ppm exactness, deterministic tie-breaks,
  * DuckDB oracle per query, windows only partitioned or bounded. */
object Wave21 {

  /** Microseconds per week (for `unix_micros div` week bucketing). */
  private val WeekUs = 604800000000L

  /** Session gap shared with q231/q229 (30 minutes, microseconds). */
  private val GapUs = 1800L * 1000000L

  // ------------------------------------------------------------- q234

  /** q234: THEIL–SEN robust revenue trend per nation — the median of
    * all pairwise weekly slopes `(cents_b - cents_a) div (wk_b -
    * wk_a)`, reported next to the exact OLS slope (both in integer
    * cents/week; OLS from closed-form sums kept in DECIMAL(38,0), so
    * no float enters any compared column). Median = the value at rank
    * `(n_pairs+1) div 2` under a slope-ascending rank — deterministic
    * as a VALUE even when equal slopes permute, so no tie-break column
    * is needed. Scale shape: the weekly aggregate is one shuffled join
    * (orders ⋈ customer, nation broadcast) down to a (25 nations ×
    * ~340 weeks) table; the "quadratic" pair join runs on THAT —
    * weeks are bounded by the calendar, not the row count, so 100× the
    * orders changes only the first aggregation. */
  private def qTheilSen(s: SparkSession, dir: String): DataFrame = {
    val weekly = Pin(load(s, dir, "orders")
      .join(load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        expr("unix_micros(o_orderdate) div 604800000000").as("wk"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("c0"))
      .groupBy(col("nation"), col("wk"))
      .agg(sum(col("c0").cast(DecimalType(38, 0))).cast(LongType)
        .as("cents")))
    val pairs = weekly.as("a").join(weekly.as("b"),
        col("a.nation") === col("b.nation") && col("a.wk") < col("b.wk"))
      .select(col("a.nation").as("nation"),
        expr("(b.cents - a.cents) div (b.wk - a.wk)").as("slope"))
    val nPairs = pairs.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_pairs"))
    val theil = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("nation")).orderBy(col("slope"))))
      .join(nPairs, "nation")
      .filter(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("nation"), col("n_pairs"), col("slope").as("theil_cpw"))
    val ols = weekly.groupBy(col("nation"))
      .agg(count(lit(1)).as("n_weeks"),
        sum(col("wk").cast(DecimalType(38, 0))).as("sx"),
        sum(col("cents").cast(DecimalType(38, 0))).as("sy"),
        sum((col("wk") * col("wk")).cast(DecimalType(38, 0))).as("sxx"),
        sum((col("wk") * col("cents")).cast(DecimalType(38, 0))).as("sxy"))
      // one week -> zero x-variance denominator; those nations have no
      // Theil median either (zero pairs), so drop them symmetrically
      .filter(col("n_weeks") >= 2)
      .select(col("nation"), col("n_weeks"),
        expr("CAST((n_weeks * sxy - sx * sy) div (n_weeks * sxx - sx * sx)" +
          " AS BIGINT)").as("ols_cpw"))
    theil.join(ols, "nation")
      .select(col("nation"), col("n_weeks"), col("n_pairs"),
        col("theil_cpw"), col("ols_cpw"))
      .orderBy(col("nation"))
  }

  private val qTheilSenSql =
    """WITH w AS MATERIALIZED (
      |  SELECT n_name AS nation,
      |    epoch_us(o_orderdate) // 604800000000 AS wk,
      |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation ON n_nationkey = c_nationkey
      |  GROUP BY 1, 2),
      |p AS MATERIALIZED (
      |  SELECT a.nation AS nation,
      |    (b.cents - a.cents) // (b.wk - a.wk) AS slope
      |  FROM w a JOIN w b ON a.nation = b.nation AND a.wk < b.wk),
      |np AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM p GROUP BY 1),
      |r AS (
      |  SELECT nation, slope,
      |    row_number() OVER (PARTITION BY nation ORDER BY slope) AS rk
      |  FROM p),
      |ts AS (
      |  SELECT r.nation, n_pairs, slope AS theil_cpw
      |  FROM r JOIN np ON np.nation = r.nation
      |  WHERE rk = (n_pairs + 1) // 2),
      |o AS (
      |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_weeks,
      |    CAST((CAST(COUNT(*) AS HUGEINT) * SUM(CAST(wk AS HUGEINT)
      |        * cents) - SUM(CAST(wk AS HUGEINT)) * SUM(CAST(cents
      |        AS HUGEINT)))
      |      // (CAST(COUNT(*) AS HUGEINT) * SUM(CAST(wk AS HUGEINT) * wk)
      |        - SUM(CAST(wk AS HUGEINT)) * SUM(CAST(wk AS HUGEINT)))
      |      AS BIGINT) AS ols_cpw
      |  FROM w GROUP BY 1 HAVING COUNT(*) >= 2)
      |SELECT ts.nation, n_weeks, n_pairs, theil_cpw, ols_cpw
      |FROM ts JOIN o ON o.nation = ts.nation
      |ORDER BY ts.nation""".stripMargin

  // ------------------------------------------------------------- q235

  /** q235: ASSOCIATION RULES over order baskets at brand granularity —
    * Apriori level 3 without the level-3 blowup: baskets are orders,
    * items are the ≤25 part brands an order touches, so triples live
    * in a ≤C(25,3) alphabet while the candidate expansion (each basket
    * emits its ≤C(7,2) in-basket pairs, then ≤C(7,3) triples) stays a
    * LINEAR multiple of lineitem — the standard shape for basket
    * mining at warehouse scale. Every rule (A,B)→C (all three
    * rotations of each frequent triple) carries exact-ppm support,
    * confidence (n_abc/n_ab) and lift (n_abc·N/(n_ab·n_c), kept in
    * DECIMAL(38,0) until the final div). Support floor: triple seen in
    * ≥ max(N div 2000, 2) baskets. Top-20 by lift via orderBy+limit —
    * TakeOrdered, no global sort. */
  private def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    // One shuffle to a per-basket SORTED BRAND SET (≤25 elements), then
    // every pair/triple is a MAP-SIDE array combination — the items
    // table is never self-joined, which at sf10 is the difference
    // between one 60M-row shuffle and three (measured 61→~15 s).
    // partkey→brand is a 2-column dim (~50 MB serialized at sf10) —
    // broadcast it so the fact table's only shuffle is the basket
    // groupBy, not a join repartition first.
    val brandOf = load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val baskets = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(brandOf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("bask"), col("p_brand").as("item"))
      .groupBy(col("bask"))
      .agg(sort_array(collect_set(col("item"))).as("its"))
    // Count-of-counts collapse BEFORE any combination explode: distinct
    // brand SETS number ≤ Σ C(25,k) regardless of basket count, so the
    // non-codegen nested-lambda enumeration runs on ≤~0.7M weighted
    // rows instead of every basket (measured 49→~13 s at sf10).
    val setCounts = Pin(baskets.groupBy(col("its"))
      .agg(count(lit(1)).as("w")))
    val nBaskets = setCounts.agg(sum(col("w")).as("n_baskets"))
    val singles = setCounts
      .select(explode(col("its")).as("item"), col("w"))
      .groupBy(col("item")).agg(sum(col("w")).as("n_c"))
    val pairCounts = setCounts.select(explode(expr(
        "flatten(transform(its, (x, i) -> transform(" +
          "slice(its, i + 2, size(its)), " +
          "y -> named_struct('a', x, 'b', y))))")).as("p"), col("w"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("w")).as("n_ab"))
    val triples = setCounts.select(explode(expr(
        "flatten(transform(its, (x, i) -> flatten(transform(" +
          "slice(its, i + 2, size(its)), (y, j) -> transform(" +
          "slice(its, i + j + 3, size(its)), " +
          "z -> named_struct('a', x, 'b', y, 'c', z))))))")).as("t"),
        col("w"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(sum(col("w")).as("n_abc"))
      .crossJoin(broadcast(nBaskets)) // 1-row corpus-size scalar
      .filter(col("n_abc") >= greatest(expr("n_baskets div 2000"), lit(2L)))
    // all three rotations of each surviving triple: antecedent pair
    // (kept in lexical order) -> consequent
    val rules = triples.select(
        explode(array(
          struct(col("a").as("ante1"), col("b").as("ante2"),
            col("c").as("cons")),
          struct(col("a").as("ante1"), col("c").as("ante2"),
            col("b").as("cons")),
          struct(col("b").as("ante1"), col("c").as("ante2"),
            col("a").as("cons")))).as("r"),
        col("n_abc"), col("n_baskets"))
      .select(col("r.ante1"), col("r.ante2"), col("r.cons"),
        col("n_abc"), col("n_baskets"))
      .join(pairCounts.withColumnRenamed("a", "ante1")
        .withColumnRenamed("b", "ante2"), Seq("ante1", "ante2"))
      .join(singles.withColumnRenamed("item", "cons")
        .withColumnRenamed("n_c", "n_cons"), Seq("cons"))
      .select(col("ante1"), col("ante2"), col("cons"), col("n_abc"),
        expr("n_abc * 1000000 div n_baskets").as("support_ppm"),
        expr("n_abc * 1000000 div n_ab").as("conf_ppm"),
        expr("CAST(CAST(n_abc AS DECIMAL(38,0)) * n_baskets * 1000000" +
          " div (CAST(n_ab AS DECIMAL(38,0)) * n_cons) AS BIGINT)")
          .as("lift_ppm"))
    rules.orderBy(col("lift_ppm").desc, col("conf_ppm").desc,
        col("ante1"), col("ante2"), col("cons"))
      .limit(20)
  }

  private val qAssocRulesSql =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS bask, p_brand AS item
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |nb AS (SELECT CAST(COUNT(DISTINCT bask) AS BIGINT) AS n_baskets
      |  FROM items),
      |singles AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_c
      |  FROM items GROUP BY 1),
      |bp AS MATERIALIZED (
      |  SELECT x.bask AS bask, x.item AS a, y.item AS b
      |  FROM items x JOIN items y
      |    ON x.bask = y.bask AND x.item < y.item),
      |pc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM bp GROUP BY 1, 2),
      |tr AS (
      |  SELECT a, b, z.item AS c, CAST(COUNT(*) AS BIGINT) AS n_abc
      |  FROM bp JOIN items z ON z.bask = bp.bask AND z.item > bp.b
      |  GROUP BY 1, 2, 3),
      |tf AS (
      |  SELECT tr.*, n_baskets FROM tr CROSS JOIN nb
      |  WHERE n_abc >= GREATEST(n_baskets // 2000, 2)),
      |rot AS (
      |  SELECT a AS ante1, b AS ante2, c AS cons, n_abc, n_baskets FROM tf
      |  UNION ALL
      |  SELECT a, c, b, n_abc, n_baskets FROM tf
      |  UNION ALL
      |  SELECT b, c, a, n_abc, n_baskets FROM tf),
      |rules AS (
      |  SELECT ante1, ante2, cons, n_abc,
      |    CAST(n_abc * 1000000 // n_baskets AS BIGINT) AS support_ppm,
      |    CAST(n_abc * 1000000 // n_ab AS BIGINT) AS conf_ppm,
      |    CAST(CAST(n_abc AS HUGEINT) * n_baskets * 1000000
      |      // (CAST(n_ab AS HUGEINT) * n_c) AS BIGINT) AS lift_ppm
      |  FROM rot
      |  JOIN pc ON pc.a = rot.ante1 AND pc.b = rot.ante2
      |  JOIN singles ON singles.item = rot.cons)
      |SELECT * FROM rules
      |ORDER BY lift_ppm DESC, conf_ppm DESC, ante1, ante2, cons
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q236

  /** q236: TOP SESSION PATHS — the 20 most common ordered event-type
    * trigrams inside a 30-minute session (q231's matrix extended one
    * step: "view → click → purchase" journeys, the report a funnel
    * designer actually reads). Two leads over the same per-user
    * session window; counting is alphabet³-bounded; the final top-20
    * is `orderBy.limit` → distributed TakeOrdered. */
  private def qTopPaths(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("us"),
      col("event_id"))
    val ws = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("brk", when(coalesce(col("us") - lag(col("us"), 1)
        .over(wu), lit(GapUs + 1)) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wu))
      .withColumn("t2", lead(col("event_type"), 1).over(ws))
      .withColumn("t3", lead(col("event_type"), 2).over(ws))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  private val qTopPathsSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
       |  FROM events),
       |o AS (
       |  SELECT *, lag(us) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS pus
       |  FROM e),
       |b AS (
       |  SELECT *, CASE WHEN pus IS NULL OR us - pus > $GapUs
       |    THEN 1 ELSE 0 END AS brk FROM o),
       |sid AS (
       |  SELECT *, SUM(brk) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS sid
       |  FROM b),
       |tri AS (
       |  SELECT user_id, event_type AS step1,
       |    lead(event_type, 1) OVER w AS step2,
       |    lead(event_type, 2) OVER w AS step3
       |  FROM sid
       |  WINDOW w AS (PARTITION BY user_id, sid ORDER BY us, event_id))
       |SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM tri WHERE step3 IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY n DESC, step1, step2, step3
       |LIMIT 20""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q234_theil_sen" -> QueryDef(qTheilSen, Some(qTheilSenSql),
      "Theil-Sen robust weekly trend vs exact OLS, integer cents/week"),
    "q235_assoc_rules" -> QueryDef(qAssocRules, Some(qAssocRulesSql),
      "basket association rules (A,B)->C with exact-ppm " +
        "support/confidence/lift"),
    "q236_top_paths" -> QueryDef(qTopPaths, Some(qTopPathsSql),
      "top ordered session trigrams via TakeOrdered"))
}
