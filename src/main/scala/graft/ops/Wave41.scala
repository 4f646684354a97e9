package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Forty-first wave (round 10): three distributed-systems planning
  * operators —
  *
  *  - q277: CONSISTENT-HASH RING AUDIT — the K2-sharding design
  *    question asked before any resharding: with 8 nodes × 16 vnodes
  *    on a 2⁴⁸ md5 ring, how balanced are the key assignments, and
  *    what fraction of keys move when node 8 joins? Assignment is the
  *    ring-successor rule (smallest vnode position ≥ the key's
  *    position, wrapping to the global min), computed WITHOUT a
  *    theta join: the ≤144 vnode positions are a driver-side literal
  *    array, the successor is `array_min(filter(...))` inside
  *    whole-stage codegen, and only the (position → node) attribution
  *    is a broadcast join. Consistent hashing's contract — ~1/(n+1)
  *    of keys move, only TO the new node — is what the oracle checks,
  *    and the spec asserts the no-stray-movement invariant directly.
  *  - q278: NEYMAN ALLOCATION — stratified-sampling design (allocate
  *    n=10 000 samples ∝ N_h·σ_h) entirely in gateable integers:
  *    per-stratum variance from DECIMAL(38,0) moment sums, σ as the
  *    corrected-floor integer sqrt (q162's device), and the final
  *    allocation by largest-remainder apportionment (q175's device,
  *    ties to the stratum name) so the parts sum to n exactly.
  *  - q279: WATERMARK-DELAY PLANNER — picks the allowed-lateness a
  *    streaming job should configure: per-entity event-time disorder
  *    (lateness vs the running per-key max over arrival order, q233's
  *    domain) is priced against a bounded candidate-delay table, and
  *    each delay reports its completeness ppm plus whether it is the
  *    MINIMAL candidate meeting the 99.9% completeness target —
  *    exactly the trade a `withWatermark` duration encodes.
  *
  * Scale shapes: q277 touches each key twice with a 144-element
  * codegen'd array probe (no join fan-out); q278 is one map-side
  * moment aggregate to a 5-row stratum table; q279 is one partitioned
  * running-max window + a 6-row broadcast delay table. */
object Wave41 {

  // ------------------------------------------------------------- q277

  private val RingNodes = 8
  private val RingVnodes = 16

  /** 48-bit md5-prefix ring position of a label (both engines state
    * the identical arithmetic). */
  private def md5pos(tag: String): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5($tag), 1, 12), 16, 10) AS BIGINT)")

  private def qHashRing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def vnodeTable(nNodes: Int): DataFrame =
      (0 until nNodes).flatMap(n => (0 until RingVnodes).map(v => (n, v)))
        .toDF("node", "vn")
        .select(col("node"),
          md5pos("concat('n', node, '|v', vn)").as("pos"))
    val vn8 = vnodeTable(RingNodes)
    val vn9 = vnodeTable(RingNodes + 1)
    // bounded collect: ring metadata (<= 144 vnode positions) ->
    // driver literals for the codegen array probe
    def posArray(vn: DataFrame): String =
      vn.select(col("pos")).collect().map(_.getLong(0)).sorted
        .mkString("array(", "L,", "L)")
    val arr8 = posArray(vn8)
    val arr9 = posArray(vn9)
    val keys = load(s, dir, "lineitem")
      .select(col("l_orderkey")).distinct()
      .withColumn("kpos", md5pos("concat('k|', l_orderkey)"))
      // ring successor: smallest vnode position >= kpos, wrap to min
      .withColumn("apos8", expr(
        s"coalesce(array_min(filter($arr8, p -> p >= kpos)), " +
          s"array_min($arr8))"))
      .withColumn("apos9", expr(
        s"coalesce(array_min(filter($arr9, p -> p >= kpos)), " +
          s"array_min($arr9))"))
    val assigned = keys
      .join(broadcast(vn8.select(col("pos").as("apos8"),
        col("node").as("node8"))), Seq("apos8"))
      .join(broadcast(vn9.select(col("pos").as("apos9"),
        col("node").as("node9"))), Seq("apos9"))
    val ap = graft.util.Pin(assigned
      .select(col("l_orderkey"), col("node8"), col("node9")))
    val moved = ap.agg(
      count(lit(1)).as("n_keys"),
      coalesce(sum(when(col("node8") =!= col("node9"), 1L)
        .otherwise(0L)), lit(0L)).as("n_moved"))
      .select(col("n_keys"), col("n_moved"),
        expr("n_moved * 1000000 div n_keys").as("moved_ppm"))
    val before = ap.groupBy(col("node8").as("node"))
      .agg(count(lit(1)).as("keys_before"))
    val after = ap.groupBy(col("node9").as("node"))
      .agg(count(lit(1)).as("keys_after"))
    after.join(before, Seq("node"), "left")
      .select(col("node").cast(LongType).as("node"),
        coalesce(col("keys_before"), lit(0L)).as("keys_before"),
        col("keys_after"))
      .crossJoin(broadcast(moved)) // one-row totals frame
      .orderBy(col("node"))
  }

  private val qHashRingSql = {
    def vn(n: Int) =
      s"""SELECT node, CAST(('0x' || substring(
         |    md5('n' || node || '|v' || vn), 1, 12)) AS BIGINT) AS pos
         |  FROM range(0, $n) t1(node), range(0, $RingVnodes) t2(vn)"""
        .stripMargin
    s"""WITH vn8 AS MATERIALIZED (__VN8__),
       |vn9 AS MATERIALIZED (__VN9__),
       |k AS (
       |  SELECT DISTINCT l_orderkey,
       |    CAST(('0x' || substring(md5('k|' || l_orderkey), 1, 12))
       |      AS BIGINT) AS kpos
       |  FROM lineitem),
       |a AS MATERIALIZED (
       |  SELECT l_orderkey,
       |    COALESCE((SELECT MIN(pos) FROM vn8 WHERE pos >= k.kpos),
       |      (SELECT MIN(pos) FROM vn8)) AS apos8,
       |    COALESCE((SELECT MIN(pos) FROM vn9 WHERE pos >= k.kpos),
       |      (SELECT MIN(pos) FROM vn9)) AS apos9
       |  FROM k),
       |asg AS MATERIALIZED (
       |  SELECT a.l_orderkey, v8.node AS node8, v9.node AS node9
       |  FROM a JOIN vn8 v8 ON v8.pos = a.apos8
       |         JOIN vn9 v9 ON v9.pos = a.apos9),
       |mv AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |    CAST(COALESCE(SUM(CASE WHEN node8 <> node9 THEN 1 ELSE 0
       |      END), 0) AS BIGINT) AS n_moved
       |  FROM asg),
       |b AS (SELECT node8 AS node, CAST(COUNT(*) AS BIGINT)
       |        AS keys_before FROM asg GROUP BY 1),
       |af AS (SELECT node9 AS node, CAST(COUNT(*) AS BIGINT)
       |        AS keys_after FROM asg GROUP BY 1)
       |SELECT CAST(af.node AS BIGINT) AS node,
       |  COALESCE(b.keys_before, 0) AS keys_before, af.keys_after,
       |  mv.n_keys, mv.n_moved,
       |  CAST(mv.n_moved * 1000000 // mv.n_keys AS BIGINT) AS moved_ppm
       |FROM af LEFT JOIN b ON b.node = af.node, mv
       |ORDER BY node""".stripMargin
      .replace("__VN8__", vn(RingNodes))
      .replace("__VN9__", vn(RingNodes + 1))
  }

  // ------------------------------------------------------------- q278

  private val NeymanTotal = 10000L

  private def qNeyman(s: SparkSession, dir: String): DataFrame = {
    val m = load(s, dir, "orders")
      .select(col("o_orderpriority").as("stratum"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("nh"),
        sum(col("x").cast(DecimalType(38, 0))).as("s1"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("s2"))
      // integer variance floor: (N*S2 - S1^2) div N^2, DECIMAL(38,0)
      .withColumn("var2", expr(
        "CAST((nh * s2 - s1 * s1) div (nh * nh) AS DECIMAL(38,0))"))
      // corrected floor-sqrt (q162's device) via the native expression
      .withColumn("sd",
        graft.functions.IntegerSqrt(expr("CAST(var2 AS BIGINT)")))
      .withColumn("w", expr("nh * sd"))
    val tot = m.agg(sum(col("w")).as("wt"))
    val quota = m.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"$NeymanTotal * w div wt"))
      .withColumn("rem", expr(s"($NeymanTotal * w) % wt"))
    val base = quota.agg(sum(col("base")).as("sb"))
    val ranked = quota.crossJoin(broadcast(base))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("alloc", expr(
        s"base + CASE WHEN rk <= $NeymanTotal - sb THEN 1 ELSE 0 END"))
    ranked.select(col("stratum"), col("nh"), col("sd"),
        col("alloc").cast(LongType).as("alloc"))
      .orderBy(col("stratum"))
  }

  private val qNeymanSql =
    s"""WITH m0 AS (
       |  SELECT o_orderpriority AS stratum,
       |    CAST(COUNT(*) AS BIGINT) AS nh,
       |    SUM(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
       |      AS HUGEINT)) AS s1,
       |    SUM(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
       |      AS HUGEINT) * CAST(floor(o_totalprice * 100.0 + 0.5)
       |      AS BIGINT)) AS s2
       |  FROM orders GROUP BY 1),
       |v AS (SELECT stratum, nh,
       |        (nh * s2 - s1 * s1) // (nh * nh) AS var2 FROM m0),
       |s0 AS (SELECT stratum, nh, var2,
       |         CAST(floor(sqrt(CAST(var2 AS DOUBLE))) AS BIGINT) AS s
       |       FROM v),
       |s1f AS (SELECT stratum, nh, var2,
       |         s - CASE WHEN s > 0 AND s * s > var2 THEN 1 ELSE 0 END
       |           AS s
       |        FROM s0),
       |sd AS (SELECT stratum, nh,
       |         s + CASE WHEN s < 3037000499 AND
       |           (s + 1) * (s + 1) <= var2 THEN 1 ELSE 0 END AS sd
       |       FROM s1f),
       |w AS (SELECT stratum, nh, sd,
       |        CAST(nh AS HUGEINT) * sd AS w FROM sd),
       |t AS (SELECT SUM(w) AS wt FROM w),
       |q AS (SELECT stratum, nh, sd,
       |        $NeymanTotal * w // t.wt AS base,
       |        ($NeymanTotal * w) % t.wt AS rem
       |      FROM w, t),
       |b AS (SELECT SUM(base) AS sb FROM q),
       |r AS (SELECT q.*, b.sb,
       |        row_number() OVER (ORDER BY rem DESC, stratum) AS rk
       |      FROM q, b)
       |SELECT stratum, nh, CAST(sd AS BIGINT) AS sd,
       |  CAST(base + CASE WHEN rk <= $NeymanTotal - sb THEN 1 ELSE 0
       |    END AS BIGINT) AS alloc
       |FROM r ORDER BY stratum""".stripMargin

  // ------------------------------------------------------------- q279

  /** Candidate allowed-lateness values (micros): 0, 1 s, 5 s, 30 s,
    * 60 s, 300 s. */
  private val Delays = Seq(0L, 1000000L, 5000000L, 30000000L,
    60000000L, 300000000L)
  private val TargetPpm = 999000L

  private def qWatermarkPlanner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("seen_max", max(col("us")).over(w))
      .select(greatest(col("seen_max") - col("us"), lit(0L))
        .as("lateness_us"))
    val delays = Delays.toDF("delay_us")
    val priced = late.crossJoin(broadcast(delays)) // 6-row plan table
      .groupBy(col("delay_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("lateness_us") <= col("delay_us"), 1L)
          .otherwise(0L)).as("n_on_time"))
      .withColumn("completeness_ppm",
        expr("n_on_time * 1000000 div n_events"))
    // the minimal candidate meeting the completeness target
    val minOk = priced.filter(col("completeness_ppm") >= TargetPpm)
      .agg(coalesce(min(col("delay_us")), lit(-1L)).as("min_ok"))
    priced.crossJoin(broadcast(minOk)) // one-row scalar
      .select(col("delay_us"), col("n_events"), col("n_on_time"),
        col("completeness_ppm"),
        (col("delay_us") === col("min_ok")).as("recommended"))
      .orderBy(col("delay_us"))
  }

  private val qWatermarkPlannerSql = {
    val delays = Delays.mkString("(", "), (", ")")
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       |l AS (
       |  SELECT GREATEST(MAX(us) OVER (PARTITION BY user_id
       |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
       |      CURRENT ROW) - us, 0) AS lateness_us
       |  FROM e),
       |d AS (SELECT * FROM (VALUES $delays) t(delay_us)),
       |p AS (
       |  SELECT delay_us, CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(CASE WHEN lateness_us <= delay_us THEN 1 ELSE 0
       |      END) AS BIGINT) AS n_on_time
       |  FROM l, d GROUP BY 1),
       |pp AS (SELECT *, CAST(n_on_time * 1000000 // n_events AS BIGINT)
       |         AS completeness_ppm FROM p),
       |mo AS (SELECT COALESCE(MIN(CASE WHEN completeness_ppm >=
       |         $TargetPpm THEN delay_us END), -1) AS min_ok FROM pp)
       |SELECT CAST(pp.delay_us AS BIGINT) AS delay_us, n_events,
       |  n_on_time, completeness_ppm,
       |  pp.delay_us = mo.min_ok AS recommended
       |FROM pp, mo ORDER BY delay_us""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q277_hash_ring" -> QueryDef(qHashRing, Some(qHashRingSql),
      "consistent-hash ring audit: 8x16-vnode md5 ring, successor " +
        "assignment via a codegen'd literal-array probe (no theta " +
        "join), balance per node and moved-key fraction when a ninth " +
        "node joins"),
    "q278_neyman_allocation" -> QueryDef(qNeyman, Some(qNeymanSql),
      "Neyman stratified-sample allocation in exact integers: " +
        "DECIMAL(38,0) moments, corrected-floor isqrt sigma, " +
        "largest-remainder apportionment summing to n exactly"),
    "q279_watermark_planner" -> QueryDef(qWatermarkPlanner,
      Some(qWatermarkPlannerSql),
      "watermark-delay planner: per-entity event-time lateness vs a " +
        "bounded candidate-delay table; completeness ppm per delay " +
        "and the minimal candidate meeting 99.9%"))
}
