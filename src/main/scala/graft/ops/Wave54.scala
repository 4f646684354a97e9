package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Fifty-fourth wave (round 12): the CBO loop APPLIED — q314 audited
  * the broadcast-vs-shuffle decision the q295 histogram stats imply;
  * this wave's q315 runs the SAME join through [[StatsPlanner
  * .analyzedJoin]], where the histogram estimate actually selects the
  * physical strategy (broadcast the filtered fact vs pin a sort-merge
  * shuffle). Two steps exercise BOTH branches:
  *
  *  - `hi_tail` (value > $245.00): the exponential tail — the
  *    histogram estimate lands under the 5% broadcast budget, the
  *    fact side is broadcast (q314 showed uniformity stats mis-plan
  *    exactly this step ~80×);
  *  - `lo_bulk` (value > $10.00): most of the table survives — the
  *    estimate exceeds the budget and the join is pinned to the
  *    shuffle path (the only safe shape at 100 TB).
  *
  * The gate hash-matches the per-nation aggregate of the joined rows
  * (plan-independent — correctness of the API path), the histogram
  * estimate, AND the decision string (the oracle recomputes the same
  * integer bucket arithmetic), while AnalyzedJoinSpec pins that the
  * EXECUTED physical plan matches the decision (BroadcastHashJoin vs
  * SortMergeJoin) and that each decision equals the optimal-from-exact
  * choice. Scale shape: the ANALYZE is one keyed aggregate + one
  * Ranks prefix-scan; only the 32-row histogram reaches the driver;
  * the joins are keyed equi-joins. */
object Wave54 {

  private val B = 32
  private val THi = 24500L // tail: histogram → broadcast
  private val TLo = 1000L // bulk: histogram → shuffle
  private val BcastDiv = 20L // broadcast if est <= n/20 (5%)...
  private val BcastCap = 5000000L // ...AND under the absolute row cap

  private def qAnalyzedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(col("user_id"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    def step(name: String, t: Long): DataFrame = {
      val (joined, est, plan) = StatsPlanner.analyzedJoin(
        ev, "vc", t, cust, col("user_id") === col("c_custkey"),
        broadcastDiv = BcastDiv, numBuckets = B,
        maxBroadcastRows = BcastCap)
      joined
        .groupBy(col("c_nationkey").cast(LongType).as("nation"))
        .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_vc"))
        .withColumn("step", lit(name))
        .withColumn("est_rows", lit(est))
        .withColumn("plan_chosen", lit(plan))
    }
    step("hi_tail", THi).unionByName(step("lo_bulk", TLo))
      .select(col("step"), col("nation"), col("n_events"), col("sum_vc"),
        col("est_rows"), col("plan_chosen"))
      .orderBy(col("step"), col("nation"))
  }

  private val qAnalyzedJoinSql =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
       |  FROM events),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
       |bv AS MATERIALIZED (
       |  SELECT vc AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
       |  GROUP BY 1),
       |r AS (
       |  SELECT v, cnt,
       |    CAST(SUM(cnt) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM bv),
       |hist AS MATERIALIZED (
       |  SELECT MIN(v) AS lo, MAX(v) AS hi,
       |    CAST(SUM(LEAST(cum, (b + 1) * n.n // $B) -
       |      GREATEST(cum - cnt, b * n.n // $B)) AS BIGINT) AS nb
       |  FROM r, n, range(0, $B) t(b)
       |  WHERE cum > b * n.n // $B AND cum - cnt < (b + 1) * n.n // $B
       |  GROUP BY b),
       |steps(step, t) AS (
       |  SELECT * FROM (VALUES ('hi_tail', $THi), ('lo_bulk', $TLo))),
       |est AS (
       |  SELECT step, t,
       |    CAST(SUM(CASE WHEN lo > t THEN nb
       |      WHEN hi > t THEN nb * (hi - t) // GREATEST(hi - lo, 1)
       |      ELSE 0 END) AS BIGINT) AS est_rows
       |  FROM steps, hist GROUP BY 1, 2),
       |plan AS MATERIALIZED (
       |  SELECT step, t, est_rows,
       |    CASE WHEN est_rows <= LEAST((SELECT n // $BcastDiv FROM n),
       |        $BcastCap)
       |      THEN 'broadcast' ELSE 'shuffle' END AS plan_chosen
       |  FROM est),
       |agg AS (
       |  SELECT p.step, CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(vc) AS BIGINT) AS sum_vc
       |  FROM plan p JOIN ev ON vc > p.t
       |    JOIN customer ON user_id = c_custkey
       |  GROUP BY 1, 2)
       |SELECT a.step, nation, n_events, sum_vc, est_rows, plan_chosen
       |FROM agg a JOIN plan USING (step)
       |ORDER BY step, nation""".stripMargin

  // ------------------------------------------------------------- q316

  private val MBits = 8 // 8 bits/dim: 24-bit 3-D Morton key
  private val MCellShift = 4096L // key div 2^12 -> 4-bit/dim octree cells

  /** 3-D Morton layout audit: the EXACT scaling + interleave arithmetic
    * `Graft.writeClusteredLayout` clusters on for N>2 (single authority
    * `functions.Morton`), hash-gated against DuckDB — the N-dim
    * analogue of q128's 2-D Z-order gate. Each dim is scaled to the
    * 8-bit grid with the writer's formula, the 24-bit key is cut into
    * 4-bit-per-dim octree cells (key div 4096), and each cell reports
    * its row count and per-dim scaled bounds — which PROVE locality:
    * every cell's span is confined to its 16×16×16 box, exactly the
    * property zone-map pruning buys skipping from. One scan + one
    * bounded (≤4096-row) aggregate; the bounds scalars are a one-row
    * broadcast. */
  private def qMorton3Cells(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(col("event_id"),
      col("user_id"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
    val side = (1L << MBits) - 1
    val mm = ev.agg(
      min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
      min(col("vc")).as("mnv"), max(col("vc")).as("mxv"),
      min(col("event_id")).as("mne"), max(col("event_id")).as("mxe"))
    val scaled = ev.crossJoin(broadcast(mm)) // one-row bounds scalar
      .withColumn("sx", expr(
        s"(user_id - mnu) * $side div greatest(mxu - mnu, 1)"))
      .withColumn("sy", expr(
        s"(vc - mnv) * $side div greatest(mxv - mnv, 1)"))
      .withColumn("sz", expr(
        s"(event_id - mne) * $side div greatest(mxe - mne, 1)"))
    scaled
      .withColumn("mkey", graft.functions.Morton.key(
        Seq(col("sx"), col("sy"), col("sz")), MBits))
      .withColumn("cell", expr(s"mkey div $MCellShift"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("sx")).as("sx_min"), max(col("sx")).as("sx_max"),
        min(col("sy")).as("sy_min"), max(col("sy")).as("sy_max"),
        min(col("sz")).as("sz_min"), max(col("sz")).as("sz_max"))
      .orderBy(col("cell"))
  }

  private val qMorton3CellsSql = {
    val side = (1L << MBits) - 1
    val morton = graft.functions.Morton.sql(Seq("sx", "sy", "sz"), MBits)
    s"""WITH mm AS (
       |  SELECT MIN(user_id) AS mnu, MAX(user_id) AS mxu,
       |    MIN(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS mnv,
       |    MAX(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS mxv,
       |    MIN(event_id) AS mne, MAX(event_id) AS mxe
       |  FROM events),
       |scaled AS (
       |  SELECT
       |    (user_id - mnu) * $side // greatest(mxu - mnu, 1) AS sx,
       |    (CAST(floor(value * 100.0 + 0.5) AS BIGINT) - mnv) * $side
       |      // greatest(mxv - mnv, 1) AS sy,
       |    (event_id - mne) * $side // greatest(mxe - mne, 1) AS sz
       |  FROM events, mm),
       |keyed AS (SELECT sx, sy, sz, $morton AS mkey FROM scaled)
       |SELECT mkey // $MCellShift AS cell,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  MIN(sx) AS sx_min, MAX(sx) AS sx_max,
       |  MIN(sy) AS sy_min, MAX(sy) AS sy_max,
       |  MIN(sz) AS sz_min, MAX(sz) AS sz_max
       |FROM keyed GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q315_analyzed_join" -> QueryDef(qAnalyzedJoin,
      Some(qAnalyzedJoinSql),
      "stats-driven join through the USER API: the q295 equi-depth " +
        "histogram estimate selects broadcast vs shuffle for the " +
        "filtered fact side (both branches exercised); estimate and " +
        "decision hash-gated, executed plan pinned by AnalyzedJoinSpec"),
    "q316_morton3_cells" -> QueryDef(qMorton3Cells,
      Some(qMorton3CellsSql),
      "3-D Morton layout audit: writeClusteredLayout's N>2 scaling + " +
        "interleave arithmetic (single authority functions.Morton) " +
        "hash-gated; octree cells prove per-dim locality bounds"))
}
