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

  val defs: Seq[(String, QueryDef)] = Seq(
    "q315_analyzed_join" -> QueryDef(qAnalyzedJoin,
      Some(qAnalyzedJoinSql),
      "stats-driven join through the USER API: the q295 equi-depth " +
        "histogram estimate selects broadcast vs shuffle for the " +
        "filtered fact side (both branches exercised); estimate and " +
        "decision hash-gated, executed plan pinned by AnalyzedJoinSpec"))
}
