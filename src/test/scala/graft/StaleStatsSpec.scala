package graft

import graft.ops.StatsPlanner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q321's plan gate (round-11 CBO triad, leg (c)): the staleness
  * guard must leave a fresh catalog untouched, refresh a drifted one
  * from ONLY the delta slice, and the refreshed decision must reach
  * the EXECUTED plan — the stale catalog's under-provisioned
  * broadcast becomes a sort-merge join. Drift arithmetic and both
  * decisions are oracle-gated by q321; this spec pins the physical
  * plans. */
class StaleStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val T = 3459L

  private def ev = Tables.load(spark, dir, "events").select(
    col("user_id").as("uid"),
    expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"),
    col("event_id").as("eid"))
  private def sliceA = ev.filter(pmod(col("eid"), lit(3)) =!= 0)
  private def delta = ev.filter(pmod(col("eid"), lit(3)) === 0)
  private def cust = Tables.load(spark, dir, "customer")
    .select(col("c_custkey"), col("c_nationkey"))

  test("fresh catalog passes the guard untouched") {
    val stats = StatsPlanner.exportStats(ev, "vc")
    val (used, st) = StatsPlanner.refreshIfStale(stats, "vc", ev, delta)
    assert(!st.stale && st.driftPpm == 0L, st.toString)
    assert(used eq stats, "fresh stats must be returned as-is")
  }

  test("20%+ drift triggers the incremental refresh; merged n == live count") {
    val stats = StatsPlanner.exportStats(sliceA, "vc")
    val (used, st) = StatsPlanner.refreshIfStale(stats, "vc", ev, delta)
    assert(st.stale, st.toString)
    // ~1/3 of rows arrived since the catalog epoch: drift ≈ 1/2 of
    // the catalog count ≈ 500000 ppm (the mod-3 split is off-by-a-few
    // at any SF, so the band is loose; the EXACT value is q321's
    // oracle-gated output)
    assert(st.driftPpm > 450000L && st.driftPpm < 550000L, st.toString)
    assert(StatsPlanner.fromStatsTable(used, "vc").n == st.nActual)
  }

  test("the refreshed decision reaches the executed plan (broadcast -> sort-merge)") {
    val stats = StatsPlanner.exportStats(sliceA, "vc")
    val estA = StatsPlanner.fromStatsTable(stats, "vc").estimateGt(T)
    val cap = 5L * estA / 4L
    // the WRONG plan the stale catalog would run: under-provisioned
    // broadcast of a side half-again the size the catalog believes
    val (jStale, eStale, dStale) = StatsPlanner.analyzedJoinFromStats(
      ev, "vc", T, cust, col("uid") === col("c_custkey"), stats, "vc",
      broadcastDiv = 1L, maxBroadcastRows = cap)
    assert(dStale == "broadcast" && eStale == estA)
    assert(jStale.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // the guarded plan: refresh from the delta, re-estimate, shuffle
    val (used, st) = StatsPlanner.refreshIfStale(stats, "vc", ev, delta)
    assert(st.stale)
    val (jFresh, eFresh, dFresh) = StatsPlanner.analyzedJoinFromStats(
      ev, "vc", T, cust, col("uid") === col("c_custkey"), used, "vc",
      broadcastDiv = 1L, maxBroadcastRows = cap)
    assert(dFresh == "shuffle" && eFresh > cap,
      s"est=$eFresh cap=$cap")
    val phys = jFresh.queryExecution.executedPlan.toString
    assert(phys.contains("SortMergeJoin") &&
      !phys.contains("BroadcastHashJoin"), phys)
    // and the two plans agree on the result (the guard changes the
    // physical strategy, never the semantics)
    assert(jStale.count() == jFresh.count())
  }
}
