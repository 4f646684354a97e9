package graft

import graft.ops.StatsPlanner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q317's plan gate (round-12 verdict ask #1): the MCV-driven
  * skew-salted join must actually SPLIT the plan — hot keys spread
  * over every salt, cold keys ride salt 0 with zero replication, the
  * join is keyed on (key, salt) — and the salting must be invisible
  * in the result. The hot-key DETECTION itself is oracle-gated by
  * q317; this spec pins the physical treatment. */
class SkewedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val Salts = 8

  private def ev = Tables.load(spark, dir, "events").select(
    expr("CASE WHEN event_type = 'error' THEN 1 ELSE user_id END")
      .as("uid"),
    col("event_id"))
  private def cust = Tables.load(spark, dir, "customer")
    .select(col("c_custkey"), col("c_nationkey"))

  test("MCVs detect exactly the sentinel account as hot") {
    val stats = StatsPlanner.exportStats(ev, "uid")
    val (n, mcv) = StatsPlanner.mcvFromStats(stats, "uid")
    assert(n == ev.count())
    val hot = mcv.filter(_.n > n / 10L).map(_.v)
    assert(hot == Seq(1L), s"mcv=$mcv n=$n")
    // and the threshold is doing real work: the next-most-common key
    // is far below it (no near-miss flakiness in the gate)
    val cold = mcv.filter(_.v != 1L)
    assert(cold.nonEmpty && cold.forall(_.n < n / 50L),
      s"cold MCVs should be way under threshold: $cold")
  }

  test("hot keys take the salted path, cold keys the plain path") {
    val hot = Seq(1L)
    val (p, b) = StatsPlanner.saltedSides(ev, "uid", cust, "c_custkey",
      col("event_id"), hot, Salts)
    // hot probe rows spread across ALL salts; cold rows all on salt 0
    val hotSalts = p.filter(col("uid") === 1L).select(col("__salt"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(hotSalts == (0 until Salts),
      s"hot rows must draw every salt, got $hotSalts")
    assert(p.filter(col("uid") =!= 1L && col("__salt") =!= 0).isEmpty,
      "cold probe rows must all ride salt 0")
    // build side replicates ONLY under hot keys
    val nBuild = cust.count()
    assert(b.count() == nBuild + (Salts - 1),
      "exactly the one hot build row replicates across the salts")
    assert(b.filter(col("c_custkey") =!= 1L && col("__salt") =!= 0)
      .isEmpty, "cold build rows must not replicate")
  }

  test("salting is invisible: result == plain join, join keyed on (key, salt)") {
    val stats = StatsPlanner.exportStats(ev, "uid")
    val (joined, hot) = StatsPlanner.skewedJoinFromStats(ev, "uid",
      cust, "c_custkey", col("event_id"), stats, "uid")
    assert(hot == Seq(1L))
    val plain = ev.join(cust, col("uid") === col("c_custkey"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(agg(joined) == agg(plain), "salting changed the result")
    // the executed join really is on (key, salt): the salt column
    // appears in the physical join keys, so the hot key's rows land
    // in `Salts` distinct reducer partitions instead of one
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("__salt"), phys)
  }

  test("no hot keys -> plain equi-join, no salt column in the plan") {
    // a uniform key column: every MCV is ~1/150th of the table
    val uni = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"))
    val stats = StatsPlanner.exportStats(uni, "user_id")
    val (joined, hot) = StatsPlanner.skewedJoinFromStats(uni, "user_id",
      cust, "c_custkey", col("event_id"), stats, "user_id")
    assert(hot.isEmpty)
    assert(!joined.queryExecution.executedPlan.toString
      .contains("__salt"))
    assert(joined.count() ==
      uni.join(cust, col("user_id") === col("c_custkey")).count())
  }
}
