package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus sweep for the experimentation waves 15–17
  * (q219–q224): every query must survive the shapes a live experiment
  * platform actually feeds it — an EMPTY event feed (day zero, before
  * traffic) and a SINGLE-GROUP feed (one user, one day, one type) —
  * without crashing, and with the structurally right answer (no rows,
  * or one well-defined degenerate row). Same discipline
  * StatsPropertySpec applies to waves 7/8; the q179 lesson (round-6
  * ADVICE: a driver-side divide-by-zero ONLY an empty slice could
  * reach) is why these edges get their own gate. */
class ExperimentEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val waveQueries = Seq("q219_p_chart", "q220_jackknife_se",
    "q221_cuped", "q222_srm_check", "q223_ratio_delta_ci",
    "q224_mde_planner")

  private def eventsDir(rows: Seq[(Long, Long, String, Double, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_xedge_").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  private def run(name: String, dir: String): DataFrame =
    Registry.queries(name)(spark, dir)

  test("every experimentation query survives an EMPTY event feed") {
    val dir = eventsDir(Seq.empty)
    for (q <- waveQueries) {
      val out = run(q, dir)
      val n = out.count() // the crash, if any, happens here
      assert(n >= 0, s"$q: unreachable")
      // an empty feed must never fabricate per-segment statistics rows
      // with nonsense denominators; zero rows is the only honest answer
      assert(n == 0, s"$q produced $n rows from zero events:\n" +
        out.collect().mkString("\n"))
    }
  }

  test("every experimentation query survives a SINGLE user-day-type feed") {
    val dir = eventsDir(Seq((1L, 42L, "purchase", 3.5, 86400L * 1000000L)))
    for (q <- waveQueries) {
      val out = run(q, dir)
      val rows = out.collect() // must not throw
      // single group: at most a handful of degenerate report rows, and
      // no NULL-only garbage columns in whatever is emitted
      assert(rows.length <= 16, s"$q exploded on one event: ${rows.length} rows")
    }
  }

  test("single-arm feeds (every user in ONE bucket) don't crash the A/B queries") {
    // hash-bucketing puts all of one user's events in one arm; with a
    // single user the control-vs-treatment split is maximally lopsided
    val rows = (0 until 20).map(i =>
      (i.toLong, 42L, if (i % 2 == 0) "view" else "purchase",
        1.0 + i, 86400L * 1000000L * (1 + i / 4)))
    val dir = eventsDir(rows)
    for (q <- waveQueries) {
      val out = run(q, dir).collect()
      assert(out.length <= 64, s"$q: unexpected blow-up")
    }
  }
}
