package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-sized gate for the soak harness (the 15-minute record lives in
  * SOAK_r11.json / BASELINE.md; this proves the harness end to end on
  * every test run): a short ProcessingTime window with live injection
  * must drain completely and the streamed end-state must converge to
  * the batch replay of the injected log with ZERO mismatches. */
class SoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("short soak: ProcessingTime pipeline drains and converges to batch") {
    val report = Soak.run(spark, durationSec = 20, ratePerSec = 500,
      keys = 500, trigger = "1 second")
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(report).get.group(1).toLong
    assert(long("events_injected") > 0, report)
    assert(long("events_processed") == long("events_injected"), report)
    assert(long("convergence_mismatches") == 0L, report)
    assert(long("streamed_keys") == 500L, report)
    assert(long("n_batches") > 1, report) // genuinely incremental
  }

  test("wide-keyspace soak: keyspace larger than any batch, still converges") {
    // test-scale stand-in for the 1M-key ladder (SOAK_keyscale_r13
    // .json): 50k distinct keys against ~60k events, so almost every
    // state-store access is a NEW key (the 100M-file-namespace shape)
    // rather than an update of a hot one
    val report = Soak.run(spark, durationSec = 20, ratePerSec = 3000,
      keys = 50000, trigger = "1 second")
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(report).get.group(1).toLong
    assert(long("events_injected") > 0, report)
    assert(long("events_processed") == long("events_injected"), report)
    assert(long("convergence_mismatches") == 0L, report)
    // ~60k uniform draws over 50k keys: ≥65% coverage whp — the spec
    // gates that the wide keyspace was actually exercised
    assert(long("streamed_keys") > 30000L, report)
  }

  test("crash soak: planted mid-batch kill, restart from checkpoint, converge") {
    // batch 2 writes HALF its rows then dies (offsets WAL'd, batch
    // uncommitted); the harness restarts from the same checkpoint while
    // injection continues. The gate: the recovered stream reprocesses
    // the failed batch from the recovered state version and the final
    // per-key FSM state still equals the batch replay — zero mismatches
    // despite the orphan half-write. This is the kill-not-stop leg of
    // T6 that StreamResumeSpec's graceful stop can't exercise.
    val report = Soak.run(spark, durationSec = 15, ratePerSec = 500,
      keys = 400, trigger = "1 second", crashAfterBatches = 2)
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(report).get.group(1).toLong
    assert(long("forced_recoveries") >= 1L, report)
    assert(long("events_injected") > 0, report)
    assert(long("events_processed") == long("events_injected"), report)
    assert(long("convergence_mismatches") == 0L, report)
    assert(long("streamed_keys") == 400L, report)
  }
}
