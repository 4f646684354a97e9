package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming heartbeat/metrics sink (SURVEY §2.10 T10; ref
  * `agent/common/HeartbeatThread.java:1-41`,
  * `agent/model/NameNodeAgentState.java`): the reference writes a
  * heartbeat znode per agent tick; here a `StreamingQueryListener`
  * captures every micro-batch's progress into a queryable metrics table
  * — push-based (no polling thread), one row per batch per query.
  *
  * Rows accumulate in a bounded in-memory journal (listener callbacks
  * must never block the streaming thread on I/O) and are exposed as a
  * DataFrame via [[metricsTable]]; callers persist with an ordinary
  * `.write` wherever their metrics land (the znode analog is just
  * another table).
  */
object MetricsListener {
  /** One micro-batch heartbeat (top-level so Spark can derive an
    * encoder for the metrics table). */
  final case class Beat(
      queryName: String,
      queryId: String,
      batchId: Long,
      timestamp: String,
      numInputRows: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      batchDurationMs: Long,
      event: String)
}

final class MetricsListener(maxRows: Int = 10000)
    extends StreamingQueryListener {
  import MetricsListener.Beat

  private val journal =
    new java.util.concurrent.ConcurrentLinkedQueue[Beat]()
  // ConcurrentLinkedQueue.size() is O(n); track it separately so the
  // bound check stays O(1) on the listener-bus thread
  private val nRows = new java.util.concurrent.atomic.AtomicInteger(0)

  private def add(b: Beat): Unit = {
    journal.add(b)
    var n = nRows.incrementAndGet()
    while (n > maxRows) { // bounded: drop oldest
      if (journal.poll() != null) n = nRows.decrementAndGet()
      else n = nRows.get()
    }
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    add(Beat(Option(e.name).getOrElse(""), e.id.toString, -1L,
      e.timestamp, 0L, 0.0, 0.0, 0L, "started"))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    add(Beat(Option(p.name).getOrElse(""), p.id.toString, p.batchId,
      p.timestamp, p.numInputRows,
      orZero(p.inputRowsPerSecond), orZero(p.processedRowsPerSecond),
      Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L),
      "progress"))
  }

  override def onQueryIdle(e: QueryIdleEvent): Unit =
    add(Beat("", e.id.toString, -1L, e.timestamp, 0L, 0.0, 0.0, 0L, "idle"))

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    add(Beat("", e.id.toString, -1L, "", 0L, 0.0, 0.0, 0L,
      e.exception.map(x => s"terminated: $x").getOrElse("terminated")))

  private def orZero(d: Double): Double = if (d.isNaN) 0.0 else d

  def beats: Seq[Beat] = {
    import scala.jdk.CollectionConverters._
    journal.iterator().asScala.toSeq
  }

  /** The heartbeat journal as a queryable table. */
  def metricsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    beats.toDF()
  }
}
