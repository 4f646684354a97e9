package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming form of the T8 windows: event-time tumbling aggregation
  * under a watermark in APPEND mode — a window is emitted exactly once,
  * only after the watermark passes its end, and late rows beyond the
  * watermark are dropped. (The batch twins are gate queries q23/q29;
  * this pins the streaming-specific semantics.) Two separate
  * AvailableNow runs over one checkpoint make the arrival order
  * deterministic — the watermark persists in the checkpoint between
  * runs, exactly as it would across micro-batches on a cluster.
  */
class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val base = 1700000000000L
  private def winStart(ts: Long): Long = ts / 600000 * 600000

  private def runOnce(tmp: String): Unit = {
    val schema = StructType(Seq(StructField("ts", LongType),
      StructField("k", StringType), StructField("v", LongType)))
    val q = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(s"$tmp/in")
      .select(from_json(col("value"), schema).as("e"))
      .select(timestamp_millis(col("e.ts")).as("ts"),
        col("e.k").as("k"), col("e.v").as("v"))
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(sum(col("v")).as("total"))
      .select(col("window.start").as("w"), col("k"), col("total"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("watermarked tumbling window emits closed windows once, drops late data") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wm_").toString
    def line(offMin: Long, v: Long) =
      s"""{"ts":${base + offMin * 60000},"k":"a","v":$v}"""

    // run 1: minutes 0 and 1, plus a head at minute 30 that advances the
    // watermark to minute 25 — the minute-0 window closes
    Seq(line(0, 1), line(1, 2), line(30, 10))
      .toDF("value").coalesce(1).write.text(s"$tmp/in")
    runOnce(tmp)

    // run 2: a LATE row for minute 0 (beyond the persisted watermark —
    // must be dropped) plus a head at minute 60 (closes minute-30)
    Seq(line(0, 100), line(60, 5))
      .toDF("value").coalesce(1).write.mode("append").text(s"$tmp/in")
    runOnce(tmp)

    val rows = spark.read.parquet(s"$tmp/out")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(2))).toMap
    // the minute-0 window closed with ONLY the on-time rows; the late
    // v=100 arrived after the watermark passed and was dropped
    assert(rows.get(winStart(base)) == Some(3L),
      s"window@0 must total 3 (late row dropped), got $rows")
    // the minute-30 window closed in run 2
    assert(rows.get(winStart(base + 30 * 60000)) == Some(10L))
    // the newest window (minute 60) is still open — not emitted yet
    assert(!rows.contains(winStart(base + 60 * 60000)))
  }
}
