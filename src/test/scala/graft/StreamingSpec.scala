package graft

import graft.model.{ChangeEvent, Op}
import graft.state.FileStateFSM
import graft.streaming.ChangeStreamPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jsonLine(tx: Long, op: String, path: String, cents: Long) =
    s"""{"txId":$tx,"op":"$op","path":"$path","mode":"New","sizeCents":$cents,"ts":0,"srcPath":"","blockId":-1,"startOffset":-1,"endOffset":-1}"""

  test("multi-batch streaming replay converges to batch replay") {
    implicit val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_conv_").toString
    // three chunks arriving as separate files → separate micro-batches,
    // with a duplicate tx re-delivered in chunk 3 (at-least-once input)
    val chunks = Seq(
      Seq(jsonLine(1, Op.AddFile, "/a", 0), jsonLine(2, Op.AppendFile, "/a", 100),
        jsonLine(1, Op.AddFile, "/b", 0)),
      Seq(jsonLine(3, Op.AppendFile, "/a", 50), jsonLine(2, Op.AppendFile, "/b", 70)),
      Seq(jsonLine(2, Op.AppendFile, "/a", 100), // duplicate: must be dropped
        jsonLine(4, Op.CloseFile, "/a", 0), jsonLine(3, Op.DeleteFile, "/b", 0)))
    chunks.zipWithIndex.foreach { case (lines, i) =>
      val p = java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/in_f$i.txt"),
        lines.mkString("\n").getBytes)
      // the file source orders batches by modification time — give the
      // chunks strictly increasing mtimes (in-order delivery, which a
      // Kafka per-entity partition guarantees; out-of-order arrival is
      // dropped by the FSM's duplicate guard by design)
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val q = ChangeStreamPipeline.start(tmp, s"$tmp/chk", "conv_test",
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("lastTxId").desc, col("nOps").desc)
    val streamed = spark.table("conv_test")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn").as[graft.model.FileState].collect()
      .map(st => st.path -> st).toMap

    val batchEvents = chunks.flatten.map { l =>
      val j = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .readTree(l)
      ChangeEvent(j.get("txId").asLong, j.get("op").asText,
        j.get("path").asText, sizeCents = j.get("sizeCents").asLong)
    }
    val batch = batchEvents.groupBy(_.path).map { case (p, evs) =>
      p -> FileStateFSM.replay(p, evs.iterator)
    }
    assert(streamed == batch)
    assert(streamed("/a").dataSizeCents == 150) // duplicate dropped
    assert(streamed("/b").state == graft.model.FileLifecycle.Deleted)
  }

  test("streaming dedup: re-delivered keys emit nothing on a second run") {
    implicit val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_sd_").toString
    def keyLine(uid: Long, et: String, ts: Long) =
      s"""{"user_id":$uid,"event_type":"$et","ts":$ts}"""
    val lines = Seq(keyLine(1, "click", 1000), keyLine(2, "click", 2000),
      keyLine(1, "click", 3000), keyLine(1, "view", 4000))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/in/a.txt"),
      lines.mkString("\n").getBytes)
    ChangeStreamPipeline.startDedup(s"$tmp/in", s"$tmp/out", s"$tmp/chk",
      statePartitions = Some(2)).awaitTermination()
    val first = spark.read.parquet(s"$tmp/out").collect().map(_.toSeq).toSet
    assert(first == Set(Seq(1L, "click"), Seq(2L, "click"), Seq(1L, "view")))
    // at-least-once upstream: the same keys arrive again in NEW files;
    // the keyed state (still live under the infinite watermark delay)
    // must swallow every one of them
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/in/b.txt"),
      lines.mkString("\n").getBytes)
    ChangeStreamPipeline.startDedup(s"$tmp/in", s"$tmp/out", s"$tmp/chk",
      statePartitions = Some(2)).awaitTermination()
    val second = spark.read.parquet(s"$tmp/out").collect()
    assert(second.length == 3) // nothing re-emitted
  }

  test("decode routes malformed lines to Error events instead of crashing") {
    implicit val s = spark
    import s.implicits._
    val raw = Seq(jsonLine(1, Op.AddFile, "/x", 0), "{not json!!").toDF("value")
    val evs = ChangeStreamPipeline.decode(raw).collect()
    assert(evs.length == 2)
    assert(evs.count(_.op == Op.AddFile) == 1)
    assert(evs.count(e => e.op == "Error" && e.txId == -1L) == 1)
  }

  test("event-time windowed agg with watermark: append emits only finalized windows") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wm_").toString
    val rows = (0 until 100).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 ${i / 10}:0${i % 10}:00"), 1.0)
    }
    rows.toDF("ts", "v").write.parquet(s"$tmp/in")
    val q = spark.readStream
      .schema("ts timestamp, v double")
      .parquet(s"$tmp/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_test")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val emitted = spark.table("wm_test").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // batch truth: 2h windows of 20 events each; max ts = 09:59, watermark
    // 08:59 → windows ending ≤ 08:59 are final: [0,2) [2,4) [4,6) [6,8)
    assert(emitted.values.forall(_ == 20))
    assert(emitted.keySet == Set(
      "2024-01-01 00:00:00.0", "2024-01-01 02:00:00.0",
      "2024-01-01 04:00:00.0", "2024-01-01 06:00:00.0"))
  }

  test("kafka record projection: entity key + headers") {
    implicit val s = spark
    import s.implicits._
    val df = Seq((1L, "AddFile", "/a", "New", "d1", "MOVIES"))
      .toDF("txId", "op", "path", "mode", "domain", "entity")
    val rec = ChangeStreamPipeline.toKafkaRecords(df, "ns").collect().head
    assert(rec.getString(0) == "d1::MOVIES")
    assert(rec.getString(1).contains("\"op\":\"AddFile\""))
  }
}
