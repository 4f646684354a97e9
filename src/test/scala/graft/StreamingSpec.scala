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

  test("decode routes malformed lines to Error events instead of crashing") {
    implicit val s = spark
    import s.implicits._
    val raw = Seq(jsonLine(1, Op.AddFile, "/x", 0), "{not json!!").toDF("value")
    val evs = ChangeStreamPipeline.decode(raw).collect()
    assert(evs.length == 2)
    assert(evs.count(_.op == Op.AddFile) == 1)
    assert(evs.count(e => e.op == "Error" && e.txId == -1L) == 1)
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
