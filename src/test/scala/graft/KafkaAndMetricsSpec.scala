package graft

import graft.streaming.{ChangeStreamPipeline, MetricsListener}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KafkaAndMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeEvents(dir: String, n: Int, files: Int): Unit = {
    import spark.implicits._
    (0 until n).map { i =>
      s"""{"txId":${i + 1},"op":"AppendFile","path":"/f${i % 7}","mode":"New","sizeCents":100,"ts":$i}"""
    }.toDF("value").repartition(files).write.mode("overwrite").text(dir)
  }

  test("metrics listener records one heartbeat row per micro-batch") {
    implicit val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_metrics_").toString
    writeEvents(s"$tmp/in", 40, files = 4)
    val listener = new MetricsListener()
    spark.streams.addListener(listener)
    try {
      // maxFilesPerTrigger=1 → 4 micro-batches
      val q = ChangeStreamPipeline.startFiles(
        s"$tmp/in", s"$tmp/out", s"$tmp/chk", maxFilesPerTrigger = Some(1))
      q.awaitTermination()
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def progress = listener.beats.filter(b =>
        b.event == "progress" && b.numInputRows > 0)
      while (progress.size < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(progress.size >= 4, s"expected >=4 batch heartbeats, got " +
        listener.beats.map(_.event).mkString(","))
      assert(progress.map(_.numInputRows).sum == 40L)
      assert(progress.forall(_.batchId >= 0))
      val table = listener.metricsTable(spark)
      assert(table.filter(col("event") === "progress").count() >= 4)
    } finally spark.streams.removeListener(listener)
  }

  test("writeTopic bounds records per output file (O3 budget)") {
    implicit val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_topic_").toString
    val events = (0 until 200).map(i =>
      (s"d::e${i % 3}", s"""{"txId":$i}""")).toDF("key", "value")
      .withColumn("domain", lit("d")).withColumn("entity", col("key"))
      .withColumn("mode", lit("New")).withColumn("txId", monotonically_increasing_id())
    val records = ChangeStreamPipeline.toKafkaRecords(events, "ns")
      .coalesce(1) // single task → file splitting is purely the budget's
    ChangeStreamPipeline.writeTopic(records, s"$tmp/t1", partitions = 1,
      maxRecordsPerFile = 25L)
    val files = new java.io.File(s"$tmp/t1/partition=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, // 200 rows / 25 per file
      s"expected >=8 bounded files, got ${files.length}")
    val back = spark.read.parquet(s"$tmp/t1")
    assert(back.count() == 200L)
  }

  test("kafka source/sink code paths reach the connector boundary (no jar in this env)") {
    implicit val s = spark
    import s.implicits._
    // Without spark-sql-kafka on the classpath the source must fail with
    // the canonical missing-data-source error AT PLAN CONSTRUCTION — the
    // documented swap-in point ('--packages org.apache.spark:
    // spark-sql-kafka-0-10_2.13:<ver>' makes the same call run
    // unchanged). Anything else (e.g. our own code throwing first) would
    // mean the plan shape is wrong.
    val srcErr = intercept[Exception] {
      ChangeStreamPipeline.startKafkaSource(
        "broker:9092", "graft-events", "/tmp/out", "/tmp/chk")
    }
    assert(srcErr.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure: ${srcErr.getMessage}")

    // sink needs a STREAMING frame to reach the connector: rate source
    val streamingEvents = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
      .selectExpr("value AS txId", "'AddFile' AS op", "'/f' AS path",
        "'New' AS mode", "'d' AS domain", "'e' AS entity")
    val sinkErr = intercept[Exception] {
      ChangeStreamPipeline.startKafkaSink(
        streamingEvents, "ns", "broker:9092", "graft-out", "/tmp/chk2")
    }
    assert(sinkErr.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure: ${sinkErr.getMessage}")
  }
}
