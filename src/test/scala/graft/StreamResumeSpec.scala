package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-resume for the streaming maintenance pattern (q72/q77):
  * a stopped stream restarted on the SAME checkpoint must continue
  * from the next unprocessed file — no reprocessing, no gaps — and the
  * maintained top-k state must converge to the batch answer over
  * everything ever ingested. */
class StreamResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def stage(dir: String, name: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    val json = rows.toDF("doc_id", "source", "n_chars")
      .select(to_json(struct(col("doc_id"), col("source"), col("n_chars"))))
      .collect().map(_.getString(0))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/$name"),
      json.mkString("\n").getBytes("UTF-8"))
  }

  private def runOnce(tmp: String): Long = {
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(s"$tmp/in")
      .select(from_json(col("value"), schema).as("d"))
      .select(col("d.source").as("source"), col("d.doc_id").as("doc_id"),
        col("d.n_chars").as("n_chars"))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/chk")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        seen.incrementAndGet()
        val ss = batch.sparkSession
        val prev =
          if (id == 0) batch.limit(0)
          else ss.read.parquet(s"$tmp/state/batch=${id - 1}")
            .select(col("source"), col("doc_id"), col("n_chars"))
        graft.plans.TopK.perGroup(prev.unionByName(batch),
            Seq(col("source")), Seq(col("n_chars").desc, col("doc_id").asc), 2)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$tmp/state/batch=$id")
        ()
      }
      .start()
    q.awaitTermination()
    seen.get()
  }

  test("restart on the same checkpoint resumes, never reprocesses") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_resume_").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    val batch1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
    val batch2 = Seq((4L, "a", 30L), (5L, "b", 50L))
    stage(s"$tmp/in", "f1.txt", batch1)
    stage(s"$tmp/in", "f2.txt", batch2)
    assert(runOnce(tmp) == 2L) // two files, one batch each

    // stream is stopped; more data lands; a new run on the SAME
    // checkpoint must see exactly the two new files
    val batch3 = Seq((6L, "a", 25L), (7L, "c", 1L))
    val batch4 = Seq((8L, "a", 40L), (9L, "b", 2L))
    stage(s"$tmp/in", "f3.txt", batch3)
    stage(s"$tmp/in", "f4.txt", batch4)
    assert(runOnce(tmp) == 2L, "resumed run must process only new files")

    val last = spark.read.parquet(s"$tmp/state").agg(max(col("batch")))
      .collect()(0).getInt(0)
    assert(last == 3, "batch ids must continue across the restart")
    val got = spark.read.parquet(s"$tmp/state/batch=$last")
      .orderBy(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // batch answer over everything ever ingested (top-2 by n_chars desc)
    val all = batch1 ++ batch2 ++ batch3 ++ batch4
    val want = all.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(2).map(r => (src, r._1, r._3))
    }.sortBy(r => (r._1, r._2))
    assert(got == want)

    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(tmp), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }
}
