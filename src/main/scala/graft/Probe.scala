package graft

import graft.model.Op
import graft.streaming.ChangeStreamPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling/smoke main (not part of the driver contract). */
object Probe {
  private def jsonLine(tx: Long, op: String, path: String, cents: Long) =
    s"""{"txId":$tx,"op":"$op","path":"$path","mode":"New","sizeCents":$cents,"ts":0,"srcPath":"","blockId":-1,"startOffset":-1,"endOffset":-1}"""

  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dbg_").toString
    val chunks = Seq(
      Seq(jsonLine(1, Op.AddFile, "/a", 0), jsonLine(2, Op.AppendFile, "/a", 100),
        jsonLine(1, Op.AddFile, "/b", 0)),
      Seq(jsonLine(3, Op.AppendFile, "/a", 50), jsonLine(2, Op.AppendFile, "/b", 70)),
      Seq(jsonLine(2, Op.AppendFile, "/a", 100),
        jsonLine(4, Op.CloseFile, "/a", 0), jsonLine(3, Op.DeleteFile, "/b", 0)))
    chunks.zipWithIndex.foreach { case (lines, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/in_f$i.txt"),
        lines.mkString("\n").getBytes)
    }
    val q = ChangeStreamPipeline.start(tmp, s"$tmp/chk", "dbg",
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    System.err.println("[probe] progress batches: ")
    q.recentProgress.foreach(p => System.err.println(
      s"[probe] batch=${p.batchId} rows=${p.numInputRows}"))
    System.err.println("[probe] memory table:")
    spark.table("dbg").orderBy("path", "lastTxId").collect()
      .foreach(r => System.err.println(s"[probe] $r"))
    // what did the source index?
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/chk/sources"))
      .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
      .foreach { f =>
        System.err.println(s"[probe] source file $f:")
        java.nio.file.Files.readAllLines(f).asScala
          .foreach(l => System.err.println(s"[probe]   $l"))
      }
    spark.stop()
  }
}
