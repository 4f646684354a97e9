package graft

import graft.api.Graft
import graft.filters.DomainFilters.Filter
import graft.model.{ChangeEvent, Op}
import org.apache.spark.sql.SparkSession

/** Scratch profiling/smoke main (not part of the driver contract).
  * Currently: end-user walkthrough of the Graft facade. */
object Probe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_user_").toString

    // a user session: register filters, replay a day of events, snapshot
    val g = new Graft(spark, dir)
    g.addFilter(Filter("analytics", "TABLES", "/warehouse", ".*\\.parquet$", 1))
    g.replay(Seq(
      ChangeEvent(1, Op.AddFile, "/warehouse/t1/part-0.parquet"),
      ChangeEvent(2, Op.AppendFile, "/warehouse/t1/part-0.parquet", sizeCents = 1234),
      ChangeEvent(3, Op.CloseFile, "/warehouse/t1/part-0.parquet"),
      ChangeEvent(4, Op.AddFile, "/scratch/tmp.bin")).toDS())
    System.err.println(s"[probe] watermark=${g.watermark()}")
    g.snapshotStatus().collect().foreach(r => System.err.println(s"[probe] status=$r"))
    val snap = g.snapshot(asOfTxId = 1000).collect()
    System.err.println(s"[probe] snapshot=${snap.map(_.path).mkString(",")}")
    // user mistake: remove a filter that doesn't exist, then empty registry route
    g.removeFilter("nope", "nope")
    g.removeFilter("analytics", "TABLES")
    val snapEmpty = g.snapshot(1001).collect()
    System.err.println(s"[probe] snapshot-no-filters=${snapEmpty.length}")
    // double replayIncrement with the same (stale) tx — duplicate guard
    g.addFilter(Filter("analytics", "TABLES", "/warehouse", ".*", 1))
    g.replayIncrement(Seq(ChangeEvent(2, Op.AppendFile,
      "/warehouse/t1/part-0.parquet", sizeCents = 999)).toDS())
    val size = g.stateTable.collect()
      .find(_.path == "/warehouse/t1/part-0.parquet").get.dataSizeCents
    System.err.println(s"[probe] size-after-stale-append=$size (expect 1234)")
    spark.stop()
  }
}
