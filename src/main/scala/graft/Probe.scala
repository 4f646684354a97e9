package graft

import graft.model.ChangeEvent
import graft.state.FileStateFSM
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling/smoke main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    implicit val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val full = Registry.queries("q26_cdc_fsm_replay")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // convergence must hold at ANY split point, incl. degenerate ones
    for (frac <- Seq(0.0, 0.05, 0.5, 0.99)) {
      val all = graft.ops.Cdc.eventOps(spark, dir).as[ChangeEvent]
      val maxId = all.agg(max(col("txId"))).as[Long].head()
      val t1 = (maxId * frac).toLong
      val boot = FileStateFSM.replayAll(all.filter(_.txId <= t1))
      val rest = all.filter(_.txId > t1)
      val out = graft.ops.Cdc.stateReport(
        FileStateFSM.replayWithInit(boot, rest).toDF())
        .collect().map(_.toSeq).toSeq
      System.err.println(s"[probe] split=$frac converges=${out == full}")
    }
    spark.stop()
  }
}
