package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling/smoke main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val q17 = Registry.queries("q17_salted_agg")(spark, dir)
    q17.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("HashAggregate"))
      .foreach(l => System.err.println(s"[probe] $l"))
    q17.collect().foreach(r => System.err.println(s"[probe] q17 $r"))
    Registry.queries("q16_approx_distinct")(spark, dir).collect()
      .foreach(r => System.err.println(s"[probe] q16 $r"))
    spark.stop()
  }
}
