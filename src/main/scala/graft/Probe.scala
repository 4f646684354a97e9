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
    val n = SparkEntry.entry(spark).count()
    System.err.println(s"[probe] entry() rows=$n")
    SparkEntry.entry(spark).show(5, false)
    spark.stop()
  }
}
