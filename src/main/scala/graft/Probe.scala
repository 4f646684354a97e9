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
    for (q <- Seq("q40_sim_cosine_neardup")) {
      System.err.println(s"===== $q =====")
      val plan = Registry.queries(q)(spark, dir).queryExecution.executedPlan
      System.err.println(plan.toString.linesIterator
        .filter(l => l.contains("dotproduct") || l.contains("WholeStageCodegen") ||
          l.contains("Project") || l.contains("Filter"))
        .take(20).mkString("\n"))
    }
    spark.stop()
  }
}
