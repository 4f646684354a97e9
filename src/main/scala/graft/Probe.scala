package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling/smoke main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft_dot available in pure SQL with NO explicit registration call
    // (bounded collect: one probe scalar):
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D)) AS d")
      .collect()(0).getDouble(0)
    System.err.println(s"[probe] graft_dot via extensions = $v (expect 32.0)")
    // wrong arity → analysis error naming the function
    // (bounded collect: the call must throw before returning rows)
    try spark.sql("SELECT graft_dot(array(1.0D))").collect()
    catch { case e: Exception =>
      System.err.println(s"[probe] arity error ok: ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
