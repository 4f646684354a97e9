package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // count() lets Catalyst prune the aggregate payload — for queries
    // whose row count is derivable from a keyed join (q188: right join
    // on an aggregated key) that under-measures by >10x. "collect"
    // mode forces every output column to materialize.
    val collectMode = args.length > 3 && args(3) == "collect"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // warmup at sf0.001
      def run(dir: String): Long = {
        val df = fn(spark, dir)
        // bounded collect — timing-harness materialization of a gate
        // result (gate outputs are aggregates; the largest is ~1M rows
        // at sf10), never a production return path
        if (collectMode) df.collect().length.toLong else df.count()
      }
      try run("/root/testdata/sf0.001") catch { case _: Throwable => () }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val c = run(sfDir)
        ((System.nanoTime() - t0) / 1e9, c)
      }
      System.err.println(f"[timeq] $n rows=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
