package graft
import org.apache.spark.sql.SparkSession

/** Plan-capture tool (not part of the driver contract): writes
  * `.explain("formatted")` for the named queries to files, so an
  * optimization round can commit before/after plan evidence
  * (plans/rNN/<query>_{before,after}.txt) without hand-copying
  * console output. Usage:
  *   runMain graft.ExplainQ q291_golden_record,q137_pagerank \
  *     [sfDir] [outDir] [suffix]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r13"
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        System.err.println(s"[explainq] wrote $outDir/${n}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[explainq] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
