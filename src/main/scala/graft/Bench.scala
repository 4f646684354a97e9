package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at the SF dir in
  * `SPARK_GRAFT_SF_DIR`, one JSON line on stdout. A failing query is
  * REPORTED (name → error in `"errors"`, and the process exits nonzero)
  * instead of being silently recorded as a fast success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String = // strip ALL JSON-illegal chars
      s.replaceAll("[\\\\\"\\p{Cntrl}]", " ").take(300)
    // Untimed warmup: run every query once at the smallest SF so the
    // timed pass measures the operators, not one-time JVM/session costs
    // (JIT, codegen + Janino caches, parquet/RocksDB class loading) that
    // otherwise land on whichever queries run first. Standard bench
    // methodology; the warmup's own cost is reported in `warmup_sec`,
    // never folded into a query. Skippable via SPARK_GRAFT_WARMUP=0.
    val w0 = System.nanoTime()
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory)
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
    }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    // deterministic name order so runs are comparable query-by-query
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(esc(e.toString)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // ms precision on stdout: the driver's tail capture truncates long
    // lines from the left, and full double precision nearly doubles the
    // line length for no information (these are wall-clock seconds).
    // BENCH_full.json keeps the same rounded values — one record, two homes.
    // stdout keys are shortened to the unique qNN prefix: at 134 queries
    // the full-name line is ~4 KB, which past rounds showed exceeds the
    // driver's capture window (BENCH_r04/r05 both landed `"parsed": null`
    // with the head of the line cut off). The prefix keeps every number
    // attributable (full names in BENCH_full.json / README) at ~14 B/entry.
    val qs = results.map { case (k, v, _) =>
      f""""${k.takeWhile(_ != '_')}":$v%.3f"""
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def record(q: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":$q,"errors":$errs,"warmup_sec":$warmupSec%.3f,"sf":"$sfDir"}"""
    val line = record(qs)
    println(line)
    // ALSO persist the full record to a file: the driver's stdout capture
    // has truncated long lines from the LEFT in past rounds (BENCH_r04
    // lost q01-q29), and a file survives whole. Path overridable so a
    // wrapper can point it at the round artifact directly.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), record(qsFull) + "\n")
      System.err.println(s"[bench] full record written to $outFile")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
