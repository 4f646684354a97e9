package graft

import org.apache.spark.sql.SparkSession

/** Dev probe for q259's filter ladder: prints, for a scale-factor
  * directory, the candidate count after the prefix+length+positional
  * filters, the survivor count after the histogram suffix bound (the
  * PPJoin+-style pre-verify cut), and the exact-verified pair count —
  * the before/after evidence BASELINE.md records for the suffix
  * filter's payoff.
  *
  * Usage: `sbt "runMain graft.SetSimProbe /tmp/graft_sf1"`
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val st = ops.Wave33.setSimStages(spark, dir)
    val nCands = st.cands.count()
    val t1 = System.nanoTime()
    val nSuffix = st.verifyIn.count()
    val t2 = System.nanoTime()
    val nPairs = st.pairs.count()
    val t3 = System.nanoTime()
    println(f"[setsim] dir=$dir candidates=$nCands%d " +
      f"after_suffix=$nSuffix%d (cut=${
        if (nCands == 0) 0.0 else 100.0 * (nCands - nSuffix) / nCands
      }%.1f%%) verified=$nPairs%d " +
      f"t_cands=${(t1 - t0) / 1e9}%.1fs t_suffix=${(t2 - t1) / 1e9}%.1fs " +
      f"t_verify=${(t3 - t2) / 1e9}%.1fs")
    spark.stop()
  }
}
