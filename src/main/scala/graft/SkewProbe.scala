package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Head-to-head for the q125 hot-key treatments, run on a SYNTHESIZED
  * skew (the stock tables are TPC-H-uniform, where no treatment has
  * anything to do): a configurable fraction of lineitem probe rows is
  * remapped onto ONE hot orderkey, then the orders⋈lineitem aggregate
  * runs three ways —
  *
  *   aqe:    plain equi-join, AQE skew-join split on (Spark default) —
  *           the runtime re-plan that carves oversized shuffle
  *           partitions into parallel sub-joins
  *   salt:   the manual (key, salt) rewrite q125 gates — build side
  *           replicated ×8, probe side salted by a row-local hash
  *   noaqe:  plain equi-join with the skew split disabled — the
  *           control that shows the untreated straggler
  *
  * All three must return the same aggregate (asserted); wall times go
  * to one JSON line on stdout. Usage:
  *   runMain graft.SkewProbe <sfDir> [hotPct=30] [reps=3]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val hotPct = if (args.length > 1) args(1).toInt else 30
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // make the skew visible to the splitter at probe scale: the
      // default 256 MB threshold would swallow the whole test set
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      // broadcast would bypass the shuffle under test on probe-sized
      // dims; production orders at 100 TB never broadcasts either
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val SaltFactor = 8
    def ord: DataFrame = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    // remap hotPct% of probe rows onto one existing hot key
    val hotKey = ord.agg(min(col("o_orderkey"))).as[Long].head()
    def li: DataFrame = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
      .withColumn("l_orderkey",
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(100))
          < hotPct, lit(hotKey)).otherwise(col("l_orderkey")))

    def summarize(joined: DataFrame): List[(String, Long, Double)] =
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast(LongType).as("n_items"),
          Tables.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderstatus"))
        // bounded collect: one row per order status (3-value alphabet)
        .as[(String, Long, Double)].collect().toList

    def plain(): List[(String, Long, Double)] =
      summarize(li.join(ord, col("l_orderkey") === col("o_orderkey")))

    def salted(): List[(String, Long, Double)] = {
      val o = ord.withColumn("salt",
        explode(expr(s"sequence(0, ${SaltFactor - 1})")))
      val l = li.withColumn("salt",
        pmod(hash(col("l_linenumber")), lit(SaltFactor)))
      summarize(l.join(o, col("l_orderkey") === col("o_orderkey")
        && l("salt") === o("salt")))
    }

    def timeIt(label: String, skewJoin: Boolean)(
        body: () => List[(String, Long, Double)]): (Double, List[(String, Long, Double)]) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewJoin.toString)
      body() // warmup (page cache + codegen)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val r = body()
        ((System.nanoTime() - t0) / 1e9, r)
      }
      System.err.println(f"[skewprobe] $label ${runs.map(_._1).map(t => f"$t%.2f").mkString(",")}")
      (runs.map(_._1).min, runs.head._2)
    }

    // the adopted manual form: frequency-gated replication (q125)
    def hotSalted(): List[(String, Long, Double)] =
      summarize(graft.util.Salting.hotSaltedJoin(li, ord,
        "l_orderkey", "o_orderkey", spread = col("l_linenumber"),
        nSalts = SaltFactor))

    // round-13: the CATALOG-driven form (q317's device) — hot keys
    // from a persisted q295-shaped stats export, salted via a literal
    // IN. The export runs ONCE outside the timed body (it is the
    // nightly ANALYZE, not per-query work); the timed path reads the
    // B+K catalog rows and plans from them.
    val stats = graft.ops.StatsPlanner.exportStats(li, "l_orderkey")
    def mcvSalted(): List[(String, Long, Double)] = {
      val (joined, hot) = graft.ops.StatsPlanner.skewedJoinFromStats(
        li, "l_orderkey", ord, "o_orderkey",
        spread = col("l_linenumber"), stats, "l_orderkey",
        nSalts = SaltFactor)
      require(hot.nonEmpty, "probe skew must register as a hot MCV")
      summarize(joined)
    }

    val (tAqe, rAqe) = timeIt("aqe", skewJoin = true)(plain)
    val (tSalt, rSalt) = timeIt("salt", skewJoin = true)(salted)
    val (tHot, rHot) = timeIt("hotsalt", skewJoin = false)(hotSalted)
    val (tMcv, rMcv) = timeIt("mcvsalt", skewJoin = false)(mcvSalted)
    val (tNo, rNo) = timeIt("noaqe", skewJoin = false)(plain)
    require(rAqe == rSalt && rAqe == rNo && rAqe == rHot && rAqe == rMcv,
      "treatments disagree on the aggregate")
    println(s"""{"sfDir":"$sfDir","hotPct":$hotPct,""" +
      s""""aqe_sec":$tAqe,"salt_sec":$tSalt,"hotsalt_sec":$tHot,""" +
      s""""mcvsalt_sec":$tMcv,"noaqe_sec":$tNo}""")
    spark.stop()
  }
}
