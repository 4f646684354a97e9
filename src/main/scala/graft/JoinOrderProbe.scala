package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head for q318's cardinality-driven join ORDER: the same
  * 3-dim star join (part ~10%, supplier ~50%, orders ~84% filter
  * survival) executed in the histogram-CHOSEN order
  * (most-selective-first) vs the WORST order (least-selective-first).
  * Both must return the same aggregate (asserted); wall times go to
  * one JSON line. The chosen order shrinks the probe stream earliest,
  * so every later join processes fewer fact rows — the measured case
  * for Selinger ordering at scale. Usage:
  *   runMain graft.JoinOrderProbe <sfDir> [reps=3]
  */
object JoinOrderProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fact: DataFrame = Tables.load(spark, sfDir, "lineitem").select(
      col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
        .as("vc"))
    val dims = Seq(
      graft.ops.StatsPlanner.JoinDim("part",
        Tables.load(spark, sfDir, "part")
          .select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"), "p_size", 45L),
      graft.ops.StatsPlanner.JoinDim("supplier",
        Tables.load(spark, sfDir, "supplier").select(col("s_suppkey"),
          expr("CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)")
            .as("s_bal_c")),
        col("l_suppkey") === col("s_suppkey"), "s_bal_c", 400000L),
      graft.ops.StatsPlanner.JoinDim("orders",
        Tables.load(spark, sfDir, "orders").select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
            .as("o_total_c")),
        col("l_orderkey") === col("o_orderkey"), "o_total_c",
        8000000L))

    // plan once (the ANALYZE is the nightly catalog pass, not
    // per-query work); time the JOIN execution
    val (chosen, plans) = graft.ops.StatsPlanner.orderedJoin(fact, dims)
    // worst order: least-selective dim first, same pinned build sides
    val worst = plans.sortBy(_.pos).reverse
      .foldLeft(fact) { (acc, p) =>
        val d = dims.find(_.name == p.name).get
        val filtered = d.dim.filter(col(d.filterCol) > d.gt)
        acc.join(
          if (p.plan == "broadcast") broadcast(filtered)
          else filtered.hint("merge"), d.joinCond)
      }
    // the 100-TB regime: every dim OVER the broadcast cap, so each
    // join is a sort-merge exchange and the intermediate a mis-order
    // ships is REAL shuffled bytes — cap 0 pins all sides to shuffle
    val (chosenSh, _) = graft.ops.StatsPlanner.orderedJoin(fact, dims,
      maxBroadcastRows = 0L)
    val worstSh = plans.sortBy(_.pos).reverse.foldLeft(fact) { (acc, p) =>
      val d = dims.find(_.name == p.name).get
      acc.join(d.dim.filter(col(d.filterCol) > d.gt).hint("merge"),
        d.joinCond)
    }

    def agg(df: DataFrame): (Long, java.math.BigDecimal) = {
      // bounded collect: one global aggregate row (count + sum scalar)
      val r = df.agg(count(lit(1)),
        sum(col("vc").cast("decimal(38,0)"))).collect().head
      (r.getLong(0), r.getDecimal(1))
    }
    def timeIt(label: String, df: => DataFrame)
        : (Double, (Long, java.math.BigDecimal)) = {
      agg(df) // warmup (page cache + codegen)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val r = agg(df)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      System.err.println(f"[joinorder] $label " +
        runs.map(_._1).map(t => f"$t%.2f").mkString(","))
      (runs.map(_._1).min, runs.head._2)
    }

    val (tChosen, rChosen) = timeIt("chosen", chosen)
    val (tWorst, rWorst) = timeIt("worst", worst)
    val (tChosenSh, rChosenSh) = timeIt("chosen_shuffle", chosenSh)
    val (tWorstSh, rWorstSh) = timeIt("worst_shuffle", worstSh)
    require(rChosen == rWorst && rChosen == rChosenSh &&
      rChosen == rWorstSh, "orders disagree on the aggregate")
    println(s"""{"sfDir":"$sfDir","order_chosen":"${
      plans.sortBy(_.pos).map(_.name).mkString(">")}",""" +
      s""""chosen_sec":$tChosen,"worst_sec":$tWorst,""" +
      s""""chosen_shuffle_sec":$tChosenSh,""" +
      s""""worst_shuffle_sec":$tWorstSh}""")
    spark.stop()
  }
}
