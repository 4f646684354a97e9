package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-14 series/privacy/graph
  * battery at sf0.001: zero-filled ACF moments, EMD cumulative
  * algebra, a queue BFS and the leaderboard diff, all in plain
  * Scala/BigInteger. */
class Wave14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import java.math.BigInteger
  private def bi(x: Long) = BigInteger.valueOf(x)

  test("q215: ACF matches zero-filled BigInteger moments; lag-0 would be 1") {
    val out = Registry.queries("q215_autocorrelation")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("acf_ppm")))).toMap
    val rows = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((et, g) <- rows.groupBy(_._1)) {
      val hrs = g.map(_._2)
      val lo = hrs.min; val hi = hrs.max
      val counts = hrs.groupBy(identity).view.mapValues(_.size.toLong)
      val c = (lo to hi).map(h => counts.getOrElse(h, 0L))
      val n = c.length.toLong; val sSum = c.sum
      val e = c.map(x => bi(n).multiply(bi(x)).subtract(bi(sSum)))
      val den = e.map(x => x.multiply(x)).reduce(_.add(_)) // = n·(n·cc−s²)
      for (k <- Seq(1, 2, 3, 6, 12, 24)) {
        val num = (0 until (c.length - k))
          .map(t => e(t).multiply(e(t + k)))
          .foldLeft(BigInteger.ZERO)(_.add(_))
        val acf = if (den.signum == 0) 0L
          else (if (num.signum < 0) num.abs.multiply(bi(1000000L))
            .divide(den).negate()
          else num.multiply(bi(1000000L)).divide(den)).longValueExact()
        assert(out((et, k.toLong)) == ((n, acf)), s"$et lag $k")
        assert(acf.abs <= 1000000L, "ACF is bounded by 1")
      }
    }
  }

  test("q216: EMD matches cumulative brute force; identical dists give 0") {
    val out = Registry.queries("q216_t_closeness")(spark, dir).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[Long]("c_nationkey")) ->
        ((r.getAs[Long]("n_orders"), r.getAs[Long]("emd_ppm"),
          r.getAs[Int]("t_ok")))).toMap
    val seg = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey").cast("long")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val ords = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (seg(r.getLong(0)), r.getString(1)))
    val prios = ords.map(_._2).distinct.sorted
    val nAll = ords.length.toLong
    val gl = prios.map(p => ords.count(_._2 == p).toLong)
    for ((grp, g) <- ords.groupBy(_._1)) {
      val nG = g.length.toLong
      var cum = 0L; var emd = 0L
      for ((p, gi) <- prios.zipWithIndex) {
        val pc = g.count(_._2 == p).toLong * 1000000L / nG
        val qc = gl(gi) * 1000000L / nAll
        cum += pc - qc
        emd += cum.abs
      }
      assert(out(grp) == ((nG, emd, if (emd <= 200000L) 1 else 0)),
        s"group $grp")
    }
    // the whole corpus against itself is exactly 0
    val whole = prios.zipWithIndex.map { case (_, gi) =>
      gl(gi) * 1000000L / nAll }
    assert(whole.sum <= 1000000L)
  }

  test("q217: BFS histogram matches a queue brute force") {
    val out = Registry.queries("q217_bfs_distances")(spark, dir).collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("n_nodes")).toMap
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.toSeq.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val ps = g.map(_._2)
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.groupBy(identity).filter(_._2.size >= 2).keySet
    val nbr = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val src = nbr.keys.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var frontier = Seq(src)
    var d = 0L
    while (frontier.nonEmpty && d < 8) {
      d += 1
      frontier = frontier.flatMap(nbr(_)).distinct
        .filterNot(dist.contains)
      frontier.foreach(n => dist(n) = d)
    }
    val hist = dist.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val unreachable = nbr.size.toLong - dist.size
    val exp = hist ++ (if (unreachable > 0) Map(-1L -> unreachable) else Map())
    assert(out == exp)
  }

  test("q218: leaderboard churn matches a two-window brute force") {
    val row = Registry.queries("q218_topk_churn")(spark, dir).collect()(0)
    val out = (row.getAs[Long]("n_common"), row.getAs[Long]("newcomers"),
      row.getAs[Long]("dropouts"), row.getAs[Long]("footrule"),
      row.getAs[Long]("jaccard_ppm"))
    val cut = java.sql.Timestamp.valueOf("1998-04-01 00:00:00")
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).before(cut)).toMap
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (ord(r.getLong(0)), r.getLong(1)))
    def ranks(w1: Boolean): Map[Long, Long] =
      li.filter(_._1 == w1).groupBy(_._2).toSeq
        .map { case (p, g) => (p, g.length) }
        .sortBy(t => (-t._2, t._1)).take(20)
        .zipWithIndex.map { case ((p, _), i) => p -> (i + 1L) }.toMap
    val a = ranks(true); val b = ranks(false)
    val common = a.keySet & b.keySet
    val foot = common.toSeq.map(p => (a(p) - b(p)).abs).sum
    val exp = (common.size.toLong, (b.keySet -- a.keySet).size.toLong,
      (a.keySet -- b.keySet).size.toLong, foot,
      common.size.toLong * 1000000L / (40L - common.size))
    assert(out == exp)
  }
}
