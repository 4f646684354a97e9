package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-12 association/structure
  * battery at sf0.001 — graph algebra, bigram counting, BigInteger
  * moment arithmetic and chi-square cells all re-derived driver-side. */
class Wave12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q206: link ranking matches a full graph brute force") {
    val out = Registry.queries("q206_link_prediction")(spark, dir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("cn"),
        r.getAs[Long]("ra_ppm"), r.getAs[Long]("jaccard_ppm"),
        r.getAs[Long]("du"), r.getAs[Long]("dv"),
        r.getAs[Long]("n_capped_bridges")))
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.toSeq.groupBy(_._1).values.toSeq
      .flatMap { g =>
        val ps = g.map(_._2)
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      .groupBy(identity).filter(_._2.size >= 2).keySet
    val nbr = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = nbr.map { case (k, v) => k -> v.size.toLong }
    val capped = deg.count(_._2 > 64).toLong
    val cand = (for {
      (z, dz) <- deg.toSeq if dz <= 64
      u <- nbr(z); v <- nbr(z) if u < v && !edges.contains((u, v))
    } yield ((u, v), dz))
    val scoredAll = cand.groupBy(_._1).map { case ((u, v), zs) =>
      val cn = zs.size.toLong
      val ra = zs.map(x => 1000000L / x._2).sum
      val jac = cn * 1000000L / (deg(u) + deg(v) - cn)
      (u, v, cn, ra, jac, deg(u), deg(v), capped)
    }.toSeq
    val exp = scoredAll
      .sortBy(t => (-t._3, -t._4, t._1, t._2)).take(20)
    assert(out.toSeq == exp)
  }

  test("q207: collocation lift matches a bigram brute force") {
    val out = Registry.queries("q207_collocations")(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("cab"), r.getAs[Long]("ca"), r.getAs[Long]("cb"),
        r.getAs[Long]("lift_ppm")))
    val texts = Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val bis = texts.flatMap(t => t.split(" ", -1).sliding(2)
      .filter(_.length == 2).map(a => (a(0), a(1))))
    val cw = (bis.map(_._1) ++ bis.map(_._2))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val tot = bis.length.toLong * 2
    val exp = bis.groupBy(identity)
      .map { case ((a, b), g) => (a, b, g.length.toLong) }
      .filter(_._3 >= 5)
      .map { case (a, b, cab) =>
        val lift = java.math.BigInteger.valueOf(cab)
          .multiply(java.math.BigInteger.valueOf(tot))
          .multiply(java.math.BigInteger.valueOf(1000000L))
          .divide(java.math.BigInteger.valueOf(cw(a))
            .multiply(java.math.BigInteger.valueOf(cw(b))))
          .longValueExact()
        (a, b, cab, cw(a), cw(b), lift)
      }.toSeq
      .sortBy(t => (-t._6, -t._3, t._1, t._2)).take(20)
    assert(out.toSeq == exp)
  }

  test("q208: covariance/correlation matches BigInteger moments; diagonal corr = 1") {
    val out = Registry.queries("q208_covariance_audit")(spark, dir).collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("cov_milli2"),
          r.getAs[Long]("corr_ppm")))).toMap
    assert(out.size == 36)
    val rows = Tables.load(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).take(8)
        .map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
    val n = rows.length.toLong
    import java.math.BigInteger
    def bi(x: Long) = BigInteger.valueOf(x)
    def s(i: Int) = rows.map(_(i - 1)).sum
    def p(i: Int, j: Int) = rows.map(r => bi(r(i - 1)).multiply(bi(r(j - 1))))
      .reduce(_.add(_))
    for (i <- 1 to 8; j <- i to 8) {
      val covNum = bi(n).multiply(p(i, j)).subtract(bi(s(i)).multiply(bi(s(j))))
      val varI = bi(n).multiply(p(i, i))
        .subtract(bi(s(i)).multiply(bi(s(i)))).longValueExact()
      val varJ = bi(n).multiply(p(j, j))
        .subtract(bi(s(j)).multiply(bi(s(j)))).longValueExact()
      val sdProd = graft.functions.IntegerSqrt.isqrt(varI) *
        graft.functions.IntegerSqrt.isqrt(varJ)
      val sign = if (covNum.signum < 0) -1L else 1L
      val cov = sign * covNum.abs.divide(bi(n).multiply(bi(n))).longValueExact()
      val corr = if (sdProd == 0) 0L
        else math.max(-1000000L, math.min(1000000L,
          sign * covNum.abs.multiply(bi(1000000L))
            .divide(bi(sdProd)).longValueExact()))
      assert(out((i.toLong, j.toLong)) == ((n, cov, corr)), s"pair ($i,$j)")
      if (i == j && varI > 0)
        // isqrt truncation can shave at most a few ppm; clamp caps at 1
        assert((1000000L - corr) <= 3 && corr <= 1000000L,
          s"diagonal corr ($i,$i) = $corr")
    }
  }

  test("q209: Cramér's V matches chi-square cell brute force and is in [0, 1]") {
    val out = Registry.queries("q209_cramers_v")(spark, dir).collect()
      .map(r => r.getAs[String]("pair") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_cols"), r.getAs[Long]("chi2_micro"),
          r.getAs[Long]("v_ppm")))).toMap
    import java.math.BigInteger
    def bi(x: Long) = BigInteger.valueOf(x)
    def brute(pairs: Seq[(String, String)]): (Long, Long, Long, Long, Long) = {
      val n = pairs.size.toLong
      val cells = pairs.groupBy(identity).view.mapValues(_.size.toLong)
      val rm = pairs.groupBy(_._1).view.mapValues(_.size.toLong)
      val cm = pairs.groupBy(_._2).view.mapValues(_.size.toLong)
      val chi2 = cells.map { case ((ra, ck), c) =>
        val d = bi(c).multiply(bi(n)).subtract(bi(rm(ra)).multiply(bi(cm(ck))))
        d.multiply(d).multiply(bi(1000000L))
          .divide(bi(rm(ra)).multiply(bi(cm(ck))).multiply(bi(n)))
          .longValueExact()
      }.sum
      val m = math.min(rm.size, cm.size).toLong - 1
      val v = graft.functions.IntegerSqrt.isqrt(
        bi(chi2).multiply(bi(1000000L)).divide(bi(n).multiply(bi(m)))
          .longValueExact())
      (n, rm.size.toLong, cm.size.toLong, chi2, v)
    }
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val evs = Tables.load(spark, dir, "events")
      .select(col("event_type"), pmod(col("user_id"), lit(4)).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out("documents:lang*source") == brute(docs))
    assert(out("events:type*segment") == brute(evs))
    out.values.foreach { case (_, _, _, _, v) =>
      assert(v >= 0L && v <= 1000000L, "V is a [0,1] effect size") }
  }
}
