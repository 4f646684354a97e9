package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-11 model-evaluation battery
  * at sf0.001: the shared score synthesis is re-derived driver-side
  * (MD5 via java.security, same hex→int device), then every report is
  * rebuilt with plain Scala integer arithmetic and compared row-set
  * equal. Monotonicity invariants (gains, recall) ride along. */
class Wave11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Ev(segment: Long, pos: Long, score: Long)

  private lazy val evs: Seq[Ev] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type")).collect()
      .map { r =>
        val hex = md.digest(s"cal:${r.getLong(0)}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(6)
        val h = java.lang.Long.parseLong(hex, 16)
        val pos = if (r.getString(2) == "purchase") 1L else 0L
        Ev(r.getLong(1) % 4, pos,
          math.min(999999L, (h % 1000000L) * 3 / 4 + pos * 250000L))
      }.toSeq
  }

  private def bins(group: Ev => Long): Map[(Long, Long), (Long, Long, Long, java.math.BigInteger, Long)] =
    evs.groupBy(e => (group(e), e.score / 100000)).map { case (k, g) =>
      val s2 = g.map(e => java.math.BigInteger.valueOf(e.score)
        .multiply(java.math.BigInteger.valueOf(e.score)))
        .reduce(_.add(_))
      k -> ((g.size.toLong, g.map(_.pos).sum, g.map(_.score).sum, s2,
        g.filter(_.pos == 1).map(_.score).sum))
    }

  test("q201: reliability bins and ECE match the brute force") {
    val out = Registry.queries("q201_reliability_ece")(spark, dir).collect()
      .map(r => (r.getAs[Long]("segment"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("conf_ppm"), r.getAs[Long]("acc_ppm"),
          r.getAs[Long]("gap_ppm"), r.getAs[Long]("ece_ppm")))).toMap
    val b = bins(_.segment)
    assert(out.keySet == b.keySet)
    for (seg <- b.keys.map(_._1).toSeq.distinct) {
      val segBins = b.filter(_._1._1 == seg)
      val nSeg = segBins.values.map(_._1).sum
      val gaps = segBins.map { case ((_, bin), (n, np, ss, _, _)) =>
        val conf = ss / n; val acc = np * 1000000L / n
        (bin, n, np, conf, acc, (conf - acc).abs)
      }
      val ece = gaps.map(g => g._2 * g._6).sum / nSeg
      for ((bin, n, np, conf, acc, gap) <- gaps)
        assert(out((seg, bin)) == ((n, np, conf, acc, gap, ece)),
          s"segment $seg bin $bin")
    }
  }

  test("q202: Hellinger terms match a brute force over value buckets") {
    val out = Registry.queries("q202_hellinger_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Long]("bc_ppm"), r.getAs[Long]("hellinger2_ppm")))).toMap
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).before(cut),
        math.min(19L, math.floor(r.getDouble(2) * 100 + 0.5).toLong / 2500)))
    for ((et, g) <- rows.groupBy(_._1)) {
      val tRef = g.count(_._2).toLong; val tCur = g.size - tRef
      val bc = g.map(_._3).distinct.map { bkt =>
        val nr = g.count(x => x._2 && x._3 == bkt).toLong
        val nc = g.count(x => !x._2 && x._3 == bkt).toLong
        val p = if (tRef == 0) 0L else nr * 1000000L / tRef
        val q = if (tCur == 0) 0L else nc * 1000000L / tCur
        graft.functions.IntegerSqrt.isqrt(p * q)
      }.sum
      assert(out(et) == ((tRef, tCur, bc, 1000000L - bc)), s"type $et")
      assert(bc <= 1000000L, "Bhattacharyya coefficient is bounded by 1")
    }
  }

  test("q203: Brier and Murphy components match the brute force") {
    val out = Registry.queries("q203_brier_decomposition")(spark, dir)
      .collect().map(r => r.getAs[Long]("segment") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("base_ppm"),
          r.getAs[Long]("brier_ppm"), r.getAs[Long]("rel_ppm"),
          r.getAs[Long]("res_ppm"), r.getAs[Long]("unc_ppm")))).toMap
    val b = bins(_.segment)
    import java.math.BigInteger
    def bi(x: Long) = BigInteger.valueOf(x)
    for (seg <- b.keys.map(_._1).toSeq.distinct) {
      val segBins = b.filter(_._1._1 == seg).values.toSeq
      val n = segBins.map(_._1).sum; val np = segBins.map(_._2).sum
      val base = np * 1000000L / n
      val brierNum = segBins.map { case (_, npB, _, s2, sp) =>
        s2.subtract(bi(sp).multiply(bi(2000000L)))
          .add(bi(npB).multiply(bi(1000000000000L)))
      }.reduce(_.add(_))
      val relNum = segBins.map { case (nB, npB, ss, _, _) =>
        val gap = ss / nB - npB * 1000000L / nB
        bi(nB).multiply(bi(gap)).multiply(bi(gap))
      }.reduce(_.add(_))
      val resNum = segBins.map { case (nB, npB, _, _, _) =>
        val d = npB * 1000000L / nB - base
        bi(nB).multiply(bi(d)).multiply(bi(d))
      }.reduce(_.add(_))
      val den = bi(n).multiply(bi(1000000L))
      val exp = (n, base, brierNum.divide(den).longValueExact(),
        relNum.divide(den).longValueExact(),
        resNum.divide(den).longValueExact(),
        base * (1000000L - base) / 1000000L)
      assert(out(seg) == exp, s"segment $seg")
      // Murphy identity holds to integer rounding (bins are coarse)
      assert((exp._3 - (exp._4 - exp._5 + exp._6)).abs <= 2000L,
        s"Murphy identity drifted beyond rounding for segment $seg")
    }
  }

  test("q204: gains/lift matches brute force; gain is monotone") {
    val out = Registry.queries("q204_decile_lift")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("cum_n"),
        r.getAs[Long]("cum_pos"), r.getAs[Long]("gain_ppm"),
        r.getAs[Long]("lift_ppm")))
    val b = bins(_ => 0L).map { case ((_, bin), v) => bin -> v }
    val totN = b.values.map(_._1).sum; val totP = b.values.map(_._2).sum
    val sorted = b.toSeq.sortBy(-_._1)
    var cn = 0L; var cp = 0L
    val exp = sorted.map { case (bin, (n, np, _, _, _)) =>
      cn += n; cp += np
      (bin, n, np, cn, cp, cp * 1000000L / totP,
        java.math.BigInteger.valueOf(cp)
          .multiply(java.math.BigInteger.valueOf(totN))
          .multiply(java.math.BigInteger.valueOf(1000000L))
          .divide(java.math.BigInteger.valueOf(cn)
            .multiply(java.math.BigInteger.valueOf(totP)))
          .longValueExact())
    }
    assert(out.toSeq == exp)
    assert(out.map(_._6).toSeq == out.map(_._6).toSeq.sorted,
      "gain is monotone non-decreasing down the bins")
    assert(out.last._6 == 1000000L, "full table captures every positive")
  }

  test("q205: PR table matches brute force; recall decreases with threshold") {
    val out = Registry.queries("q205_pr_curve")(spark, dir).collect()
      .map(r => (r.getAs[Long]("threshold_ppm"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"),
        r.getAs[Long]("precision_ppm"), r.getAs[Long]("recall_ppm"),
        r.getAs[Long]("f1_ppm")))
    val totP = evs.map(_.pos).sum
    val maxBin = evs.map(_.score / 100000).max
    val exp = (0L to maxBin).map { k =>
      val sel = evs.filter(_.score / 100000 >= k)
      val tp = sel.map(_.pos).sum; val fp = sel.size - tp
      val p = tp * 1000000L / (tp + fp); val r = tp * 1000000L / totP
      val f1 = if (p + r == 0) 0L else 2 * p * r / (p + r)
      (k * 100000L, tp, fp, totP - tp, p, r, f1)
    }
    assert(out.toSeq == exp)
    assert(out.map(_._6).toSeq == out.map(_._6).toSeq.sorted.reverse,
      "recall is monotone non-increasing in the threshold")
  }
}
