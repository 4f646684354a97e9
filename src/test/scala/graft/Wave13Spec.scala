package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-13 experimentation battery
  * at sf0.001: encodings, conformal ranks, the held-out-order
  * recommender, IPW arithmetic and the sessionized hazard are all
  * re-derived driver-side in plain Scala. */
class Wave13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q210: LOO / m-estimate encodings match the brute force") {
    val out = Registry.queries("q210_target_encoding")(spark, dir).collect()
      .map(r => r.getAs[String]("brand") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("pos"),
          r.getAs[Long]("rate_ppm"), r.getAs[Long]("global_ppm"),
          r.getAs[Long]("smoothed_ppm"), r.getAs[Long]("loo_pos_ppm"),
          r.getAs[Long]("loo_neg_ppm")))).toMap
    val brand = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag")).collect()
      .map(r => (brand(r.getLong(0)),
        if (r.getString(1) == "R") 1L else 0L))
    val totN = rows.length.toLong; val totPos = rows.map(_._2).sum
    val globalPpm = totPos * 1000000L / totN
    for ((b, g) <- rows.groupBy(_._1)) {
      val n = g.length.toLong; val pos = g.map(_._2).sum
      val exp = (n, pos, pos * 1000000L / n, globalPpm,
        (pos * 1000000L + 100L * globalPpm) / (n + 100L),
        if (n <= 1) globalPpm else (pos - 1) * 1000000L / (n - 1),
        if (n <= 1) globalPpm else pos * 1000000L / (n - 1))
      assert(out(b) == exp, s"brand $b")
    }
  }

  test("q211: conformal thresholds are the exact order statistics") {
    val out = Registry.queries("q211_conformal")(spark, dir).collect()
      .map(r => r.getAs[Long]("alpha_ppm") ->
        ((r.getAs[Long]("n_cal"), r.getAs[Long]("k_rank"),
          r.getAs[Long]("threshold"), r.getAs[Long]("n_test"),
          r.getAs[Long]("covered"), r.getAs[Long]("coverage_ppm")))).toMap
    val evs = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type")).collect()
      .map { r =>
        val id = r.getLong(0)
        val pos = if (r.getString(1) == "purchase") 1L else 0L
        val h = java.lang.Long.parseLong(md5hex(s"cal:$id").take(6), 16)
        val score = math.min(999999L, (h % 1000000L) * 3 / 4 + pos * 250000L)
        val nc = if (pos == 1L) 1000000L - score else score
        val cal = "01234567".contains(md5hex(s"split:$id").head)
        (cal, nc)
      }
    val calNc = evs.filter(_._1).map(_._2).sorted
    val testNc = evs.filterNot(_._1).map(_._2)
    for (alpha <- Seq(100000L, 50000L, 10000L)) {
      val n = calNc.length.toLong
      val k = ((n + 1) * (1000000L - alpha) + 999999L) / 1000000L
      val thr = calNc(k.toInt - 1)
      val covered = testNc.count(_ <= thr).toLong
      val exp = (n, k, thr, testNc.length.toLong, covered,
        covered * 1000000L / testNc.length)
      assert(out(alpha) == exp, s"alpha $alpha")
    }
  }

  test("q212: hit-rate matches a per-customer brute force") {
    val out = Registry.queries("q212_next_order_hitrate")(spark, dir)
      .collect().map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("hitrate_ppm")))).toMap
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val seg = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lastKey = ord.groupBy(_._2).map { case (c, os) =>
      c -> os.map(o => o._3 * 10000000000L + o._1).max % 10000000000L }
    val custOf = ord.map(o => o._1 -> o._2).toMap
    val (held, train) = li.partition(l => lastKey(custOf(l._1)) == l._1)
    val top10 = train.groupBy(_._2).toSeq
      .map { case (p, g) => (p, g.size) }
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val hits = held.groupBy(l => custOf(l._1))
      .map { case (c, ls) => c -> (if (ls.exists(l => top10(l._2))) 1L else 0L) }
    for ((sg, cs) <- hits.groupBy { case (c, _) => seg(c) }) {
      val n = cs.size.toLong; val h = cs.values.sum
      assert(out(sg) == ((n, h, h * 1000000L / n)), s"segment $sg")
    }
  }

  test("q213: IPW ATE matches BigInteger reweighting") {
    val out = Registry.queries("q213_ipw_ate")(spark, dir).collect()
      .map(r => r.getAs[Long]("segment") ->
        ((r.getAs[Long]("n_seg"), r.getAs[Long]("n_treat"),
          r.getAs[Long]("e_ppm"), r.getAs[Long]("naive_diff_ppm"),
          r.getAs[Long]("n_users"), r.getAs[Long]("ate_ppm")))).toMap
    val users = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .map { case (u, es) =>
        (u % 4, if (es.exists(_._2 == "signup")) 1L else 0L,
          if (es.exists(_._2 == "purchase")) 1L else 0L)
      }.toSeq
    val prop = users.groupBy(_._1).map { case (sg, g) =>
      sg -> (g.size.toLong, g.map(_._2).sum)
    }
    val ePpm = prop.map { case (sg, (n, t)) => sg -> t * 1000000L / n }
    import java.math.BigInteger
    val wT = users.filter(u => u._2 == 1L && u._3 == 1L)
      .map(u => BigInteger.valueOf(1000000000000L)
        .divide(BigInteger.valueOf(ePpm(u._1))))
      .foldLeft(BigInteger.ZERO)(_.add(_))
    val wC = users.filter(u => u._2 == 0L && u._3 == 1L)
      .map(u => BigInteger.valueOf(1000000000000L)
        .divide(BigInteger.valueOf(1000000L - ePpm(u._1))))
      .foldLeft(BigInteger.ZERO)(_.add(_))
    val nU = users.size.toLong
    val ate = wT.subtract(wC)
    val atePpm = (if (ate.signum < 0) ate.abs.divide(BigInteger.valueOf(nU))
      .negate() else ate.divide(BigInteger.valueOf(nU))).longValueExact()
    // Spark/DuckDB div truncates toward zero; mirror that exactly
    for ((sg, (n, t)) <- prop) {
      val yT = users.filter(u => u._1 == sg && u._2 == 1L).map(_._3).sum
      val yC = users.filter(u => u._1 == sg && u._2 == 0L).map(_._3).sum
      val naive = if (t == 0 || t == n) 0L
        else yT * 1000000L / t - yC * 1000000L / (n - t)
      assert(out(sg) == ((n, t, ePpm(sg), naive, nU, atePpm)),
        s"segment $sg")
    }
  }

  test("q214: Nelson-Aalen matches a sessionized brute force; hazard is monotone") {
    val out = Registry.queries("q214_nelson_aalen")(spark, dir).collect()
      .map(r => (r.getAs[Long]("duration"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Long]("h_step_ppm"),
        r.getAs[Long]("cum_hazard_ppm")))
    val evs = Tables.load(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = java.sql.Timestamp.valueOf("2024-01-30 18:00:00")
      .getTime * 1000L
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val srt = g.toSeq.sortBy(e => (e._2, e._3))
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = srt.head._2; var last = srt.head._2
      for (e <- srt.tail) {
        if (e._2 - last > 21600000000L) { buf += ((start, last)); start = e._2 }
        last = e._2
      }
      buf += ((start, last)); buf
    }.toSeq
    val du = sessions.map { case (f, l) =>
      ((l - f) / 600000000L, if (l < cut) 1L else 0L) }
    val hist = du.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, g) => (d, g.size.toLong, g.map(_._2).sum) }
    var atRisk = du.size.toLong; var cum = 0L
    val exp = hist.map { case (dur, nAt, dd) =>
      val h = dd * 1000000L / atRisk
      cum += h
      val row = (dur, atRisk, dd, h, cum)
      atRisk -= nAt
      row
    }
    assert(out.toSeq == exp)
    assert(out.map(_._5).toSeq == out.map(_._5).toSeq.sorted,
      "cumulative hazard is monotone non-decreasing")
  }
}
