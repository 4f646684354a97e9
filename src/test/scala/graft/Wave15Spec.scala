package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-15 monitoring/variance
  * battery at sf0.001 — control limits, jackknife replicates and the
  * CUPED moment algebra re-derived driver-side with BigInteger. */
class Wave15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import java.math.BigInteger
  private def bi(x: Long) = BigInteger.valueOf(x)
  private def isqrt(x: Long) = graft.functions.IntegerSqrt.isqrt(x)

  private lazy val events = Tables.load(spark, dir, "events")
    .select(col("user_id"), col("event_type"),
      expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)"),
      expr("CAST(floor(value * 1000000 + 0.5) AS BIGINT)"),
      expr("CAST(ts < TIMESTAMP '2024-01-16' AS INT)")).collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getInt(4) == 1))

  test("q219: p-chart limits match; a clean window flags nothing spurious") {
    val out = Registry.queries("q219_p_chart")(spark, dir).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("errors"),
          r.getAs[Long]("p_ppm"), r.getAs[Long]("lcl_ppm"),
          r.getAs[Long]("ucl_ppm"), r.getAs[Int]("ooc")))).toMap
    val byDay = events.groupBy(_._3)
    val te = events.count(_._2 == "error").toLong
    val pbar = te * 1000000L / events.length
    for ((day, g) <- byDay) {
      val n = g.length.toLong
      val err = g.count(_._2 == "error").toLong
      val p = err * 1000000L / n
      val sig = isqrt(pbar * (1000000L - pbar) / n)
      val lcl = math.max(0L, pbar - 3 * sig); val ucl = pbar + 3 * sig
      val ooc = if (p < lcl || p > ucl) 1 else 0
      assert(out(day) == ((n, err, p, lcl, ucl, ooc)), s"day $day")
    }
  }

  test("q220: jackknife SE matches delete-a-day replicates") {
    val out = Registry.queries("q220_jackknife_se")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("d"),
          r.getAs[Long]("mean_micro"), r.getAs[Long]("jk_se_micro")))).toMap
    for ((et, g) <- events.groupBy(_._2)) {
      // .toSeq BEFORE .map: mapping a Map to pairs would re-key by the
      // first element and collapse days with equal counts
      val days = g.groupBy(_._3).toSeq.map { case (_, dg) =>
        (dg.length.toLong, dg.map(_._4).sum) }
      val d = days.length.toLong
      val n = days.map(_._1).sum; val sTot = days.map(_._2).sum
      val thetas = days.map { case (ni, si) => (sTot - si) / (n - ni) }
      val ts = thetas.sum
      val tss = thetas.map(t => bi(t).multiply(bi(t))).reduce(_.add(_))
      val dev2d = bi(d).multiply(tss).subtract(bi(ts).multiply(bi(ts)))
      val se2 = bi(d - 1).multiply(dev2d)
        .divide(bi(d).multiply(bi(d)).multiply(bi(d))).longValueExact()
      assert(out(et) == ((n, d, sTot / n, isqrt(se2))), s"type $et")
    }
  }

  test("q221: CUPED theta/means/reduction match the moment algebra") {
    val out = Registry.queries("q221_cuped")(spark, dir).collect()
      .map(r => r.getAs[String]("variant") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_y_micro"),
          r.getAs[Long]("adj_mean_micro"), r.getAs[Long]("theta_milli"),
          r.getAs[Long]("var_reduction_ppm")))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex1(s: String) = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.head
    val users = events.groupBy(_._1).map { case (u, g) =>
      val x = g.count(e => e._2 == "purchase" && e._5).toLong
      val y = g.count(e => e._2 == "purchase" && !e._5).toLong
      val v = if ("01234567".contains(hex1(s"ab:$u"))) "A" else "B"
      (v, x, y)
    }.toSeq
    val n = users.size.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    def dot(f: ((String, Long, Long)) => (Long, Long)) =
      users.map { u => val (a, b) = f(u); bi(a).multiply(bi(b)) }
        .reduce(_.add(_))
    val sxx = dot(u => (u._2, u._2)); val sxy = dot(u => (u._2, u._3))
    val syy = dot(u => (u._3, u._3))
    val cov = bi(n).multiply(sxy).subtract(bi(sx).multiply(bi(sy)))
    val varx = bi(n).multiply(sxx).subtract(bi(sx).multiply(bi(sx)))
    val vary = bi(n).multiply(syy).subtract(bi(sy).multiply(bi(sy)))
    val theta = if (varx.signum == 0) 0L
      else (if (cov.signum < 0)
        cov.abs.multiply(bi(1000L)).divide(varx).negate()
      else cov.multiply(bi(1000L)).divide(varx)).longValueExact()
    // truncated-division chain exactly as shipped
    def divT(a: BigInteger, b: BigInteger): BigInteger = {
      val q = a.abs.divide(b.abs)
      if (a.signum * b.signum < 0) q.negate() else q
    }
    val adjVar = vary
      .subtract(divT(bi(2 * theta).multiply(cov), bi(1000L)))
      .add(divT(bi(theta).multiply(bi(theta)).multiply(varx), bi(1000000L)))
    val red = if (vary.signum == 0) 0L
      else bi(1000000L).subtract(divT(adjVar.multiply(bi(1000000L)), vary))
        .longValueExact()
    val xbar = sx * 1000000L / n
    for ((v, g) <- users.groupBy(_._1)) {
      val nv = g.size.toLong
      val my = g.map(_._3).sum * 1000000L / nv
      val mx = g.map(_._2).sum * 1000000L / nv
      val adj = my - divT(bi(theta).multiply(bi(mx - xbar)), bi(1000L))
        .longValueExact()
      assert(out(v) == ((nv, my, adj, theta, red)), s"variant $v")
    }
  }
}
