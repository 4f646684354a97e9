package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the wave-16 experiment-integrity pair
  * at sf0.001: the SRM chi-square and the delta-method ratio CI,
  * re-derived driver-side with BigInteger. */
class Wave16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import java.math.BigInteger
  private def bi(x: Long) = BigInteger.valueOf(x)

  private def arm(u: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"ab:$u".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.head
    if ("01234567".contains(h)) "A" else "B"
  }

  private lazy val users = Tables.load(spark, dir, "events")
    .groupBy(col("user_id"))
    .agg(count(lit(1)).as("x"),
      sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("y"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q222: SRM chi-square matches; a healthy split does not alarm") {
    val out = Registry.queries("q222_srm_check")(spark, dir).collect()
      .map(r => r.getAs[Long]("segment") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("chi2_micro"), r.getAs[Int]("srm")))).toMap
    for ((seg, g) <- users.groupBy(_._1 % 4)) {
      val n = g.length.toLong
      val na = g.count(u => arm(u._1) == "A").toLong
      val chi2 = bi(2 * na - n).multiply(bi(2 * na - n))
        .multiply(bi(1000000L)).divide(bi(n)).longValueExact()
      val exp = (n, na, n - na, chi2, if (chi2 > 3841459L) 1 else 0)
      assert(out(seg) == exp, s"segment $seg")
    }
  }

  test("q223: delta-method CI matches BigInteger moments; CI brackets R") {
    val out = Registry.queries("q223_ratio_delta_ci")(spark, dir).collect()
      .map(r => r.getAs[String]("arm") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("r_micro"),
          r.getAs[Long]("se_micro"), r.getAs[Long]("ci_lo_micro"),
          r.getAs[Long]("ci_hi_micro")))).toMap
    def divT(a: BigInteger, b: BigInteger): BigInteger = {
      val q = a.abs.divide(b.abs)
      if (a.signum * b.signum < 0) q.negate() else q
    }
    for ((a, g) <- users.groupBy(u => arm(u._1))) {
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxx = g.map(u => bi(u._2).multiply(bi(u._2))).reduce(_.add(_))
      val sxy = g.map(u => bi(u._2).multiply(bi(u._3))).reduce(_.add(_))
      val syy = g.map(u => bi(u._3).multiply(bi(u._3))).reduce(_.add(_))
      val r = sy * 1000000L / sx
      val vy = bi(n).multiply(syy).subtract(bi(sy).multiply(bi(sy)))
      val vx = bi(n).multiply(sxx).subtract(bi(sx).multiply(bi(sx)))
      val cxy = bi(n).multiply(sxy).subtract(bi(sx).multiply(bi(sy)))
      val varNum = vy
        .subtract(divT(bi(2 * r).multiply(cxy), bi(1000000L)))
        .add(divT(bi(r).multiply(bi(r)).multiply(vx), bi(1000000000000L)))
      val se2 = divT(varNum.multiply(bi(1000000000000L)),
        bi(n).multiply(bi(sx)).multiply(bi(sx))).max(BigInteger.ZERO)
        .longValueExact()
      val se = graft.functions.IntegerSqrt.isqrt(se2)
      val lo = r - 1959964L * se / 1000000L
      val hi = r + 1959964L * se / 1000000L
      assert(out(a) == ((n, r, se, lo, hi)), s"arm $a")
      assert(lo <= r && r <= hi, "CI brackets the point estimate")
    }
  }
}
