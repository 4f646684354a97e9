package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the q224 MDE planner at sf0.001, plus
  * the planner's design invariants: a smaller effect always needs at
  * least as many units, and the ceil never under-powers. */
class Wave17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import java.math.BigInteger
  private def bi(x: Long) = BigInteger.valueOf(x)

  test("q224: sample sizes match the closed form; monotone in MDE; never under-powered") {
    val out = Registry.queries("q224_mde_planner")(spark, dir).collect()
      .map(r => (r.getAs[Long]("segment"), r.getAs[Long]("mde_ppm")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("p_ppm"),
          r.getAs[Long]("daily_users"), r.getAs[Long]("n_per_arm"),
          r.getAs[Long]("days_required")))).toMap
    val userDays = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"),
        expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").as("day"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c"))
      .collect().map(r => (r.getAs[Long]("user_id") % 4,
        r.getAs[Long]("day"), r.getAs[Long]("c")))
    for ((seg, g) <- userDays.groupBy(_._1)) {
      val n = g.length.toLong
      val p = g.map(_._3).sum * 1000000L / n
      assert(p > 0 && p < 1000000L,
        "daily conversion baseline is non-degenerate on this corpus")
      val daily = math.max(1L, n / g.map(_._2).distinct.length)
      for (mde <- Seq(10000L, 20000L, 50000L)) {
        val pbar = math.min(999999L, p + mde / 2)
        val z2 = bi(2801585L).multiply(bi(2801585L))
        val num = z2.multiply(bi(2L)).multiply(bi(pbar))
          .multiply(bi(1000000L - pbar)).divide(bi(1000000000000L))
        val den = bi(mde).multiply(bi(mde))
        val nArm = num.add(den).subtract(BigInteger.ONE).divide(den)
          .longValueExact()
        val days = (2 * nArm + daily - 1) / daily
        assert(out((seg, mde)) == ((n, p, daily, nArm, days)),
          s"segment $seg mde $mde")
        // ceil never under-powers: n·δ² ≥ z²·2p̄(1−p̄)
        assert(bi(nArm).multiply(den).compareTo(num) >= 0)
        assert(nArm > 0, "plan is positive")
      }
      val sizes = Seq(10000L, 20000L, 50000L).map(m => out((seg, m))._4)
      assert(sizes == sizes.sorted.reverse,
        "smaller MDE requires at least as many units")
    }
  }
}
