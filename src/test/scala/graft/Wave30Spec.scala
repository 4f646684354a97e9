package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 30 (q254–q255). */
class Wave30Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeOrders(tmp: String,
      rows: Seq[(Long, Int, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (cust, yr, price) =>
      (cust * 10 + yr, cust, price,
        java.sql.Timestamp.valueOf(f"$yr%04d-06-15 00:00:00")) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
  }

  test("q254 DiD equals the four-cell hand computation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w30_").toString
    // treated (even cust): pre mean 10.00, post mean 14.00 -> lift 4.00
    // control (odd cust):  pre mean 20.00, post mean 21.00 -> lift 1.00
    // DiD = 3.00 = 3_000_000 micro-cents... (cents*1e6: 400-100=300 cents)
    writeOrders(tmp, Seq(
      (2L, 1994, 10.00), (4L, 1995, 10.00), // pre treated
      (2L, 1996, 14.00), (4L, 1997, 14.00), // post treated
      (1L, 1994, 20.00), (3L, 1995, 20.00), // pre control
      (1L, 1996, 22.00), (3L, 1997, 20.00)) // post control, mean 21.00
    )
    val r = Registry.queries("q254_diff_in_diff")(spark, tmp)
      .collect().head
    assert(r.getAs[Long]("n_pre_t") == 2L)
    assert(r.getAs[Long]("pre_t_micro") == 1000L * 1000000L)
    assert(r.getAs[Long]("post_t_micro") == 1400L * 1000000L)
    assert(r.getAs[Long]("pre_c_micro") == 2000L * 1000000L)
    assert(r.getAs[Long]("post_c_micro") == 2100L * 1000000L)
    assert(r.getAs[Long]("did_micro") == 300L * 1000000L)
  }

  test("q254 empty orders yields all-zero cells, not a crash") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w30_").toString
    writeOrders(tmp, Nil)
    val r = Registry.queries("q254_diff_in_diff")(spark, tmp)
      .collect().head
    assert(r.getAs[Long]("n_pre_t") == 0L)
    assert(r.getAs[Long]("did_micro") == 0L)
  }

  test("q255 dispersion equals the zero-filled moment replay") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w30_").toString
    val day = 86400L * 1000000L
    // 5-day span. type a: counts 2,0,2,0,2 (variance > mean)
    //             type b: counts 1,1,1,1,1 (variance 0)
    val ev =
      Seq(0, 2, 4).flatMap(d => Seq(1, 2).map(j =>
        (d * 100L + j, 1L, "a", d * day + j))) ++
      (0 until 5).map(d => (d * 100L + 9L, 1L, "b", d * day))
    ev.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queries("q255_dispersion_index")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toList
    // a: n=5 S=6 Sx2=12 -> var*n2 = 5*12-36 = 24 -> I = 24e6/(5*6)=800000
    // b: n=5 S=5 Sx2=5  -> 25-25 = 0 -> I = 0
    assert(got == List(
      ("a", 5L, 6L, 1200000L, 800000L, false),
      ("b", 5L, 5L, 1000000L, 0L, false)), s"got=$got")
  }

  test("q255 flags a bursty series as overdispersed") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w30_").toString
    val day = 86400L * 1000000L
    // counts 6,0,0,0,0 over a 5-day span: S=6 Sx2=36
    // var*n2 = 5*36-36 = 144 -> I = 144e6/30 = 4_800_000 > 1e6
    val ev = (1 to 6).map(j => (j.toLong, 1L, "a", 0L * day + j)) :+
      (99L, 1L, "a", 4L * day) // day 4 anchors the span; count 7 total
    // recompute: counts 6,0,0,0,1 -> S=7 Sx2=37 -> 5*37-49=136
    // I = 136e6/(5*7) = 3_885_714 -> overdispersed
    ev.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Registry.queries("q255_dispersion_index")(spark, tmp)
      .collect().head
    assert(r.getLong(4) == 136L * 1000000L / 35L)
    assert(r.getBoolean(5))
  }
}
