package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 22 (q237–q238). */
class Wave22Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q237 FIFO allocation equals the hand-walked lot drain") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w22_").toString
    // one part: receipts 10u @ $0.01/u then 5u @ $0.02/u; issues 8, 4, 6
    // FIFO walk: i1(8)->lot1:8; i2(4)->lot1:2 + lot2:2; i3(6)->lot2:3,
    // 3 unfilled. cost = (8+2)*100 + (2+3)*200 = 2000 cents
    def t(day: Int) = new java.sql.Timestamp(86400000L * day)
    val rows = Seq(
      // (part, status, qty, extendedprice$, shipdate, orderkey, line#)
      (1L, "F", 10.0, 10.00, t(1), 1L, 1),
      (1L, "F", 5.0, 10.00, t(2), 2L, 1),
      (1L, "O", 8.0, 1.00, t(1), 3L, 1),
      (1L, "O", 4.0, 1.00, t(2), 4L, 1),
      (1L, "O", 6.0, 1.00, t(3), 5L, 1))
    rows.toDF("l_partkey", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_shipdate", "l_orderkey", "l_linenumber")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q237_fifo_cogs")(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_receipts") == 2L)
    assert(r.getAs[Long]("n_issues") == 3L)
    assert(r.getAs[Long]("n_pairs") == 4L) // lot1x{i1,i2}, lot2x{i2,i3}
    assert(r.getAs[Long]("matched_qty") == 15L)
    assert(r.getAs[Long]("unfilled_qty") == 3L)
    assert(r.getAs[Long]("matched_cost_cents") == 2000L)
  }

  test("q237 oversupply: unfilled is zero, lots drain only to demand") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w22_").toString
    def t(day: Int) = new java.sql.Timestamp(86400000L * day)
    // receipts 20u @ $0.05/u; demand only 7u -> matched 7*5=35 cents
    val rows = Seq(
      (2L, "F", 20.0, 100.00, t(1), 1L, 1),
      (2L, "O", 7.0, 1.00, t(1), 2L, 1))
    rows.toDF("l_partkey", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_shipdate", "l_orderkey", "l_linenumber")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    val r = Registry.queries("q237_fifo_cogs")(spark, tmp).collect().head
    assert(r.getAs[Long]("matched_qty") == 7L)
    assert(r.getAs[Long]("unfilled_qty") == 0L)
    assert(r.getAs[Long]("matched_cost_cents") == 7L * 500L)
  }

  test("q238 dwell matrix equals the brute-force session walk") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w22_").toString
    val M = 1000000L
    val ev = Seq(
      (1L, 1L, "v", 0L), (2L, 1L, "c", 60L * M), (3L, 1L, "p", 180L * M),
      // session break (> 30 min), then a lone event: no dwell emitted
      (4L, 1L, "v", 10000L * M),
      (5L, 2L, "v", 0L), (6L, 2L, "c", 30L * M))
    ev.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queries("q238_dwell_time")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toList
    val expected = List(
      ("c", "p", 1L, 120L * M, 120L * M, 120L * M, 1000000L),
      ("v", "c", 2L, 90L * M, 45L * M, 60L * M, 1000000L))
    assert(got == expected, s"got=$got")
  }
}
