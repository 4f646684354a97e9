package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referees for wave 48 (the correlated-subquery battery): planted
  * fixtures with the boundary cases that break naive translations —
  * the exact-20% quantity (strictly-below), a multi-late order, a
  * single-supplier order, and a unit-price tie. */
class Wave48Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q292: strictly-below-20%-of-average, boundary exact") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w48a_").toString
    // part 1: quantities 1, 4, 5, 10 -> avg 5, 20% = 1.0; qty 1 is NOT
    // strictly below (boundary), so nothing qualifies for part 1.
    // part 2: quantities 1, 9, 10 -> avg 20/3, 20% = 4/3; qty 1
    // qualifies (price 100.00).
    val rows = Seq(
      (1L, 1.0, 50.0), (1L, 4.0, 60.0), (1L, 5.0, 70.0), (1L, 10.0, 80.0),
      (2L, 1.0, 100.0), (2L, 9.0, 110.0), (2L, 10.0, 120.0))
    rows.zipWithIndex.map { case ((p, q, e), i) => (i.toLong, p, q, e) }
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q292_small_qty_revenue")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((1L, 10000L)), s"got=$got") // one row, 100.00
  }

  test("q293: sole-late on multi-supplier orders only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w48b_").toString
    val d0 = java.time.LocalDate.of(1995, 1, 1)
    def ts(d: Int) = java.sql.Timestamp.valueOf(d0.plusDays(d).atStartOfDay)
    // order 1: supp 10 late, supp 11 on time -> 10 counted
    // order 2: supp 10 AND 12 late -> nobody counted (two late)
    // order 3: supp 10 late, sole supplier -> not counted (n_supp < 2)
    // order 4: supp 11 late twice + supp 10 on time -> 11 counted once
    val li = Seq(
      (1L, 10L, 40), (1L, 11L, 5),
      (2L, 10L, 40), (2L, 12L, 50),
      (3L, 10L, 40),
      (4L, 11L, 40), (4L, 11L, 45), (4L, 10L, 3))
    li.map { case (o, sp, d) => (o, sp, ts(d)) }
      .toDF("l_orderkey", "l_suppkey", "l_shipdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    (1L to 4L).map(o => (o, ts(0)))
      .toDF("o_orderkey", "o_orderdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Registry.queries("q293_sole_late_supplier")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got == List((10L, 1L), (11L, 1L)), s"got=$got")
  }

  test("q294: floored micro unit price, tie elects the lowest suppkey") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w48c_").toString
    // part 1: supp 5 at 100.00/3 (33333 micro*100, floored) vs supp 3
    // at identical price/qty -> tie, supp 3 wins; supp 7 cheaper?
    // 99.99/3 = 33330 -> supp 7 wins outright on part 2
    val li = Seq(
      (1L, 1L, 5L, 3.0, 100.0), (2L, 1L, 3L, 3.0, 100.0),
      (3L, 2L, 9L, 3.0, 100.0), (4L, 2L, 7L, 3.0, 99.99))
    li.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q294_cheapest_supplier")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toList
    // 100.00 cents=10000, *10000 div 300 = 333333; 99.99 -> 333300
    assert(got == List((1L, 3L, 333333L), (2L, 7L, 333300L)), s"got=$got")
  }
}
