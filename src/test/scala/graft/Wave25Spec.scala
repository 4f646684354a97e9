package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 25 (q245–q247). */
class Wave25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q245 bins equal the hand-packed greedy plan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w25_").toString
    // capacity 4096. srcA: 3000,2000,4000,100 in doc_id order ->
    // before: 0,3000,5000,9000 -> bins 0,0,1,2
    //   bin0 = {3000,2000}=5000 chars 2 files; bin1={4000}; bin2={100}
    // srcB: one oversized 9000-char file -> bin 0, max_bin_chars 9000
    val rows = Seq(
      ("srcA", 1L, 3000L), ("srcA", 2L, 2000L), ("srcA", 3L, 4000L),
      ("srcA", 4L, 100L), ("srcB", 9L, 9000L))
    rows.toDF("source", "doc_id", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.queries("q245_compaction_bins")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toList
    assert(got == List(
      ("srcA", 4L, 9100L, 3L, 3L, 9100L * 1000000L / (3L * 4096L),
        5000L, 2L),
      ("srcB", 1L, 9000L, 1L, 3L, 9000L * 1000000L / 4096L, 9000L, 1L)),
      s"got=$got")
  }

  test("q246 lag features equal the per-user brute force") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w25_").toString
    val day = 86400L * 1000000L
    // user 1: days 0,1,3 (gap at 2: ACTIVE-day lag, so day3's lag1 is day1)
    // user 2: single day
    val ev = Seq(
      (1L, 1L, 0L * day, 1.0), (2L, 1L, 0L * day + 5L, 2.0),
      (3L, 1L, 1L * day, 0.5), (4L, 1L, 3L * day, 1.5),
      (5L, 2L, 0L * day, 10.0))
    ev.map { case (id, u, us, v) => (id, u, us, v) }
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queries("q246_lag_features")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getLong(6),
        Option(r.get(7)).map(_.asInstanceOf[Long]))).toList
    val expected = List(
      (1L, "1970-01-01", 2L, 300L, None, None, 2L, Some(1L)),
      (1L, "1970-01-02", 1L, 50L, Some(2L), None, 3L, Some(1L)),
      (1L, "1970-01-04", 1L, 150L, Some(1L), None, 4L, None),
      (2L, "1970-01-01", 1L, 1000L, None, None, 1L, None))
    assert(got == expected, s"got=$got")
  }

  test("q247 backtest equals the hand-scored series") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w25_").toString
    val day = 86400L * 1000000L
    // daily counts over a 10-day span, with day 4 EMPTY (zero-filled):
    // counts: d0..d9 = 3,1,2,2,0,1,3,3,1,2
    val counts = Seq(3, 1, 2, 2, 0, 1, 3, 3, 1, 2)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => (d * 100L + j, 1L, d * day + j, 1.0)) }
    ev.toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // days 7..9 have both lags: naive err |n - n[-1]|, seasonal |n - n[-7]|
    // d7: n=3 naive|3-3|=0 seas|3-n(d0)|=|3-3|=0
    // d8: n=1 naive|1-3|=2 seas|1-n(d1)|=|1-1|=0
    // d9: n=2 naive|2-1|=1 seas|2-n(d2)|=|2-2|=0
    val r = Registry.queries("q247_forecast_backtest")(spark, tmp)
      .collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("abs_err_naive") == 3L)
    assert(r.getAs[Long]("abs_err_seasonal") == 0L)
    assert(r.getAs[Long]("mae_naive_micro") == 1000000L)
    assert(r.getAs[Long]("mae_seasonal_micro") == 0L)
    assert(r.getAs[Long]("seasonal_wins") == 2L) // d8 (0<2) and d9 (0<1)
    assert(r.getAs[Long]("naive_wins") == 0L)    // d7 is a 0-0 tie
  }
}
