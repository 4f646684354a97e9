package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referee for wave 50: merge_asof directions on a hand-built stream
  * covering tolerance cutoffs, the nearest tie, equal-timestamp
  * events, and the no-match sentinel. */
class Wave50Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q296: backward/forward/nearest with tolerance, tie -> backward") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w50a_").toString
    val base = 1700000000000000L
    def ts(offS: Long) = new java.sql.Timestamp((base + offS * 1000000L) / 1000)
    // user 1: signups at 0s and 100s.
    //  purchase at 40s: back=0 (40s ago), fwd=100 (60s ahead) -> nearest back
    //  purchase at 50s: equidistant (50/50) -> tie -> back
    //  purchase at 80s: back=0 (80s), fwd=100 (20s) -> nearest fwd
    // user 2: signup at 0s only; purchase at 5000s: back beyond 3600s
    //  tolerance -> all -1/none
    // user 3: signup AND purchase at the same timestamp -> back match
    //  at distance 0 (range frame includes the tie)
    val ev = Seq(
      (1L, 1L, "signup", 0L), (1L, 2L, "signup", 100L),
      (1L, 3L, "purchase", 40L), (1L, 4L, "purchase", 50L),
      (1L, 5L, "purchase", 80L),
      (2L, 6L, "signup", 0L), (2L, 7L, "purchase", 5000L),
      (3L, 8L, "signup", 30L), (3L, 9L, "purchase", 30L))
    ev.map { case (u, e, k, o) => (u, e, ts(o), k) }
      .toDF("user_id", "event_id", "ts", "event_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def us(offS: Long) = base + offS * 1000000L
    val got = Registry.queries("q296_asof_directions")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("back_us"),
        r.getAs[Long]("fwd_us"), r.getAs[Long]("nearest_us"),
        r.getString(6))).toList
    assert(got == List(
      (3L, us(0), us(100), us(0), "back"),
      (4L, us(0), us(100), us(0), "back"), // the 50/50 tie
      (5L, us(0), us(100), us(100), "fwd"),
      (7L, -1L, -1L, -1L, "none"), // tolerance cut both ways
      (9L, us(30), us(30), us(30), "back")), s"got=$got")
  }
}
