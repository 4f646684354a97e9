package graft

import graft.util.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed range join equals the theta join, for any bucket width") {
    import spark.implicits._
    val points = (0L until 500L).map(i => (i * 7 % 1000, s"p$i"))
      .toDF("p", "tag")
    val intervals = Seq(
      (1L, 0L, 99L), (2L, 50L, 149L), // overlapping intervals
      (3L, 200L, 200L), // single-point interval
      (4L, 950L, 1200L), // past the point domain's edge
      (5L, 400L, 380L)) // empty interval (lo > hi): matches nothing
      .toDF("iid", "lo", "hi")
    val expected = points.join(intervals,
        col("p").between(col("lo"), col("hi")))
      .select("p", "tag", "iid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals,
          "lo", "hi", w)
        .select("p", "tag", "iid").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expected, s"bucketWidth=$w diverged from theta join")
    }
  }

  test("the bucketed plan is an equi hash/merge join, not a nested loop") {
    import spark.implicits._
    val points = spark.range(1000).select(col("id").as("p"))
    val intervals = spark.range(100)
      .select(col("id").as("iid"), (col("id") * 10).as("lo"),
        (col("id") * 10 + 9).as("hi"))
    val plan = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must be equi-bucketed:\n$plan")
  }
}
