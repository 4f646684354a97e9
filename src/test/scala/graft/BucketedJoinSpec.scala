package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing (SURVEY §4 "partitioning & shuffle"):
  * two tables bucketed on the join key join WITHOUT any shuffle
  * exchange — at 100 TB this is the difference between re-shuffling
  * both fact tables per query and a purely local merge per bucket.
  * Bucketing requires the table catalog (`saveAsTable`), which is why
  * it lives in a spec rather than the path-based gate queries.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    // a previous aborted run can leave an orphan managed-table location
    for (t <- Seq("b_lineitem", "b_orders")) {
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    // at gate SF both sides fit the broadcast threshold, which would
    // mask the property under test (a 100 TB fact-fact join cannot
    // broadcast either side) — disable it for the assertion
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) =
      try {
        val j = spark.table("b_lineitem")
          .join(spark.table("b_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
        (j, j.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    // the join itself must read co-located buckets: no Exchange feeds it
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") ||
      joinSection.contains("ShuffledHashJoin"))
    assert(!joinSection.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")

    // and the answer matches the unbucketed plan
    val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("bucket layout prunes an equality filter to one bucket's files") {
    // b_lineitem exists from the test above (shared-session ordering is
    // alphabetical within the suite; re-create defensively anyway)
    if (spark.catalog.tableExists("b_lineitem") == false)
      Tables.load(spark, dir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    // the planner's auto-bucketed-scan heuristic skips bucketing for a
    // bare filter (no join/agg to co-locate), so pin it on for the probe
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
      "false")
    try {
      val one = spark.table("b_lineitem").filter(col("l_orderkey") === 7L)
      val scan = one.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$scan")
    } finally spark.conf
      .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }
}
