package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit + integration coverage for the native KMV sketch aggregate
  * (merge-through-shuffle, dedup, k-cap) and its q252 surface. */
class KmvSketchAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketch equals k smallest distinct values across partitions") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val values = Seq.fill(5000)(rng.nextInt(800).toLong)
    // 8 input partitions force partial buffers + a real merge path
    val df = values.toDF("h").repartition(8)
    val agg = df.agg(graft.functions.KmvSketch.kmv(col("h"), 32)
      .as("sk"))
    // plan pin: a TypedImperativeAggregate must plan as partial+final
    // ObjectHashAggregate — the mergeable-sketch shuffle contract
    val plan = agg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate, plan:\n$plan")
    val got = agg.collect()(0).getSeq[Long](0)
    val want = values.distinct.sorted.take(32)
    assert(got == want)
  }

  test("groups smaller than k return every distinct value, ascending") {
    import spark.implicits._
    val df = Seq(("a", 9L), ("a", 5L), ("a", 5L), ("b", 2L))
      .toDF("g", "h").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(graft.functions.KmvSketch.kmv(col("h"), 64).as("sk"))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toList
    assert(got == List(("a", Seq(5L, 9L)), ("b", Seq(2L))))
  }

  test("nulls are skipped, not sketched") {
    import spark.implicits._
    val df = Seq(Some(4L), None, Some(1L), None).toDF("h")
    val got = df.agg(graft.functions.KmvSketch.kmv(col("h"), 8).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(1L, 4L))
  }

  test("q252 sketch + estimate equal the Scala replica") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_kmv_").toString
    val rng = new scala.util.Random(23)
    val rows = (1L to 900L).map(k =>
      (k, Seq("R", "A", "N")(rng.nextInt(3))))
    rows.toDF("l_partkey", "l_returnflag").coalesce(3)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val M = 2147483648L
    def h(x: Long) = ((x % 1000000007L) * 2654435761L) % M
    val got = Registry.queries("q252_kmv_native")(spark, tmp).collect()
    assert(got.map(_.getString(0)).toList == List("A", "N", "R"))
    for (r <- got) {
      val parts = rows.filter(_._2 == r.getString(0)).map(_._1)
      val sketch = parts.map(h).distinct.sorted.take(64)
      // gate output ships the sketch '|'-joined (atomic-schema contract)
      assert(r.getString(5) == sketch.mkString("|"), s"flag ${r.getString(0)}")
      assert(r.getLong(1) == sketch.size.toLong)
      assert(r.getLong(2) == sketch.last)
      val est = if (sketch.size < 64) sketch.size.toLong
        else 63L * M / sketch.last
      assert(r.getLong(3) == est)
      assert(r.getLong(4) == parts.distinct.size.toLong)
    }
  }
}
