package graft

import graft.plans.{TopK, TopKPerGroupExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k-per-group plan: semantics vs the window-rank
  * formulation, plan shape (two heap passes + one exchange, NO sort),
  * and the group-predicate pushdown rule. */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs = Tables.load(spark, dir, "documents")
    .select(col("source"), col("doc_id"), col("lang"), col("n_chars"))

  test("matches the window row_number formulation for several k") {
    for (k <- Seq(1, 2, 5, 30)) {
      val custom = TopK.perGroup(docs, Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc), k)
        .orderBy(col("source"), col("doc_id"))
        .collect().toSeq
      val window = docs
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .filter(col("rn") <= k).drop("rn")
        .orderBy(col("source"), col("doc_id"))
        .collect().toSeq
      assert(custom == window, s"k=$k")
    }
  }

  test("multi-column grouping and ascending order") {
    val custom = TopK.perGroup(docs, Seq(col("source"), col("lang")),
      Seq(col("n_chars").asc, col("doc_id").asc), 2)
      .orderBy(col("source"), col("lang"), col("doc_id"))
      .collect().toSeq
    val window = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"), col("lang"))
          .orderBy(col("n_chars").asc, col("doc_id").asc)))
      .filter(col("rn") <= 2).drop("rn")
      .orderBy(col("source"), col("lang"), col("doc_id"))
      .collect().toSeq
    assert(custom == window)
  }

  test("empty group list = global top-k") {
    val got = TopK.perGroup(docs, Seq.empty,
      Seq(col("n_chars").desc, col("doc_id").asc), 5)
      .orderBy(col("doc_id")).collect().toSeq
    val want = docs.orderBy(col("n_chars").desc, col("doc_id").asc).limit(5)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == want)
  }

  test("plan: two heap passes, one exchange, no sort") {
    val q = TopK.perGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id").asc), 3)
    // executedPlan is the AdaptiveSparkPlan wrapper, which hides its
    // children from collect() until runtime — assert on the rendering
    val s = q.queryExecution.executedPlan.toString
    assert(s.contains(", 3, true") && s.contains(", 3, false"),
      s"expected partial+final heap passes, got:\n$s")
    assert(s.contains("Exchange hashpartitioning"), s)
    assert(!s.contains("Sort "), s"window-style sort crept back in:\n$s")
    assert(!s.contains("Window"), s)
  }

  test("both heap passes fuse into whole-stage codegen spans") {
    val q = TopK.perGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id").asc), 3)
    q.collect() // finalize the adaptive plan so codegen stages are real
    val s = q.queryExecution.executedPlan.toString
    // the `*(n)` marker = inside a WholeStageCodegenExec stage; both the
    // partial (scan-side) and final (post-shuffle) passes must carry it
    assert(s.contains("*(") && s.linesIterator.exists(l =>
      l.contains("TopKPerGroup") && l.contains("*(") && l.contains("true")),
      s"partial pass not fused:\n$s")
    assert(s.linesIterator.exists(l =>
      l.contains("TopKPerGroup") && l.contains("*(") && l.contains("false")),
      s"final pass not fused:\n$s")
  }

  test("group filter above top-k is pushed into the parquet scan") {
    val q = TopK.perGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id").asc), 3)
      .filter(col("source") =!= "src19")
    // optimized: Filter sits BELOW the TopKPerGroup node...
    val optimized = q.queryExecution.optimizedPlan
    val topk = optimized.collectFirst {
      case t: graft.plans.TopKPerGroup => t }.get
    assert(topk.child.toString.contains("src19"),
      s"filter not pushed below top-k:\n$optimized")
    // ...and from there into the scan's pushed-down predicates
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("src19"), scan)
  }

  test("partial-pass flush under group-cardinality pressure stays exact") {
    // force a flush every 3 resident groups (20 sources at sf0.001)
    System.setProperty("graft.topk.flushGroups", "3")
    try {
      val got = TopK.perGroup(docs, Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc), 4)
        .orderBy(col("source"), col("doc_id")).collect().toSeq
      val want = docs
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
            .orderBy(col("n_chars").desc, col("doc_id").asc)))
        .filter(col("rn") <= 4).drop("rn")
        .orderBy(col("source"), col("doc_id")).collect().toSeq
      assert(got == want)
    } finally System.clearProperty("graft.topk.flushGroups")
  }

  test("a non-group filter is NOT pushed (it would change the result)") {
    val q = TopK.perGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id").asc), 3)
      .filter(col("n_chars") > 200)
    val optimized = q.queryExecution.optimizedPlan
    val topk = optimized.collectFirst {
      case t: graft.plans.TopKPerGroup => t }.get
    assert(!topk.child.toString.contains("200"),
      s"order-column filter illegally pushed below top-k:\n$optimized")
    // semantics: filter applies to the top-3 rows, not before selection
    val got = q.orderBy(col("source"), col("doc_id")).collect().toSeq
    val want = docs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .filter(col("n_chars") > 200)
      .orderBy(col("source"), col("doc_id"))
      .collect().toSeq
    assert(got == want)
  }
}
