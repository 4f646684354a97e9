package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 24 (q242–q244). */
class Wave24Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(tmp: String, texts: Seq[String]): Unit = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
  }

  test("q242 completions equal the brute-force prefix tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w24_").toString
    writeDocs(tmp, Seq("cat car cat dog", "car cab dog dot", "cat do"))
    val words = Seq("cat", "car", "cat", "dog", "car", "cab", "dog",
      "dot", "cat", "do")
    val wc = words.groupBy(identity).map { case (w, g) =>
      w -> g.size.toLong }
    val px = for {
      (w, c) <- wc.toSeq; l <- 1 to 3; if w.length >= l
    } yield (w.substring(0, l), w, c)
    val ptotal = px.groupBy(_._1).map { case (p, g) =>
      p -> g.map(_._3).sum }
    val expected = px.groupBy(_._1).toSeq.flatMap { case (p, g) =>
      g.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex.map {
        case ((_, w, c), i) => (p, ptotal(p), i + 1L, w, c) }
    }.sortBy(t => (-t._2, t._1, t._3)).toList
    val df = Registry.queries("q242_autocomplete")(spark, tmp)
    // plan pin: the completions must run through the custom operator,
    // not a row_number-then-filter rewrite
    assert(df.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"), "q242 lost its TopKPerGroupExec")
    val got = df
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toList
    assert(got == expected, s"got=$got\nexp=$expected")
  }

  /** Two orders holding the same part set make every pair co-ordered
    * twice — the support-2 edge floor. */
  private def writeOrders(tmp: String, orders: Seq[Seq[Long]]): Unit = {
    import spark.implicits._
    val rows = orders.zipWithIndex.flatMap { case (parts, o) =>
      parts.map(p => (o.toLong, p)) }
    rows.toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
  }

  test("q243 3-core keeps K4 and peels the pendant") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w24_").toString
    // K4 on parts 1-4 (two identical orders -> all pairs co>=2);
    // pendant part 5 tied to part 1 only -> degree 1, peeled round 1.
    writeOrders(tmp, Seq(
      Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L),
      Seq(1L, 5L), Seq(1L, 5L)))
    val got = Registry.queries("q243_k_core")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List((1L, 3L, 4L, 6L), (2L, 3L, 4L, 6L),
      (3L, 3L, 4L, 6L), (4L, 3L, 4L, 6L)), s"got=$got")
  }

  test("q243 a lone triangle has an empty 3-core") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w24_").toString
    writeOrders(tmp, Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
    assert(Registry.queries("q243_k_core")(spark, tmp).count() == 0L)
  }

  test("q244 phrase counts equal the brute-force bigram walk") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w24_").toString
    // 'order fast' twice in doc0 (overlap-free adjacency), once in doc1;
    // 'window join' once in doc1; 'stream column' never.
    writeDocs(tmp, Seq(
      "order fast order fast window",
      "order fast window join stream",
      "column stream fast order"))
    val got = Registry.queries("q244_phrase_match")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toList
    assert(got == List(
      ("order fast", 3L, 2L),
      ("stream column", 0L, 0L),
      ("window join", 1L, 1L)), s"got=$got")
  }
}
