package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN returns bucket-local, correctly-ranked neighbors with nonzero recall") {
    val brute = Registry.queries("q38_sim_cosine_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Registry.queries("q39_sim_ann_lsh")(spark, dir).collect()
    // ranks are 1..k consecutive per query
    val byQ = ann.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
    // recall vs brute force on the 5 shared query ids (qid < 5)
    val annPairs = ann.filter(_.getLong(0) < 5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (annPairs & brute).size.toDouble / brute.size
    info(s"ANN recall@10 vs brute force: $recall")
    // multi-probe (Hamming-1) lifts recall to 0.2 on these near-random
    // vectors (single-probe was 0.02); floor set below the measured value
    assert(recall >= 0.1, "multi-probe LSH should keep recall >= 0.1")
    assert(annPairs.nonEmpty)
  }

  test("near-dup pairs are symmetric-free and ordered") {
    val nd = Registry.queries("q40_sim_cosine_neardup")(spark, dir).collect()
    nd.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("minhash candidates superset high-jaccard doc pairs (LSH soundness on shared bands)") {
    // Any two docs with IDENTICAL 3-shingle sets must share all bands.
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), // identical → must pair
      (3L, "x y z w q")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_tmp")
    // reuse the registered query against a temp dir is not possible —
    // assert via the same construction inline
    val ws = split(col("text"), " ")
    val sh = docs.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(split(text,' ')) - 3), i -> concat_ws(' ', split(text,' ')[i], split(text,' ')[i+1], split(text,' ')[i+2]))"))
      .as("sh")).distinct()
    val aggs = (0 until 8).map(i => min(md5(concat(lit(s"$i:"), col("sh")))).as(s"h$i"))
    val sig = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).collect()
    val s1 = sig.find(_.getLong(0) == 1L).get
    val s2 = sig.find(_.getLong(0) == 2L).get
    val s3 = sig.find(_.getLong(0) == 3L).get
    assert((1 to 8).forall(i => s1.getString(i) == s2.getString(i)))
    assert((1 to 8).exists(i => s1.getString(i) != s3.getString(i)))
  }
}
