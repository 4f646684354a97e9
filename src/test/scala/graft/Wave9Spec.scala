package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the ninth-wave battery (q196–q199):
  * conservation laws against the source tables plus consistency with
  * the production operators these reports compose (q52 clusters, q37
  * verified pairs, q54 split). */
class Wave9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q196 Gini: matches brute force, bounded by the class count") {
    val out = Registry.queries("q196_gini_balance")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("majority_ppm"), r.getAs[Long]("gini_ppm"))).toMap
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    for ((src, rows) <- docs.groupBy(_._1)) {
      val counts = rows.groupBy(_._2).map(_._2.size.toLong).toSeq
      val n = counts.sum
      val gini = (BigInt(1000000) -
        counts.map(c => BigInt(c) * c).sum * 1000000 / (BigInt(n) * n)).toLong
      val maj = counts.max * 1000000L / n
      assert(out(src) == ((n, counts.size.toLong, maj, gini)),
        s"gini mismatch for $src")
      // impurity of k classes cannot exceed 1 - 1/k
      assert(gini <= 1000000L - 1000000L / counts.size)
    }
  }

  test("q197 cluster histogram: conserves documents, consistent with q52") {
    val out = Registry.queries("q197_cluster_histogram")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("docs_dropped")))
    val total = Tables.load(spark, dir, "documents").count()
    assert(out.map(_._3).sum == total,
      "histogram rows must partition the whole corpus")
    // sizes >= 2 must match the q52 cluster listing exactly
    val q52 = Registry.queries("q52_dedup_clusters")(spark, dir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
    val want = q52.groupBy(identity).keys.toSeq.groupBy(_._2)
      .map { case (sz, cs) => sz -> cs.size.toLong }
    for ((sz, nc, nd, dropped) <- out if sz >= 2) {
      assert(want(sz) == nc, s"size-$sz cluster count disagrees with q52")
      assert(nd == sz * nc && dropped == (sz - 1) * nc)
    }
    assert(out.filter(_._1 == 1).map(_._2).sum ==
      total - q52.map(_._1).length, "singleton row = docs in no pair")
  }

  test("q198 concentration: matches a per-user sort brute force") {
    val out = Registry.queries("q198_concentration")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    val counts = Tables.load(spark, dir, "events")
      .groupBy("user_id").count().collect().map(_.getLong(1)).sortBy(-_)
    val u = counts.length.toLong
    val k = (u + 99) / 100
    val top = counts.take(k.toInt).sum
    assert(r.getAs[Long]("n_users") == u && r.getAs[Long]("k") == k)
    assert(r.getAs[Long]("threshold_count") == counts(k.toInt - 1))
    assert(r.getAs[Long]("top_events") == top)
    assert(r.getAs[Long]("total_events") == counts.sum)
    assert(r.getAs[Long]("share_ppm") == top * 1000000L / counts.sum)
  }

  test("q199 leakage: pair counts partition the q37 verified pair set") {
    val out = Registry.queries("q199_split_leakage")(spark, dir).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Boolean]("is_leak"))).toMap
    val pairs = Registry.queries("q37_dedup_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.values.map(_._1).sum == pairs.length.toLong,
      "every verified pair lands in exactly one split cell")
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val b = f"${md(0) & 0xff}%02x"
      if (b < "cd") "train" else if (b < "e6") "val" else "test"
    }
    val want = pairs.groupBy(p => (split(p._1), split(p._2)))
      .map { case (kk, ps) => kk -> ps.size.toLong }
    assert(out.view.mapValues(_._1).toMap == want,
      "cell counts must match the production split function")
    assert(out.forall { case ((a, b), (_, leak)) => leak == (a != b) })
  }
}
