package graft

import org.scalatest.funsuite.AnyFunSuite

/** Twin for q269: tree-consistency invariants plus the property the
  * operator exists for — a single-row divergence between two replicas
  * flips exactly one leaf, its mid node, and the root. */
class Wave38Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def write(tmp: String,
      rows: Seq[(Long, Long, Long, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .coalesce(2).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
  }

  private def tree(tmp: String): Map[(Long, Long), (Long, BigDecimal)] =
    Registry.queries("q269_merkle_digest")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_rows"), BigDecimal(r.getAs[String]("digest_s")))))
      .toMap

  test("q269 tree levels are mutually consistent sums") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w38_").toString
    val rows = (1L to 500L).map(i => (i, i % 37, i % 11, (i % 50 + 1).toDouble))
    write(tmp, rows)
    val t = tree(tmp)
    val leaves = t.collect { case ((2L, n), v) => n -> v }
    val mids = t.collect { case ((1L, n), v) => n -> v }
    val root = t((0L, 0L))
    assert(root._1 == 500L)
    assert(root._2 == leaves.values.map(_._2).sum)
    assert(root._2 == mids.values.map(_._2).sum)
    for ((m, (nc, d)) <- mids) {
      val mine = leaves.filter { case (leaf, _) => leaf / 8 == m }
      assert(nc == mine.values.map(_._1).sum, s"mid $m row count")
      assert(d == mine.values.map(_._2).sum, s"mid $m digest")
    }
  }

  test("a one-row divergence flips exactly one leaf, one mid, the root") {
    val tmpA = java.nio.file.Files.createTempDirectory("graft_w38a_").toString
    val tmpB = java.nio.file.Files.createTempDirectory("graft_w38b_").toString
    val rows = (1L to 500L).map(i => (i, i % 37, i % 11, (i % 50 + 1).toDouble))
    write(tmpA, rows)
    // replica B silently corrupted one row's partkey (same key range)
    write(tmpB, rows.map { case r @ (ok, pk, sk, q) =>
      if (ok == 250L) (ok, pk + 1, sk, q) else r
    })
    val (a, b) = (tree(tmpA), tree(tmpB))
    assert(a.keySet == b.keySet)
    val diverged = a.keySet.filter(k => a(k)._2 != b(k)._2).toSeq.sorted
    assert(diverged.map(_._1).sorted == Seq(0L, 1L, 2L),
      s"expected one node per level, got $diverged")
    // counts agree everywhere (content diverged, not cardinality)
    assert(a.forall { case (k, (n, _)) => b(k)._1 == n })
    // and the diverged leaf sits under the diverged mid
    val leaf = diverged.find(_._1 == 2L).get._2
    val mid = diverged.find(_._1 == 1L).get._2
    assert(leaf / 8 == mid)
  }
}
