package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 23 (q239–q241). */
class Wave23Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q239 FD repair counts equal the hand-built contingency") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w23_").toString
    // part 1: supp 10 x3 rows, supp 20 x1 -> violating, repair 1
    // part 2: supp 10 only x5 -> clean, excluded
    // part 3: supp 10 x2, supp 20 x2, supp 30 x1 -> repair 3
    val rows = Seq(
      (1L, 10L), (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 10L), (2L, 10L), (2L, 10L), (2L, 10L),
      (3L, 10L), (3L, 10L), (3L, 20L), (3L, 20L), (3L, 30L))
    rows.toDF("l_partkey", "l_suppkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q239_fd_violations")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // order: repair desc, n_supp desc, key
    assert(got == List((3L, 5L, 3L, 2L, 3L), (1L, 4L, 2L, 3L, 1L)))
  }

  test("q240 folds are the LCG high bits and ppm shares reconcile") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w23_").toString
    val docs = (0L until 400L).map(i =>
      (i, if (i % 3 == 0) "en" else "de"))
    docs.toDF("doc_id", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def fold(id: Long): Long =
      ((id % 1000000007L) * 1103515245L + 12345L) % 2147483648L / 268435456L
    val grid = docs.groupBy(d => (fold(d._1), d._2))
      .map { case (k, v) => k -> v.size.toLong }
    val foldN = grid.groupBy(_._1._1).map { case (f, m) =>
      f -> m.values.sum }
    val globalN = docs.groupBy(_._2).map { case (l, v) =>
      l -> v.size.toLong }
    val total = docs.size.toLong
    val got = Registry.queries("q240_stratified_folds")(spark, tmp)
      .collect()
    assert(got.length == grid.size)
    got.foreach { r =>
      val (f, l) = (r.getLong(0), r.getString(1))
      assert(r.getLong(2) == grid((f, l)), s"n mismatch at ($f,$l)")
      assert(r.getLong(3) == foldN(f))
      assert(r.getLong(4) == grid((f, l)) * 1000000L / foldN(f))
      assert(r.getLong(5) == globalN(l) * 1000000L / total)
      assert(r.getLong(6) == r.getLong(4) - r.getLong(5))
    }
    // folds must use the high bits: all 8 folds populated on 400 ids
    assert(got.map(_.getLong(0)).distinct.sorted.toList ==
      (0L to 7L).toList)
  }

  /** Scala replica of the KMV estimator, the exact referee for q241. */
  private def kmvReferee(aParts: Set[Long], bParts: Set[Long])
      : (Long, Long, Long, Long, Long) = {
    val K = 64; val M = 2147483648L
    def h(x: Long) = ((x % 1000000007L) * 2654435761L) % M
    val hA = aParts.map(h).toSeq.sorted.take(K)
    val hB = bParts.map(h).toSeq.sorted.take(K)
    val pool = (hA.map((_, 1L, 0L)) ++ hB.map((_, 0L, 1L)))
      .groupBy(_._1).map { case (hh, g) =>
        (hh, g.map(_._2).max, g.map(_._3).max) }.toSeq.sortBy(_._1)
    val d = pool.take(K)
    val theta = d.map(_._1).max
    val common = d.count(p => p._2 == 1L && p._3 == 1L).toLong
    val estUnion =
      if (pool.size >= K) (K - 1).toLong * M / theta else pool.size.toLong
    val estInter = common * estUnion / d.size.toLong
    (pool.size.toLong, theta, common, estUnion, estInter)
  }

  private def runKmv(parts: Seq[(Long, String)]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w23_").toString
    parts.toDF("l_partkey", "l_returnflag").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Registry.queries("q241_kmv_intersect")(spark, tmp).collect().head
  }

  test("q241 KMV estimate equals the Scala replica (sets > k)") {
    val a = (1L to 300L); val b = (101L to 300L)
    val r = runKmv(a.map((_, "R")) ++ b.map((_, "A")) ++
      Seq((999L, "N"))) // N rows must be ignored entirely
    val (poolN, theta, common, estU, estI) = kmvReferee(a.toSet, b.toSet)
    assert(r.getAs[Long]("pool_n") == poolN)
    assert(r.getAs[Long]("theta") == theta)
    assert(r.getAs[Long]("common") == common)
    assert(r.getAs[Long]("est_union") == estU)
    assert(r.getAs[Long]("est_inter") == estI)
    assert(r.getAs[Long]("exact_inter") == 200L)
    assert(r.getAs[Long]("exact_union") == 300L)
    // sanity: a k=64 sketch of J=2/3 sets lands within 50% relative error
    assert(math.abs(estI - 200L) <= 100L,
      s"estimate drifted: $estI vs exact 200")
  }

  test("q241 degenerates to exact when both sets fit inside k") {
    val a = (1L to 30L); val b = (21L to 50L)
    val r = runKmv(a.map((_, "R")) ++ b.map((_, "A")))
    assert(r.getAs[Long]("est_union") == r.getAs[Long]("exact_union"))
    assert(r.getAs[Long]("est_inter") == r.getAs[Long]("exact_inter"))
    assert(r.getAs[Long]("jacc_est_ppm") == r.getAs[Long]("jacc_exact_ppm"))
  }
}
