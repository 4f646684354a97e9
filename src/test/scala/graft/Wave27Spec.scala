package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 27 (q250–q251). */
class Wave27Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q250 pruning audit equals the hand-walked zone map") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w27_").toString
    // capacity 4096. srcA doc sizes in id order: 3000,2000,4000,100
    // -> bins: b0={3000,2000} max 3000; b1={4000}; b2={100}
    val rows = Seq(
      ("srcA", 1L, 3000L), ("srcA", 2L, 2000L), ("srcA", 3L, 4000L),
      ("srcA", 4L, 100L))
    rows.toDF("source", "doc_id", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.queries("q250_minmax_pruning")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    // T=1000: no bin prunable (maxes 3000,4000,100 -> b2 pruned!),
    //   scanned files = 3 (b0:2 + b1:1), matching = 3 (3000,2000,4000)
    // T=3000: pruned {b2}, scanned 3, matching 2 -> overread 333333
    // T=5000: all bins pruned except none (maxes < 5000 everywhere
    //   except b1 max 4000 < 5000 too) -> all 3 pruned, scanned 0
    assert(got == List(
      (1000L, 3L, 1L, 3L, 3L, 0L),
      (3000L, 3L, 1L, 3L, 2L, 333333L),
      (5000L, 3L, 3L, 0L, 0L, 0L)), s"got=$got")
  }

  test("q251 splits equal the single-node cumulative plan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w27_").toString
    // 20 keys x 3 rows each = 60 rows, B=8 -> ideal 7.5 rows/bucket
    val rows = for (k <- 1L to 20L; _ <- 1 to 3) yield (k, 1L)
    rows.toDF("l_partkey", "l_orderkey").coalesce(3)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q251_range_splits")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    // replay: cum(k)=3k, bucket=(3k-1)*8 div 60 + 1
    val buckets = (1L to 20L).groupBy(k => (3 * k - 1) * 8 / 60 + 1)
    val expected = buckets.toSeq.sortBy(_._1).map { case (b, ks) =>
      (b, ks.max, ks.size.toLong, ks.size.toLong * 3,
        (ks.size.toLong * 3 - 60 / 8) * 1000000 / 60)
    }.toList
    assert(got == expected, s"got=$got\nexp=$expected")
    // every row lands in exactly one bucket
    assert(got.map(_._4).sum == 60L)
    // a mega-key stays whole: one key holding half the rows
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_w27_")
      .toString
    val skew = (Seq.fill(30)((5L, 1L)) ++ (6L to 35L).map((_, 1L)))
    skew.toDF("l_partkey", "l_orderkey").coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp2/lineitem.parquet")
    val g2 = Registry.queries("q251_range_splits")(spark, tmp2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(g2.map(_._3).sum == 60L)
    val megaBucket = g2.find(_._2 == 5L).get
    assert(megaBucket._3 >= 30L) // key 5's 30 rows are unsplit
  }

  test("q250/q251 are empty-input-safe") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w27_").toString
    Seq.empty[(String, Long, Long)].toDF("source", "doc_id", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    Seq.empty[(Long, Long)].toDF("l_partkey", "l_orderkey")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    assert(Registry.queries("q250_minmax_pruning")(spark, tmp)
      .collect().isEmpty) // no bins -> no thresholds survive the join
    assert(Registry.queries("q251_range_splits")(spark, tmp)
      .collect().isEmpty) // no keys -> no buckets
  }
}
