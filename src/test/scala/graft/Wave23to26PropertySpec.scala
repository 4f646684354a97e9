package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized referees for the wave-23/25 devices whose
  * hand-walked twins cover only fixed shapes: the KMV estimator
  * (q241) and the greedy compaction packer (q245) are replayed in
  * plain Scala over randomized inputs and must agree exactly. */
class Wave23to26PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------- q241

  private def kmvReferee(aParts: Set[Long], bParts: Set[Long])
      : (Long, Long, Long, Long) = {
    val K = 64; val M = 2147483648L
    def h(x: Long) = ((x % 1000000007L) * 2654435761L) % M
    val hA = aParts.map(h).toSeq.sorted.take(K)
    val hB = bParts.map(h).toSeq.sorted.take(K)
    val pool = (hA.map((_, 1L, 0L)) ++ hB.map((_, 0L, 1L)))
      .groupBy(_._1).map { case (hh, g) =>
        (hh, g.map(_._2).max, g.map(_._3).max) }.toSeq.sortBy(_._1)
    if (pool.isEmpty) return (0L, 0L, 0L, 0L)
    val d = pool.take(K)
    val theta = d.map(_._1).max
    val common = d.count(p => p._2 == 1L && p._3 == 1L).toLong
    val estUnion =
      if (pool.size >= K) (K - 1).toLong * M / theta else pool.size.toLong
    (pool.size.toLong, common, estUnion,
      common * estUnion / d.size.toLong)
  }

  test("q241 agrees with the replica on randomized set pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val ids = (1L to 4000L)
      val a = ids.filter(_ => rng.nextDouble() < 0.15).toSet
      val b = ids.filter(_ => rng.nextDouble() < 0.1).toSet ++
        a.filter(_ => rng.nextDouble() < 0.5) // force real overlap
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_w23p_").toString
      (a.toSeq.map((_, "R")) ++ b.toSeq.map((_, "A")))
        .toDF("l_partkey", "l_returnflag").coalesce(2)
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      val r = Registry.queries("q241_kmv_intersect")(spark, tmp)
        .collect().head
      val (poolN, common, estU, estI) = kmvReferee(a, b)
      assert(r.getAs[Long]("pool_n") == poolN, s"trial $trial pool")
      assert(r.getAs[Long]("common") == common, s"trial $trial common")
      assert(r.getAs[Long]("est_union") == estU, s"trial $trial estU")
      assert(r.getAs[Long]("est_inter") == estI, s"trial $trial estI")
      assert(r.getAs[Long]("exact_inter") == (a & b).size.toLong)
      // accuracy envelope for k=64 on sets this size: within 60% rel.
      val exact = (a & b).size.toLong
      assert(math.abs(estI - exact) <= math.max(20L, (exact * 6) / 10),
        s"trial $trial: estimate $estI vs exact $exact drifted")
    }
  }

  // ---------------------------------------------------------- q245

  test("q245 agrees with the greedy replay on randomized file sizes") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val files = for {
      src <- Seq("sA", "sB", "sC"); i <- 1 to 200
    } yield (src, i.toLong, 1L + rng.nextInt(6000).toLong)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_w23p_").toString
    files.toDF("source", "doc_id", "n_chars").coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // greedy replay: bin = exclusive running total div 4096
    val expected = files.groupBy(_._1).map { case (src, fs) =>
      val sizes = fs.sortBy(_._2).map(_._3)
      val before = sizes.scanLeft(0L)(_ + _).init
      val bins = before.map(_ / 4096L)
      val byBin = sizes.zip(bins).groupBy(_._2)
        .map { case (b, g) => b -> (g.size.toLong, g.map(_._1).sum) }
      val total = sizes.sum
      (src, (sizes.size.toLong, total, byBin.size.toLong,
        (total + 4095L) / 4096L,
        total * 1000000L / (byBin.size.toLong * 4096L),
        byBin.values.map(_._2).max, byBin.values.map(_._1).max))
    }
    val got = Registry.queries("q245_compaction_bins")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(got == expected, s"got=$got\nexp=$expected")
  }
}
