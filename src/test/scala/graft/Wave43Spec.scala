package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HilbertIndex2

/** Referees for wave 43: the Hilbert expression against its inverse
  * (bijectivity + locality), the layout audit against a single-node
  * replica, and the CMS audit against an exact sketch replica. */
class Wave43Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_hilbert2: d2xy round-trips on 65k samples; unit steps are adjacent") {
    // bijectivity: xy2d(d2xy(d)) == d over a stride sample of the full
    // 2^32 key space plus the dense low range
    val ds = (0L until 65536L) ++
      (0L until (1L << 32) by 65537L) // coprime stride hits mixed bits
    for (d <- ds) {
      val (x, y) = HilbertIndex2.d2xy(d)
      assert(HilbertIndex2.xy2d(x, y) == d, s"round-trip failed at d=$d")
    }
    // locality (the property Morton lacks): consecutive d are always
    // Manhattan-adjacent cells
    for (d <- 0L until 4096L) {
      val (x1, y1) = HilbertIndex2.d2xy(d)
      val (x2, y2) = HilbertIndex2.d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step at d=$d")
    }
    // corners of the classic orientation
    assert(HilbertIndex2.xy2d(0L, 0L) == 0L)
    assert(HilbertIndex2.xy2d(65535L, 0L) == (1L << 32) - 1L)
    intercept[IllegalArgumentException](HilbertIndex2.xy2d(65536L, 0L))
    intercept[IllegalArgumentException](HilbertIndex2.xy2d(0L, -1L))
  }

  test("graft_hilbert2: codegen path equals the interpreted replica (SQL-registered)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val pts = (1 to 2000).map(_ =>
      (rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .selectExpr("x", "y", "graft_hilbert2(x, y) AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((x, y, d) <- got)
      assert(d == HilbertIndex2.xy2d(x, y), s"mismatch at ($x, $y)")
  }

  test("q284 matches a single-node replica and Hilbert beats Morton on box area") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w43a_").toString
    val rng = new scala.util.Random(13)
    val rows = (1 to 4000).map { i =>
      (i.toLong, rng.nextInt(500).toLong + 1L, rng.nextInt(200).toLong + 1L,
        1, 1.0)
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    def z(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    val pkMx = rows.map(_._2).max; val skMx = rows.map(_._3).max
    val pts = rows.map { case (_, p, s, _, _) =>
      (p * 65536L / (pkMx + 1), s * 65536L / (skMx + 1), p, s)
    }
    def replica(key: (Long, Long) => Long): (Map[Long, (Long, Long, Long)], Long) = {
      val sorted = pts.map { case (x, y, p, s) => (key(x, y), p, s) }
        .sortBy(t => (t._1, t._2, t._3))
      val n = sorted.size
      val byFile = sorted.zipWithIndex.groupBy {
        case (_, i) => i.toLong * 64L / n
      }
      val stats = byFile.map { case (f, xs) =>
        val ps = xs.map(_._1._2); val ss = xs.map(_._1._3)
        val area = (ps.max - ps.min + 1) * (ss.max - ss.min + 1)
        f -> (xs.size.toLong, area, area)
      }
      (stats, stats.values.map(_._2).sum)
    }
    val (hStats, hTot) = replica(HilbertIndex2.xy2d)
    val (zStats, zTot) = replica(z)
    assert(hTot < zTot, s"expected Hilbert < Morton, got $hTot vs $zTot")

    val got = Registry.queries("q284_hilbert_audit")(spark, tmp).collect()
    assert(got.length == 128)
    for (r <- got) {
      val stats = if (r.getString(0) == "hilbert") hStats else zStats
      val f = r.getAs[Long]("file")
      assert(r.getAs[Long]("n_rows") == stats(f)._1, s"rows at $f")
      assert(r.getAs[Long]("area") == stats(f)._2,
        s"${r.getString(0)} area at file $f")
      assert(r.getAs[Long]("total_area") ==
        (if (r.getString(0) == "hilbert") hTot else zTot))
    }
  }

  test("q285 matches an exact CMS replica and never underestimates") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w43b_").toString
    val rng = new scala.util.Random(17)
    val vocab = (0 until 400).map(i => s"w$i")
    val docs = (0 until 300).map { i =>
      val words = (0 until 30).map(_ => vocab(rng.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def kh(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(12), 16)
    val A = Seq(31L, 131L, 313L, 1009L); val B = Seq(7L, 911L, 4507L, 8191L)
    val P = 2147483647L; val W = 256L
    val exact = docs.flatMap { case (_, t) =>
      val ws = t.split(" ")
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" "))
    }.groupBy(identity).map { case (sh, xs) => sh -> xs.size.toLong }
    val counters = A.indices.map { i =>
      exact.toSeq.groupBy { case (sh, _) =>
        ((A(i) * kh(sh) + B(i)) % P) % W
      }.map { case (b, xs) => b -> xs.map(_._2).sum }
    }
    val top = exact.toSeq.sortBy { case (sh, c) => (-c, sh) }.take(20)
    val want = top.zipWithIndex.map { case ((sh, c), i) =>
      val est = A.indices.map(j =>
        counters(j)(((A(j) * kh(sh) + B(j)) % P) % W)).min
      (i + 1L, sh, c, est, (est - c) * 1000000L / c)
    }
    val got = Registry.queries("q285_cms_audit")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got == want.toList, s"got=$got want=$want")
    assert(got.forall(t => t._4 >= t._3)) // CMS never underestimates
  }
}
