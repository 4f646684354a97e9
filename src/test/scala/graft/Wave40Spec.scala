package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 40: dHash near-dup vs an all-pairs
  * referee (which also pins real-decode == closed-form pixels), varint
  * posting-list arithmetic, dictionary-planner byte accounting, and a
  * Scala replica of the relational Bloom emulation. */
class Wave40Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the generative pixel formula (q273's closed form, kept in sync
  // with Wave40.dhashBands by the test below failing if they drift)
  private def gray(id: Long, w: Int, h: Int)(x: Int, y: Int): Int = {
    val base = id / 2
    val p = if (id % 2 == 1 && y * 2 >= h && (x + y) % 11 == 0) 96 else 0
    ((base * 7 + x.toLong * 31 + y.toLong * 17 + p) % 256).toInt
  }

  private def dhash(id: Long): Seq[Int] = {
    val base = id / 2
    val w = (base % 41 + 12).toInt
    val h = (base % 23 + 9).toInt
    def p(gx: Int, gy: Int): Int = gray(id, w, h)(gx * w / 9, gy * h / 8)
    (0 until 4).map { band =>
      var v = 0
      for (ry <- 0 until 2; gx <- 0 until 8) {
        val gy = band * 2 + ry
        if (p(gx + 1, gy) > p(gx, gy)) v |= 1 << (ry * 8 + gx)
      }
      v
    }
  }

  test("q273 matches the all-pairs dHash referee and finds the twins") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w40a_").toString
    val ids = (0L until 60L)
    ids.map(i => (i, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // referee: all-pairs Hamming over closed-form hashes; candidates
    // restricted to band-equal pairs exactly like the query
    val hs = ids.map(i => i -> dhash(i)).toMap
    def hamming(a: Long, b: Long): Int =
      (0 until 4).map(i => Integer.bitCount(hs(a)(i) ^ hs(b)(i))).sum
    val want = (for {
      a <- ids; b <- ids if a < b
      if (0 until 4).exists(i => hs(a)(i) == hs(b)(i)) // band candidate
      if hamming(a, b) <= 8
    } yield (a, b, hamming(a, b).toLong)).toSet

    val got = Registry.queries("q273_image_dhash_dedup")(spark, tmp)
      .collect()
    val gotPairs = got.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("hamming"))).toSet
    assert(gotPairs == want, s"got=$gotPairs want=$want")
    // every twin pair (2m, 2m+1) must be found: the perturbation only
    // touches the bottom half, so bands 0-1 are equal by construction
    val twins = want.count { case (a, b, _) => b - a == 1 && a % 2 == 0 }
    assert(twins == 30, s"twins found=$twins (perturbation too strong?)")
    assert(got.forall(_.getAs[Long]("n_twin_pairs") == 30L))
  }

  test("q274 varint byte accounting matches hand-computed postings") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w40b_").toString
    // term "aa": docs 5, 10, 300 -> gaps 5, 5, 290 -> varint 1+1+2 = 4
    // term "bb": docs 0, 200000 -> gaps 0, 200000 -> 1 + 3 = 4
    val docs = Seq((5L, "aa"), (10L, "aa"), (300L, "aa"),
      (0L, "bb"), (200000L, "bb"))
    docs.map { case (id, t) => (id, t, "en", "s", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Registry.queries("q274_postings_varint")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getAs[Long]("df"),
        r.getAs[Long]("raw_bytes"), r.getAs[Long]("delta_bytes"),
        r.getAs[Long]("max_gap"))).toList
    assert(got == List(("aa", 3L, 24L, 4L, 290L),
      ("bb", 2L, 16L, 4L, 200000L)), s"got=$got")
  }

  test("q275 dictionary accounting is exact on a hand-built column") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w40c_").toString
    // o_orderstatus: 10 rows over 3 distinct 1-byte values:
    //   raw = 10, dict values = 3, idx_bits = len(bin(2)) = 2,
    //   dict = 3 + ceil(20/8) = 6 -> wins
    val rows = (0 until 10).map { i =>
      (i.toLong, Seq("O", "F", "P")(i % 3), s"prio$i", (i % 4).toLong)
    }
    rows.toDF("o_orderkey", "o_orderstatus", "o_orderpriority",
      "o_custkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val st = Registry.queries("q275_dict_planner")(spark, tmp)
      .collect().find(_.getString(0) == "o_orderstatus").get
    assert(st.getAs[Long]("n_rows") == 10L)
    assert(st.getAs[Long]("ndv") == 3L)
    assert(st.getAs[Long]("raw_bytes") == 10L)
    assert(st.getAs[Long]("dict_value_bytes") == 3L)
    assert(st.getAs[Long]("idx_bits") == 2L)
    assert(st.getAs[Long]("dict_bytes") == 6L)
    assert(st.getAs[Boolean]("dict_wins"))
  }

  test("q276 equals a Scala replica of the double-hashed Bloom") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w40d_").toString
    val parts = (1L to 40L).map(p => (p, p)) // lineitem: partkeys 1..40
    parts.toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    (1L to 200L).map(o => Tuple1(o)).toDF("o_orderkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")

    def md5p(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
    }
    val members = (1L to 40L).map(p => s"k$p")
    val probes = (1L to 200L).map(o => s"p$o")
    val plans = Seq((8L, 6), (12L, 8), (16L, 11))
    val want = plans.map { case (bpk, k) =>
      val m = bpk * members.size
      def pos(key: String): Set[Long] = {
        val h1 = md5p("h1|" + key); val h2 = md5p("h2|" + key)
        (0 until k).map(i => (h1 + i * h2) % m).toSet
      }
      // NB: a probe is positive iff EVERY one of its k rows' position
      // is set (duplicate positions both count — same convention as
      // the query's count-of-hits == k)
      val bits = members.flatMap(pos).toSet
      val nFp = probes.count(p => pos(p).forall(bits))
      (bpk, k.toLong, nFp.toLong)
    }
    val got = Registry.queries("q276_bloom_audit")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("bits_per_key"),
        r.getAs[Long]("k"), r.getAs[Long]("n_fp")))
      .toList
    assert(got == want, s"got=$got want=$want")
  }
}
