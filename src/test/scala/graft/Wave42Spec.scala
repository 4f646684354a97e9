package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referees for wave 42: the fuzzy join against a brute-force
  * Levenshtein replica (including the insertion case that needs the
  * i=0 original-string variant), the skyline against an O(n²)
  * dominance check, the changepoint against exact BigInt split
  * scoring, and the survival table against a hand-built cohort. */
class Wave42Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q280 equals brute-force ed<=1 pairs; insertion/deletion/substitution all block") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w42a_").toString
    // substitution (abcd/abed), deletion/insertion (abcd/abcde),
    // exact-at-distance-2 decoy (abcd/axyd), cross-nation decoy
    // (abcd in nation 2), and an identical-name pair (ed=0)
    val rows = Seq(
      (1L, "abcd", 1), (2L, "abed", 1), (3L, "abcde", 1),
      (4L, "axyd", 1), (5L, "abcd", 2), (6L, "abcd", 1),
      (7L, "zz", 1), (8L, "z", 1))
    rows.toDF("c_custkey", "c_name", "c_nationkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val want = (for {
      (k1, n1, nat1) <- rows; (k2, n2, nat2) <- rows
      if nat1 == nat2 && k1 < k2 && lev(n1, n2) <= 1
    } yield (k1, k2, n1, n2, lev(n1, n2).toLong)).sortBy(t => (t._1, t._2))
    val got = Registry.queries("q280_fuzzy_name_join")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList
    assert(got == want.toList, s"got=$got want=$want")
    // the insertion pair (1,3) is present -> the i=0 original variant
    // participated in blocking; the distance-2 decoy (1,4) is absent
    assert(got.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!got.exists(p => p._1 == 1L && p._2 == 4L))
    assert(!got.exists(p => p._2 == 5L)) // nations block
  }

  test("q281 equals the O(n^2) dominance referee incl. price and size ties") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w42b_").toString
    val rng = new scala.util.Random(7)
    val pts = (1L to 300L).map { k =>
      (k, s"part$k", (rng.nextInt(40) + 1) * 1.25, rng.nextInt(12) + 1)
    } ++ Seq( // exact duplicates: both must survive if undominated
      (301L, "dupA", 1.25, 12), (302L, "dupB", 1.25, 12))
    pts.toDF("p_partkey", "p_name", "p_retailprice", "p_size").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val want = pts.filter { case (_, _, pr, sz) =>
      !pts.exists { case (_, _, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(t => (t._1, t._4.toLong)).sortBy(_._1)
    val got = Registry.queries("q281_skyline")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("p_size"))).toList
    assert(got == want.toList, s"got=$got want=$want")
    assert(got.exists(_._1 == 301L) && got.exists(_._1 == 302L))
  }

  test("q282 equals exact BigInt split scoring and flags the smallest argmax") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w42c_").toString
    // level shift after day 40: mean 5 -> mean 9 (plus deterministic
    // ripple so scores are not all tied)
    val days = (1 to 80).flatMap { d =>
      val n = (if (d <= 40) 5 else 9) + (d % 3)
      (1 to n).map(i => (d.toLong * 100 + i,
        java.sql.Timestamp.valueOf(f"1995-01-01 00:00:00")
          .toLocalDateTime.plusDays(d - 1)))
    }
    days.map { case (k, dt) =>
      (k, java.sql.Timestamp.valueOf(dt))
    }.toDF("o_orderkey", "o_orderdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val y = (1 to 80).map(d => BigInt((if (d <= 40) 5 else 9) + (d % 3)))
    val n = y.size; val st = y.sum
    val scores = (1 until n).map { k =>
      val sl = y.take(k).sum; val sr = st - sl
      (k.toLong,
        (sl * sl * (n - k) + sr * sr * k) * 1000000 /
          (BigInt(k) * (n - k)))
    }
    val best = scores.maxBy(t => (t._2, -t._1))._1
    assert(best == 40L) // the planted shift
    val got = Registry.queries("q282_changepoint")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("score_e6"),
        r.getAs[Boolean]("is_best"))).toList
    assert(got.map(t => (t._1, BigInt(t._2))) == scores.toList)
    assert(got.filter(_._3).map(_._1) == List(best))
  }

  test("q283 equals the hand cohort: buckets, risk sets, censoring, hazard") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w42d_").toString
    val day0 = java.time.LocalDate.of(1995, 1, 1)
    def ts(d: Int) = java.sql.Timestamp.valueOf(day0.plusDays(d).atStartOfDay)
    // corpus end = day 400. spans: c1 0..100 (gap 300 -> event,
    // bucket 3), c2 0..350 (gap 50 -> censored, bucket 11),
    // c3 10..10 (gap 390 -> event, bucket 0), c4 0..400 (gap 0 ->
    // censored, bucket 13)
    val orders = Seq((1L, 0), (1L, 100), (2L, 0), (2L, 350), (3L, 10),
      (4L, 0), (4L, 400))
    orders.zipWithIndex.map { case ((c, d), i) => (i.toLong, c, ts(d)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Registry.queries("q283_survival_table")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_event"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("hazard_ppm"))).toList
    // buckets present: 0 (c3 event), 3 (c1 event), 11 (c2 censored),
    // 13 (c4 censored); risk = customers with bucket >= b
    assert(got == List(
      (0L, 4L, 1L, 0L, 250000L),
      (3L, 3L, 1L, 0L, 333333L),
      (11L, 2L, 0L, 1L, 0L),
      (13L, 1L, 0L, 1L, 0L)), s"got=$got")
  }
}
