package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 19 (q227–q230): each operator's device —
  * deletion-1 blocking, Morton interleave, the distributed sweep-line,
  * saturating-tf scoring — is checked against a direct Scala
  * recomputation on a fixture small enough to enumerate. */
class Wave19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dirWith(table: String)(write: String => Unit): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w19_").toString
    write(s"$tmp/$table.parquet")
    tmp
  }

  // Levenshtein, the textbook DP — the independent referee for q227.
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q227 deletion-1 blocking finds EXACTLY the brute-force distance<=1 pairs") {
    import spark.implicits._
    val names = Seq("cart", "card", "carts", "art", "dart", "lamp",
      "lamps", "clamp", "wholly-unrelated-name", "house", "mouse",
      "mousse", "abcd", "abed", "abef")
    val dir = dirWith("customer") { p =>
      names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("c_custkey", "c_name").coalesce(1)
        .write.mode("overwrite").parquet(p)
    }
    // the query reports top-20 neighbor counts; recompute from the
    // brute-force pair set under the same [4, 24] length cap ("art"
    // is deliberately below it — the cap must drop it on both sides)
    val capped = names.filter(n => n.length >= 4 && n.length <= 24)
    val bfPairs = for {
      a <- capped; b <- capped if a < b && lev(a, b) <= 1
    } yield (a, b)
    val bfCounts = bfPairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (w, l) => (w, l.size.toLong) }
    val expected = bfCounts.toSeq
      .sortBy { case (w, n) => (-n, w) }.take(20).zipWithIndex
      .map { case ((w, n), i) => (i + 1, w, n) }.toSet
    val got = Registry.queries("q227_typo_join")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, s"got=$got\nexpected=$expected")
    // sanity on the fixture itself: blocking has real work to do here
    assert(bfPairs.nonEmpty && bfCounts.values.max >= 2)
  }

  test("graft_within_edit1 agrees with levenshtein <= 1 on an exhaustive small alphabet") {
    // every pair of strings over {a,b} up to length 4 (1364^2 ordered
    // pairs cover equal/off-by-one/off-by-many lengths, all edit shapes)
    val alphabet = Seq("a", "b")
    val strings = (0 to 4).flatMap(n =>
      (0 until math.pow(2, n).toInt).map(i =>
        (0 until n).map(j => alphabet((i >> j) & 1)).mkString))
    import org.apache.spark.unsafe.types.UTF8String
    for (a <- strings; b <- strings) {
      val got = graft.functions.WithinEdit1.check(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == (lev(a, b) <= 1), s"'$a' vs '$b': got $got, lev=${lev(a, b)}")
    }
  }

  test("q228's div/mod interleave equals the bit-twiddling Morton code") {
    def morton(a: Int, b: Int): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((a >> i) & 1).toLong << (2 * i)) |
          (((b >> i) & 1).toLong << (2 * i + 1))
      z
    }
    import spark.implicits._
    // deterministic pseudo-random 16-bit pairs
    val pairs = (0 until 500).map(i =>
      ((i * 2654435761L % 65536).toInt, (i * 40503L % 65536).toInt))
    val zSql = (0 until 16).map { i =>
      s"(((a) div ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + (((b) div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val got = pairs.toDF("a", "b").withColumn("z", expr(zSql))
      .collect().map(_.getAs[Long]("z"))
    assert(got.toSeq == pairs.map { case (a, b) => morton(a, b) },
      "div/mod interleave diverged from bit twiddling")
  }

  test("q229 peak concurrency equals the brute-force interval sweep") {
    import spark.implicits._
    // sessions (30-min gap): u1 has two sessions of one type that
    // overlap u2's and u3's; 'click' has a lone single-event session
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 600L), // s1: [0, 600]
      (2L, "view", 300L), (2L, "view", 900L), // s2: [300, 900]
      (3L, "view", 500L), // s3: [500, 500]
      (1L, "view", 10000L), // s4 (new session, gap > 1800): [10000]
      (9L, "click", 50L)) // lone click session
      .map { case (u, t, sec) => (u, t, sec * 1000000L) }
    val dir = dirWith("events") { p =>
      ev.zipWithIndex
        .map { case ((u, t, us), i) => (i.toLong, u, t, 1.0, us) }
        .toDF("event_id", "user_id", "event_type", "value", "us")
        .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
    // brute force: sessionize per (user, type), sweep with end-exclusive
    // +1µs ends, track the running maximum
    def bruteforce(t: String): (Long, Long) = {
      val sessions = ev.filter(_._2 == t).groupBy(_._1).toSeq.flatMap {
        case (_, es) =>
          val ts = es.map(_._3).sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          var (s0, last) = (ts.head, ts.head)
          for (x <- ts.tail) {
            if (x - last > 1800L * 1000000L) { out += ((s0, last + 1)); s0 = x }
            last = x
          }
          out += ((s0, last + 1))
          out.toSeq
      }
      val deltas = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var (run, peak, peakAt) = (0L, Long.MinValue, 0L)
      for ((t0, dv) <- deltas) {
        run += dv
        if (run > peak) { peak = run; peakAt = t0 }
      }
      (peak, peakAt)
    }
    val got = Registry.queries("q229_peak_concurrency")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set("view", "click").map(t =>
      (t, bruteforce(t)._1, bruteforce(t)._2))
    assert(got == expected, s"got=$got\nexpected=$expected")
    // 3 view sessions overlap at t=500s: peak must be 3 there
    assert(got.contains(("view", 3L, 500L * 1000000L)))
  }

  test("q230 scores equal the brute-force saturating-tf computation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha beta x"),
      (2L, "alpha beta beta gamma y"),
      (3L, "gamma gamma delta z"),
      (4L, "delta epsilon w"))
    val dir = dirWith("documents") { p =>
      docs.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(p)
    }
    val words = docs.flatMap { case (id, t) => t.split(" ").map((id, _)) }
    val df = words.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val terms = df.toSeq.sortBy { case (w, d) => (-d, w) }.take(3)
    val n = docs.size.toLong
    val expected = docs.map { case (id, t) =>
      val tfs = terms.flatMap { case (w, d) =>
        val tf = t.split(" ").count(_ == w).toLong
        if (tf == 0) None
        else Some((n * 1000000L / d) * (tf * 1000L / (tf + 2)))
      }
      (id, tfs.sum, tfs.size.toLong)
    }.filter(_._3 > 0).sortBy { case (id, sc, _) => (-sc, id) }
      .zipWithIndex.map { case ((id, sc, k), i) => (i + 1, id, sc, k) }.toSet
    val got = Registry.queries("q230_bm25_topk")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected, s"got=$got\nexpected=$expected")
  }

  test("Ranks.prefixSum equals the window cumulative sum it replaces") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (s"g${i % 3}", (i * 7919) % 1000, ((i * 104729) % 21) - 10L))
    val df = rows.toDF("g", "t", "v")
      .groupBy(col("g"), col("t")).agg(sum(col("v")).as("v")) // unique keys
    val viaDevice = graft.util.Ranks.prefixSum(df, Seq("g"),
      Seq(col("t")), col("v"), "run")
      .select(col("g"), col("t"), col("run"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = df.withColumn("run", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("t"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .select(col("g"), col("t"), col("run"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaDevice == viaWindow)
  }
}
