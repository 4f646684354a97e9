package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q106–q108: properties the DuckDB hash gate
  * cannot state — ground-truth recomputation in plain Scala, cross-query
  * conservation, and non-degeneracy of the calibrated cuts.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val GapUs = 30_000_000_000L

  test("q106 sessions == plain-Scala ground truth; gap law holds") {
    val out = Registry.queries("q106_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // ground truth: collect the raw events and sessionize imperatively
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = events.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc, us) => acc match {
          case head :: tail if us - head.head <= GapUs =>
            (us :: head) :: tail
          case _ => List(us) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (ss, i) =>
        (uid, i + 1L, ss.length.toLong, ss.min, ss.max)
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == truth,
      "sessionization disagrees with the imperative reimplementation")
    // the cut discriminates: neither one-session-per-user nor
    // one-session-per-event
    val nEvents = events.length.toLong
    val nUsers = events.map(_._1).distinct.length.toLong
    assert(out.length > nUsers && out.length < nEvents)
  }

  test("q109 streaming sessions == q106 batch, with cross-batch carry") {
    val batch = Registry.queries("q106_sessionize")(spark, dir).collect()
      .map(_.toSeq).toSeq
    val stream = Registry.queries("q109_stream_sessionize")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch, "streaming FSM diverges from the batch window")
    // cross-batch state carry: the replay slices the event-time range
    // into 4 equal micro-batches; at least one session must START in
    // one slice and END in a later one, or the FSM never exercised
    // carried state and the gate proves less than it claims
    val us = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts")).as("us")).collect().map(_.getLong(0))
    val (lo, hi) = (us.min, us.max)
    val step = (hi - lo) / 4 + 1
    def slice(u: Long): Long = (u - lo) / step
    val spanning = batch.count(r =>
      slice(r(3).asInstanceOf[Long]) != slice(r(4).asInstanceOf[Long]))
    assert(spanning > 0, "no session spans a micro-batch boundary")
  }

  test("q124 transformWithState sessions == q106 batch") {
    val tws = Registry.queries("q124_stream_sessions_tws")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = Registry.queries("q106_sessionize")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(tws == batch,
      "the typed-ValueState FSM diverges from the batch window")
  }

  test("q107 boilerplate: conservation vs q90's chunking and both-ways cut") {
    val out = Registry.queries("q107_boilerplate")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == docs, "one row per document")
    for (r <- out) {
      val nChunks = r.getLong(1); val nRemoved = r.getLong(2)
      val kept = r.getString(3)
      assert(nRemoved >= 0 && nRemoved <= nChunks)
      // kept_text holds exactly the surviving chunks: 20 tokens per
      // chunk except possibly one tail chunk per doc
      val keptTokens =
        if (kept.isEmpty) 0L else kept.split(" ").length.toLong
      val keptChunks = nChunks - nRemoved
      assert(keptTokens <= keptChunks * 20)
      assert(keptTokens > (keptChunks - 1) * 20 || keptChunks == 0)
    }
    // the df cut must remove something somewhere but never everything
    assert(out.map(_.getLong(2)).sum > 0, "rule removed nothing")
    assert(out.exists(_.getLong(2) == 0), "rule hit every document")
    // REMOVE-EVERYWHERE semantics: strictly stronger than q90's
    // keep-first — total kept tokens strictly below q90's kept stream
    val q90Kept = Registry.queries("q90_chunk_dedup")(spark, dir)
      .collect().map { r =>
        val t = r.getString(3)
        if (t.isEmpty) 0L else t.split(" ").length.toLong
      }.sum
    val q107Kept = out.map { r =>
      val t = r.getString(3)
      if (t.isEmpty) 0L else t.split(" ").length.toLong
    }.sum
    assert(q107Kept < q90Kept,
      "remove-everywhere must keep strictly less than keep-first")
  }

  test("q110 session pairs: support identities against q106") {
    val pairs = Registry.queries("q110_session_pairs")(spark, dir).collect()
    assert(pairs.nonEmpty)
    val nSessions = Registry.queries("q106_sessionize")(spark, dir).count()
    for (r <- pairs) {
      val (nPair, nA, nB, nS) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nS == nSessions, "pair table disagrees with q106 on sessions")
      // pair support can never exceed either singleton's support
      assert(nPair >= 1 && nPair <= math.min(nA, nB))
      assert(r.getLong(6) == nPair * 1000000L / nS, "support ppm identity")
      assert(r.getLong(7) > 0, "lift must be positive for observed pairs")
      assert(r.getString(0) < r.getString(1), "canonical a<b pair order")
    }
    // 5 event types all co-occur somewhere at this SF: full C(5,2) grid
    assert(pairs.length == 10)
  }

  test("q111 gram: symmetric PSD identities + power-iteration eigensolve") {
    val rows = Registry.queries("q111_embed_gram")(spark, dir).collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2)))
      .toMap
    val d = 64
    assert(rows.size == d * d)
    val g = Array.tabulate(d, d)((i, j) => rows((i, j)))
    for (i <- 0 until d; j <- 0 until d) {
      assert(g(i)(j) == g(j)(i), s"asymmetry at ($i,$j)")
      // Cauchy–Schwarz on the underlying integer vectors
      assert(g(i)(j).toDouble * g(i)(j) <= g(i)(i).toDouble * g(j)(j) + 1e-6)
    }
    assert((0 until d).forall(i => g(i)(i) >= 0), "diagonal must be >= 0")
    // dominant eigenpair by power iteration (driver-side: the matrix is
    // 64x64 by construction at ANY corpus size — that is the point of
    // the distributed Gram pass)
    var v = Array.fill(d)(1.0)
    var rayleigh = 0.0
    for (_ <- 1 to 200) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => g(i)(j).toDouble * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
      rayleigh = (0 until d).map(i =>
        (0 until d).map(j => v(i) * g(i)(j) * v(j)).sum).sum
    }
    // for a symmetric PSD matrix the top eigenvalue dominates every
    // diagonal entry; and the iterate must actually be an eigenvector
    val maxDiag = (0 until d).map(i => g(i)(i).toDouble).max
    assert(rayleigh >= maxDiag,
      s"top eigenvalue $rayleigh below max diagonal $maxDiag")
    val gv = Array.tabulate(d)(i =>
      (0 until d).map(j => g(i)(j).toDouble * v(j)).sum)
    val residual = math.sqrt(
      (0 until d).map(i => math.pow(gv(i) - rayleigh * v(i), 2)).sum)
    assert(residual <= 1e-6 * rayleigh, s"not an eigenpair: residual $residual")
  }

  test("q112 streaming moment maintenance == q85 batch z-scores") {
    val stream = Registry.queries("q112_stream_rate_anomaly")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = Registry.queries("q85_rate_anomaly")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty, "no anomalies at this SF would gate nothing")
    assert(stream == batch,
      "maintained additive moments diverge from the batch restatement")
  }

  test("q113 trend: BigInt-moment ground truth, zero mean residual") {
    val out = Registry.queries("q113_rate_trend")(spark, dir).collect()
    assert(out.nonEmpty)
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("x"))
      .groupBy(col("event_type"), col("x")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (r <- out) {
      val t = r.getString(0)
      val pts = hourly.filter(_._1 == t).map(p => (BigInt(p._2), BigInt(p._3)))
      val k = BigInt(pts.length)
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
      val intercept = (sy.toDouble - slope * sx.toDouble) / k.toDouble
      assert(r.getLong(1) == pts.length.toLong)
      assert(r.getDouble(2) == slope, s"$t slope mismatch")
      assert(r.getDouble(3) == intercept, s"$t intercept mismatch")
      // OLS first normal equation: residuals sum to ~0
      val resid = pts.map { case (x, y) =>
        y.toDouble - (slope * x.toDouble + intercept) }.sum
      assert(math.abs(resid) <= 1e-6 * sy.toDouble, s"$t residual $resid")
      assert(r.getBoolean(4) == (slope > 0.0))
    }
  }

  test("q114 histogram: bins partition the range and conserve counts") {
    val out = Registry.queries("q114_price_histogram")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    val totals = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((flag, rows) <- out.groupBy(_._1)) {
      assert(rows.map(_._3).sum == totals(flag), s"$flag count conservation")
      val sorted = rows.sortBy(_._2)
      for (r <- sorted) {
        assert(r._2 >= 0 && r._2 < 10)
        assert(r._4 <= r._5, s"bin ${r._2}: lo > hi")
      }
      // consecutive present bins tile without gap or overlap
      for (w <- sorted.sliding(2) if w.length == 2 && w(1)._2 == w(0)._2 + 1)
        assert(w(1)._4 == w(0)._5 + 1,
          s"$flag bins ${w(0)._2},${w(1)._2} don't tile")
    }
  }

  test("q121 built-in session_window == q106's analytic sessions") {
    val sw = Registry.queries("q121_session_window")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = Registry.queries("q106_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2))).toSet
    assert(sw == batch,
      "built-in session_window and the window restatement must agree " +
        "on (user, start, n)")
  }

  test("q122 triangles: brute-force ground truth on the edge set") {
    val edges = Registry.queries("q35_dedup_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = edges.toSet
    val truth = (for {
      (a, b) <- edges
      (b2, c) <- edges if b2 == b && eset.contains((a, c))
    } yield (a, b, c)).sorted.toSeq
    val out = Registry.queries("q122_triangles")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == truth, "triangle set diverges from brute force")
    for ((a, b, c) <- out) assert(a < b && b < c, "canonical orientation")
  }

  test("q108 zipf coverage: monotone, bounded, consistent with corpus") {
    val out = Registry.queries("q108_zipf_coverage")(spark, dir).collect()
    assert(out.length == 4, "ranks 1, 5, 10, 30 all exist")
    val ranks = out.map(_.getLong(0)).toSeq
    assert(ranks == Seq(1L, 5L, 10L, 30L))
    val cnts = out.map(_.getLong(2))
    assert(cnts.sameElements(cnts.sorted.reverse),
      "per-rank counts must be non-increasing")
    val cums = out.map(_.getLong(3))
    assert(cums.sameElements(cums.sorted), "coverage must be monotone")
    val total = out.map(_.getLong(4)).distinct
    assert(total.length == 1)
    val expectedTotal = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(total.head == expectedTotal, "total must be the corpus stream")
    // vocab is 31 words: rank 30 covers nearly everything but not all
    val ppm = out.map(_.getLong(5))
    assert(ppm.last < 1000000L && ppm.last > ppm.head)
    assert(cums.last < expectedTotal)
  }
}
