package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 34: MMR greedy replay (and the
  * diversification property itself), and streaming==batch parity for
  * the audio decode-health audit. */
class Wave34Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q261 equals an independent greedy replay and actually diversifies") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w34a_").toString
    // query = vec 0. vec 1 and 2 are near-duplicates highly relevant;
    // vec 3 is less relevant but orthogonal-ish; vecs 4..9 fill.
    val dim = 64
    def v(entries: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(dim)(0f)
      entries.foreach { case (i, x) => a(i) = x }
      a.toSeq
    }
    // 2 is a near-duplicate of 1 (same off-query direction); 3 has the
    // SAME relevance ballpark but an orthogonal off-query direction, so
    // at λ = 0.7 the redundancy penalty must demote 2 below 3
    val vecs = Seq(
      (0L, v(0 -> 1f)), // the query
      (1L, v(0 -> 0.9f, 1 -> 0.4f)),
      (2L, v(0 -> 0.9f, 1 -> 0.39f)), // near-dup of 1
      (3L, v(0 -> 0.89f, 2 -> 0.4f)), // equally relevant, diverse
      (4L, v(0 -> 0.45f, 3 -> 0.7f)),
      (5L, v(0 -> 0.4f, 4 -> 0.9f)),
      (6L, v(0 -> 0.3f, 5 -> 0.6f)),
      (7L, v(0 -> 0.2f, 6 -> 0.5f)),
      (8L, v(0 -> 0.1f, 7 -> 0.4f)),
      (9L, v(1 -> 1f)))
    vecs.map { case (id, e) => (id, e, 0) }
      .toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    // independent replay on the same integer grid
    val grid = vecs.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1024).toLong).toArray
    }.toMap
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val q = grid(0L)
    var pool = vecs.map(_._1).filter(_ != 0L)
      .map(id => (id, dot(grid(id), q)))
      .sortBy { case (id, r) => (-r, id) }.take(64)
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    val want = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    for (k <- 1 to math.min(10, pool.size)) {
      val scored = pool.filterNot(p => sel.contains(p._1)).map {
        case (id, r) =>
          val ms = if (sel.isEmpty) 0L
            else sel.map(sid => dot(grid(id), grid(sid))).max
          (id, r, ms, 7 * r - 3 * ms)
      }
      val best = scored.minBy { case (id, _, _, m) => (-m, id) }
      want += ((k.toLong, best._1, best._2, best._3, best._4))
      sel += best._1
    }
    val got = Registry.queries("q261_mmr_rerank")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want.toSeq, s"\n got=$got\nwant=$want")
    // the diversification property: after picking 1 (top relevance),
    // MMR must NOT pick its near-duplicate 2 next — pure-relevance
    // order would; vec 3 (diverse) must come before vec 2
    val order = got.map(_._2)
    assert(order.head == 1L)
    assert(order.indexOf(3L) < order.indexOf(2L),
      s"near-duplicate was not demoted: $order")
  }

  test("q262 streaming report equals q257's batch report") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w34b_").toString
    val docs = (0L until 40L).map(i =>
      (i, s"src${i % 3}", 30L + i * 7 % 50))
    docs.toDF("doc_id", "source", "n_chars").coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batch = Registry.queries("q257_wav_health")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val stream = Registry.queries("q262_stream_wav_health")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(stream == batch, s"\nstream=$stream\n batch=$batch")
    assert(batch.nonEmpty && batch.map(_._3).sum > 0, "no corrupt rows?")
  }
}
