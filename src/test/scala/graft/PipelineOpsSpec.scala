package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-5 pipeline additions (q89–q93):
  * properties the DuckDB hash gate cannot state (it proves equality with
  * the oracle; these prove the oracle itself means what it claims).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q89 semantic dedup: no same-cell pair above threshold keeps both") {
    val out = Registry.queries("q89_semantic_dedup")(spark, dir).collect()
    assert(out.forall(r => r.getLong(2) == 0L || r.getLong(2) == 1L))
    // exactly the corpus, once each
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = out.filter(_.getLong(2) == 0L).map(_.getLong(0)).toSet
    // recompute exact cosines for all same-cell pairs; among any pair
    // >= threshold at most one side may survive
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = out.map(_.getLong(0))
    val offenders = for {
      i <- ids; j <- ids
      if i < j && cellOf(i) == cellOf(j)
      if cos(vecs(i), vecs(j)) >= 0.4
      if kept(i) && kept(j)
    } yield (i, j)
    assert(offenders.isEmpty,
      s"same-cell pairs over threshold with BOTH copies kept: $offenders")
    // and something must actually be deduplicated at this threshold
    assert(out.exists(_.getLong(2) == 1L), "gate threshold marked no dups")
  }

  test("q90 chunk dedup: each distinct chunk survives exactly once") {
    val out = Registry.queries("q90_chunk_dedup")(spark, dir)
    val rows = out.collect()
    // kept counts bound by chunk counts, and at least one chunk dropped
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.map(_.getLong(1)).sum > rows.map(_.getLong(2)).sum,
      "corpus has duplicate chunks; dedup must drop some")
    // global invariant: #kept chunks == #distinct chunks in the corpus
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(posexplode(expr(
        "transform(sequence(0, CAST(ceil(size(ws) / 10.0) AS INT) - 1), i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"))
        .as(Seq("idx", "chunk")))
    val nDistinct = docs.select(col("chunk")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == nDistinct,
      "every distinct chunk must survive exactly once")
    // a doc whose chunks are all first-occurrences is byte-identical
    val firstDoc = rows.minBy(_.getLong(0))
    if (firstDoc.getLong(1) == firstDoc.getLong(2)) {
      val orig = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") === firstDoc.getLong(0))
        .select(col("text")).collect().head.getString(0)
      assert(firstDoc.getString(3) == orig)
    }
  }

  test("q91 bigram LM: positions, bounds, and integer-average identity") {
    val out = Registry.queries("q91_bigram_lm")(spark, dir).collect()
    val tokCount = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      val (doc, nBi, sum, avg) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nBi == tokCount(doc) - 1, s"doc $doc: bigram count wrong")
      assert(avg == sum / nBi, s"doc $doc: average is not the integer mean")
      // each ppm term is <= 1e6 (c2 <= c1 by construction)
      assert(avg >= 0 && avg <= 1000000L)
    }
    // the score must discriminate (not constant across docs)
    assert(out.map(_.getLong(3)).distinct.length > 1)
  }

  test("q92 canonical selection agrees with q52 clusters and keeps the longest") {
    val canon = Registry.queries("q92_cluster_canonical")(spark, dir).collect()
    val clusters = Registry.queries("q52_dedup_clusters")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = clusters.groupBy(_._2)
    val chars = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon.length == byCluster.size)
    canon.foreach { r =>
      val (cid, size, keeper, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = byCluster(cid).map(_._1)
      assert(size == members.length && dropped == size - 1)
      assert(members.contains(keeper))
      val best = members.map(chars).max
      assert(chars(keeper) == best, s"cluster $cid keeper is not longest")
      assert(members.filter(m => chars(m) == best).min == keeper,
        s"cluster $cid tie must break to the lower id")
    }
  }

  test("q94 group sample: k-per-language through the bounded-heap plan") {
    val df = Registry.queries("q94_group_sample")(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "sampling must execute through the custom bounded-heap plan")
    val rows = df.collect()
    val langSizes = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet == langSizes.keySet)
    byLang.foreach { case (lang, sampled) =>
      assert(sampled.length == math.min(20L, langSizes(lang)),
        s"$lang: expected min(20, n) sampled docs")
      // ids are distinct and drawn from the language's own docs
      assert(sampled.map(_.getLong(1)).distinct.length == sampled.length)
    }
    // reproducible across re-runs (the reservoir-sampling property a
    // hash-rank sample adds)
    val again = Registry.queries("q94_group_sample")(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q95 quality ensemble: dense ranks, ppm bounds, best-doc identity") {
    val rows = Registry.queries("q95_quality_ensemble")(spark, dir).collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, docs) =>
      val n = docs.length
      assert(docs.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq,
        s"$lang: a_rank must be a dense 1..n permutation")
      assert(docs.map(_.getLong(3)).sorted.toSeq == (1L to n).toSeq,
        s"$lang: b_rank must be a dense 1..n permutation")
      docs.foreach { d =>
        assert(d.getLong(4) >= 0 && d.getLong(4) <= 1000000L)
      }
      // a doc ranked best on BOTH signals blends to exactly 0 ppm
      docs.find(d => d.getLong(2) == 1L && d.getLong(3) == 1L)
        .foreach(d => assert(d.getLong(4) == 0L))
      // blend is the integer mean of the two normalized ranks
      docs.foreach { d =>
        val exp = ((d.getLong(2) - 1) * 1000000L / (n - 1) +
          (d.getLong(3) - 1) * 1000000L / (n - 1)) / 2
        assert(d.getLong(4) == exp)
      }
    }
  }

  test("q96 sequence packing: full sequences, conserved tokens, dense ids") {
    val rows = Registry.queries("q96_sequence_packing")(spark, dir).collect()
    val totalTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    // token conservation: packing moves every token exactly once
    assert(rows.map(_.getLong(3)).sum == totalTokens)
    rows.groupBy(_.getLong(0)).foreach { case (shard, seqs) =>
      val ids = seqs.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until seqs.length).toSeq,
        s"shard $shard: sequence ids must be dense 0..n-1")
      // every sequence is exactly full except possibly the shard's last
      val last = ids.last
      seqs.foreach { r =>
        if (r.getLong(1) != last)
          assert(r.getLong(3) == 128L,
            s"shard $shard seq ${r.getLong(1)}: interior sequence not full")
        else assert(r.getLong(3) <= 128L && r.getLong(3) >= 1L)
        assert(r.getLong(2) >= 1L)
      }
    }
  }

  test("q97 BPE training: monotone counts, shrinking corpus, exact bookkeeping") {
    val rows = Registry.queries("q97_bpe_train")(spark, dir).collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(3))
    // later merges can never beat earlier ones (argmax monotonicity)
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
    // each merge round shrinks the symbol corpus by EXACTLY the number
    // of merges applied, which is <= the pair count (overlaps in runs)
    val initial = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
        .collect().head.getLong(0)
    }
    val sizes = initial +: rows.map(_.getLong(4))
    sizes.zip(sizes.tail).zip(counts).foreach { case ((before, after), c) =>
      val merged = before - after
      assert(merged >= 1 && merged <= c,
        s"round must apply between 1 and pair_count merges, got $merged of $c")
    }
    // learned symbols are real concatenations
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty)
    }
  }

  test("q93 epoch shuffle: a reproducible permutation with dense shard positions") {
    val a = Registry.queries("q93_epoch_shuffle")(spark, dir).collect()
    val b = Registry.queries("q93_epoch_shuffle")(spark, dir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      "epoch shuffle must be identical across re-runs")
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(a.length == n && a.map(_.getLong(0)).distinct.length == a.length)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 8)
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must be dense 1..n")
    }
    // the shuffle actually permutes: doc order by (shard, pos) differs
    // from doc-id order
    val shuffled = a.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(0))
    assert(shuffled.toSeq != shuffled.sorted.toSeq)
  }

  test("q98 substring spans match a plain-Scala suffix-scan reimplementation") {
    val W = 8
    val out = Registry.queries("q98_substring_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // structural invariants first: width >= W, end exclusive, per-doc
    // spans sorted and disjoint
    assert(out.nonEmpty, "sf0.001 corpus contains duplicated spans")
    assert(out.forall { case (_, s, e, w) => w == e - s && w >= W })
    out.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1, s"doc $doc: overlapping or touching spans")
        case _ => ()
      }
    }
    // ground truth via an imperative reimplementation (hash map + linear
    // interval sweep, no SQL windows): every maximal span of length >= W
    // repeated across >= 2 docs, exactly
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "split(text, ' ') AS ws").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray)
    val gramDocs = collection.mutable.Map.empty[String, collection.mutable.Set[Long]]
    for ((id, ws) <- docs; i <- 0 to ws.length - W)
      gramDocs.getOrElseUpdate(ws.slice(i, i + W).mkString(" "),
        collection.mutable.Set.empty) += id
    val expected = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for ((id, ws) <- docs) {
      val seedPos = (0 to ws.length - W).filter(i =>
        gramDocs(ws.slice(i, i + W).mkString(" ")).size > 1)
      var start = -1; var end = -1
      for (i <- seedPos) {
        if (start < 0) { start = i; end = i + W }
        else if (i <= end) end = i + W
        else { expected += ((id, start + 1L, end + 1L, (end - start).toLong))
               start = i; end = i + W }
      }
      if (start >= 0)
        expected += ((id, start + 1L, end + 1L, (end - start).toLong))
    }
    assert(out.sortBy(t => (t._1, t._2)).toSeq ==
      expected.sortBy(t => (t._1, t._2)).toSeq)
  }
}
