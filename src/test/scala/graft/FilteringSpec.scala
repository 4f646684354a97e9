package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the corpus-filtering additions (q99–q104):
  * properties the DuckDB hash gate cannot state — cross-query
  * identities, conservation laws, and verdict non-degeneracy.
  */
class FilteringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q99 gopher rules: signals are exact and the gate discriminates") {
    val out = Registry.queries("q99_gopher_rules")(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val nWords = r.getLong(1)
      val shortR = r.getDouble(3); val longR = r.getDouble(4)
      assert(nWords > 0)
      // ratios are fractions of the same denominator: sum bounded by 1
      assert(shortR >= 0.0 && longR >= 0.0 && shortR + longR <= 1.0 + 1e-12)
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 4) // 4 stopword kinds
    }
    val verdicts = out.map(_.getBoolean(6)).toSet
    assert(verdicts == Set(true, false),
      "a gate that passes (or fails) everything tests nothing")
  }

  test("q100 dsir: weights bounded by smoothed ratio, keep splits corpus") {
    val out = Registry.queries("q100_dsir_weights")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == docs, "one weight row per document")
    for (r <- out) {
      val n = r.getLong(1); val score = r.getLong(2); val mean = r.getLong(3)
      // each per-token ppm weight is in [0, 1e6] because nt <= nr, so the
      // doc mean must be too
      assert(mean >= 0 && mean <= 1000000L)
      assert(mean == score / n, "mean is the integer div of score by tokens")
    }
    // token conservation: the scored stream is exactly the corpus stream
    val totalToks = out.map(_.getLong(1)).sum
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sum
    assert(totalToks == expected)
    assert(out.map(_.getBoolean(4)).toSet == Set(true, false),
      "the corpus-mean threshold must split the corpus")
  }

  test("q101 bpe apply == q97 train: corpus token budgets agree") {
    val applied = Registry.queries("q101_bpe_apply")(spark, dir).collect()
    val trained = Registry.queries("q97_bpe_train")(spark, dir).collect()
    // the train side reports corpus_symbols_after per round; the final
    // round's corpus size must equal the applied per-doc budgets summed —
    // two independent computations of the same tokenizer's output size
    val finalCorpusSyms = trained.map(_.getLong(4)).min
    val appliedSum = applied.map(_.getLong(2)).sum
    assert(appliedSum == finalCorpusSyms,
      s"apply-sum $appliedSum != final train corpus size $finalCorpusSyms")
    for (r <- applied) {
      val nWords = r.getLong(1); val nToks = r.getLong(2)
      val nChars = r.getLong(3)
      assert(nToks >= nWords, "every word is at least one symbol")
      assert(nToks <= nChars, "merging never grows the symbol count")
    }
    // merges must actually fire: some doc compresses below chars
    assert(applied.exists(r => r.getLong(2) < r.getLong(3)))
  }

  test("q102 cluster sample: per-cell quota held, deterministic") {
    val a = Registry.queries("q102_cluster_sample")(spark, dir).collect()
    val b = Registry.queries("q102_cluster_sample")(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "hash-rank sampling must be reproducible")
    val perCell = a.groupBy(_.getLong(0))
    assert(perCell.values.forall(_.length <= 20))
    for ((_, rows) <- perCell) {
      val rnks = rows.map(_.getLong(1)).sorted
      assert(rnks.toSeq == (1L to rnks.length).toSeq,
        "ranks are dense from 1 within each cell")
    }
    assert(a.map(_.getLong(2)).distinct.length == a.length,
      "a vector is sampled at most once")
  }

  test("q103 fertility: per-language rollup consistent with q101") {
    val fert = Registry.queries("q103_bpe_fertility")(spark, dir).collect()
    val applied = Registry.queries("q101_bpe_apply")(spark, dir).collect()
    assert(fert.map(_.getString(0)).toSeq ==
      fert.map(_.getString(0)).toSeq.sorted)
    // corpus-level conservation across the two groupings
    assert(fert.map(_.getLong(3)).sum == applied.map(_.getLong(2)).sum)
    assert(fert.map(_.getLong(2)).sum == applied.map(_.getLong(1)).sum)
    for (r <- fert) {
      assert(r.getDouble(5) >= 1.0, "fertility >= 1: words only split")
      assert(r.getDouble(6) >= 1.0, "a token is at least one char")
    }
  }

  test("q105 ngram repetition: counting identities and discrimination") {
    val out = Registry.queries("q105_ngram_repetition")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS nw").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length == docs.size)
    for (r <- out) {
      val n = r.getLong(1); val dup = r.getLong(2); val top = r.getLong(3)
      // a doc with W words has exactly W-1 bigrams
      assert(n == docs(r.getLong(0)) - 1)
      assert(dup >= 0 && dup < n, "dups are occurrences beyond each first")
      assert(top >= 1 && top <= dup + 1)
    }
    assert(out.map(_.getBoolean(6)).toSet == Set(true, false),
      "the repetition flag must discriminate")
  }

  test("q104 mad outliers: robust stats bounded and sane") {
    val out = Registry.queries("q104_mad_outliers")(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val nHours = r.getLong(1); val mad = r.getDouble(3)
      val nOut = r.getLong(4)
      assert(mad >= 0.0)
      assert(nOut >= 0 && nOut <= nHours)
      // the median deviation is 0 from the median's own hour, so at most
      // half the hours can sit beyond 3 MAD (robustness guarantee)
      assert(nOut * 2 <= nHours,
        "more than half the series flagged — MAD would be larger")
    }
  }
}
