package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-corpus preparation battery (q59–q62)
  * beyond the DuckDB hash gate: membership rules, integer-space scoring
  * identities, code ranges, and quota accuracy. */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("decontamination never flags eval docs and only flags real overlap") {
    val out = Registry.queries("q59_decontaminate")(spark, dir).collect()
    assert(out.forall(_.getLong(0) % 97 != 0)) // eval side excluded
    assert(out.forall(_.getLong(2) >= 1)) // every flagged doc has a hit
    // brute-force recheck for one flagged doc: its 5-gram set must
    // intersect the eval set in exactly n_shared_grams grams
    out.headOption.foreach { r =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def gramsOf(filter: org.apache.spark.sql.Column) = docs.filter(filter)
        .select(explode(expr(
          "transform(sequence(0, size(split(text,' ')) - 5), " +
            "i -> concat_ws(' ', slice(split(text,' '), i + 1, 5)))")).as("g"))
        .select("g").distinct().collect().map(_.getString(0)).toSet
      val docGrams = gramsOf(col("doc_id") === r.getLong(0))
      val evalGrams = gramsOf(col("doc_id") % 97 === 0)
      assert((docGrams & evalGrams).size == r.getLong(2))
    }
  }

  test("unigram scores respect the integer identities") {
    val out = Registry.queries("q60_unigram_lm")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == docs) // every doc is scored
    out.foreach { r =>
      val (n, freq, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(freq >= n) // every token's corpus count is >= 1
      assert(ppm == math.floor(freq * 1000000.0 / n).toLong)
    }
  }

  test("quantization codes stay in int8 range over all 64 dims") {
    val out = Registry.queries("q61_embed_quantize")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 255) // qmin/qmax
      assert(r.getLong(4) == 64) // dim count
      assert(r.getLong(1) <= 255L * 64) // checksum bound
    }
    // each dimension's extremes map to the range ends: some vector hits
    // code 0 and some hits 255 in every run of real (non-constant) data
    assert(out.exists(_.getLong(2) == 0) && out.exists(_.getLong(3) == 255))
  }

  test("rebalancing hits each language's quota within hash tolerance") {
    val out = Registry.queries("q62_lang_rebalance")(spark, dir).collect()
    assert(out.nonEmpty)
    val target = out.head.getLong(2)
    out.foreach { r =>
      val (n, t, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t == target) // one global target
      assert(kept <= n)
      if (n == t) assert(kept == n) // smallest language keeps everything
      // quota accuracy: the hash is uniform, so kept ≈ target with
      // binomial spread; allow 4 sigma + rounding slack
      else assert(math.abs(kept - t) <= 4 * math.sqrt(t.toDouble) + 10,
        s"lang=${r.getString(0)} kept=$kept target=$t")
    }
  }
}
