package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-checks of the round-4 text operators (q67 exact
  * n-gram overlap, q68 weighted sampling, q70 TF-IDF cosine) against
  * independent brute-force reimplementations, on corpora seeded with
  * genuine near-duplicates so the pair-producing operators actually
  * produce pairs. */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def docsDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dprop_").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), col("doc_id") % 3))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val genWord = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private val genBase: Gen[String] =
    Gen.choose(12, 30).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))

  /** Base docs plus mutated copies — the copies share long word spans,
    * so 8-gram overlap and high tf-idf cosine both occur. */
  private val genNearCorpus: Gen[Seq[(Long, String)]] = for {
    nBase <- Gen.choose(4, 7)
    bases <- Gen.listOfN(nBase, genBase)
    variants <- Gen.sequence[Seq[Seq[String]], Seq[String]](bases.map { b =>
      for {
        nVar <- Gen.choose(0, 2)
        vs <- Gen.listOfN(nVar, for {
          pos <- Gen.choose(0, b.split(" ").length - 1)
          w <- genWord
        } yield { val ws = b.split(" "); ws(pos) = w; ws.mkString(" ") })
      } yield vs
    })
  } yield (bases ++ variants.flatten).zipWithIndex
    .map { case (t, i) => (i.toLong + 1, t) }

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  test("q67 == brute-force shared 8-gram counting") {
    check(Prop.forAll(genNearCorpus) { docs =>
      val dir = docsDir(docs)
      val grams = docs.map { case (id, t) =>
        id -> t.split(" ").sliding(8).filter(_.length == 8)
          .map(_.mkString(" ")).toSet
      }.toMap
      val df = grams.values.flatten.groupBy(identity).view.mapValues(_.size)
      val kept = grams.view.mapValues(_.filter(df(_) <= 50)).toMap
      val ids = docs.map(_._1).sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        shared = (kept(a) & kept(b)).size
        if shared >= 5
      } yield (a, b, shared.toLong,
        shared.toDouble / math.min(kept(a).size, kept(b).size))).toSet
      val got = Registry.queries("q67_exact_ngram_overlap")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      got == want
    }, n = 10)
  }

  test("q68 == brute-force weighted keep rule") {
    check(Prop.forAll(genNearCorpus) { docs =>
      val dir = docsDir(docs)
      val rows = docs.map { case (id, t) =>
        val w = t.length.toLong
        val keep = w >= 600L ||
          md5hex(s"smp:$id").substring(0, 8) <
            "%08x".format(math.min(w, 600L) * 4294967296L / 600L)
        (s"s${id % 3}", w, id, keep)
      }
      val want = rows.groupBy(_._1).map { case (src, rs) =>
        val k = rs.filter(_._4)
        (src, rs.size.toLong, k.size.toLong,
          k.map(_._2).sum, k.map(_._3).sum)
      }.toSet
      val got = Registry.queries("q68_weighted_sample")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSet
      got == want
    }, n = 10)
  }

  test("q70 == brute-force tf-idf cosine over kept vocabulary") {
    check(Prop.forAll(genNearCorpus) { docs =>
      val dir = docsDir(docs)
      val n = docs.size.toLong
      val tf = docs.map { case (id, t) =>
        id -> t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
      }.toMap
      val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size)
      val weights = tf.view.mapValues(_.collect {
        case (w, f) if df(w) <= 50 => w -> f * ((n * 1024L) / df(w))
      }.toMap).toMap
      val norms = weights.view.mapValues(ws =>
        ws.values.map(v => BigInt(v) * BigInt(v)).sum).toMap
      val ids = docs.map(_._1).sorted
      val want = (for {
        a <- ids; b <- ids if a < b
        shared = weights(a).keySet & weights(b).keySet
        if shared.nonEmpty
        dotq = shared.toSeq.map(w => BigInt(weights(a)(w)) * BigInt(weights(b)(w))).sum
        cos = dotq.toDouble /
          (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble))
        if cos >= 0.4
      } yield (a, b, shared.size.toLong, cos)).toSet
      val got = Registry.queries("q70_tfidf_cosine")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      got == want
    }, n = 10)
  }
}
