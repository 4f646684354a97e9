package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referee for wave 44: the streamed CMS counter matrix equals an
  * exact single-node sketch replica (linearity: streamed increments ==
  * batch-grouped counts), and row sums equal the corpus shingle
  * total. */
class Wave44Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q286 streamed counters equal the exact CMS replica; row sums = total") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w44a_").toString
    val rng = new scala.util.Random(23)
    val vocab = (0 until 200).map(i => s"t$i")
    val docs = (0 until 120).map { i =>
      (i.toLong, (0 until 20).map(_ =>
        vocab(rng.nextInt(vocab.size))).mkString(" "))
    } :+ (120L, "xx") // short doc: filtered, must not crash the stream
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def kh(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(12), 16)
    val A = Seq(31L, 131L, 313L, 1009L); val B = Seq(7L, 911L, 4507L, 8191L)
    val P = 2147483647L; val W = 256L
    val shingles = docs.flatMap { case (_, t) =>
      val ws = t.split(" ")
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" "))
    }
    val want = (for {
      sh <- shingles; i <- A.indices
    } yield (i.toLong, ((A(i) * kh(sh) + B(i)) % P) % W))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }

    val got = Registry.queries("q286_stream_cms")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want, "streamed counter matrix != exact replica")
    // linearity invariant: every row's counters sum to the total
    val total = shingles.size.toLong
    for (i <- 0 until 4)
      assert(got.collect { case ((r, _), c) if r == i => c }.sum == total)
  }
}
