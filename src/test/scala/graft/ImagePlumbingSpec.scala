package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image codec path (round 8): `Multimodal` decodes genuine
  * PNG containers with the JDK's `javax.imageio` — metadata, pixel
  * probes, and resize all run a real encoder/decoder, with the toy
  * header retained only for the codecs this sandbox genuinely lacks
  * (audio/video). Brute-force twin of q225/q226. */
class ImagePlumbingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gray(id: Long)(x: Int, y: Int): Int =
    ((id * 7 + x * 31 + y * 17) % 256).toInt

  test("PNG encode -> withMeta decode round-trips dimensions and pixels") {
    import spark.implicits._
    val blobs = Seq((1L, 5, 9), (2L, 64, 4), (3L, 17, 45))
      .map { case (id, w, h) => (id, Multimodal.encodePng(w, h, gray(id))) }
      .toDF("id", "content")
    val meta = Multimodal.withMeta(blobs)
      .select(col("id"), col("meta.kind"), col("meta.width"),
        col("meta.height"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).toSet
    assert(meta == Set((1L, "image", 5, 9), (2L, "image", 64, 4),
      (3L, "image", 17, 45)))
    // every pixel of one image, probed from the decoded container
    val png3 = Multimodal.encodePng(17, 45, gray(3L))
    for (y <- 0 until 45; x <- 0 until 17)
      assert(Multimodal.grayAt(png3, x, y) == gray(3L)(x, y),
        s"pixel ($x,$y) diverged — likely the getRGB sRGB-gamma trap")
  }

  test("corrupt and truncated containers decode as unknown, not a crash") {
    import spark.implicits._
    val truncated = Multimodal.encodePng(8, 8, gray(1L)).take(20)
    val garbage = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4)
    val blobs = Seq((1L, truncated), (2L, garbage)).toDF("id", "content")
    val kinds = Multimodal.withMeta(blobs).select(col("meta.kind"))
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("unknown"))
  }

  test("toy audio/video headers still decode through the stub") {
    import spark.implicits._
    val blobs = Seq(
      (1L, Multimodal.encodeStubHeader("audio", 0, 0, 44100, 0,
        Array[Byte](1, 2, 3))),
      (2L, Multimodal.encodeStubHeader("video", 320, 240, 0, 120,
        Array[Byte](9)))).toDF("id", "content")
    val got = Multimodal.withMeta(blobs)
      .select(col("id"), col("meta.kind"), col("meta.sampleRate"),
        col("meta.nFrames"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(got == Set((1L, "audio", 44100, 0), (2L, "video", 0, 120)))
  }

  test("real resize = decode -> exact nearest-neighbor -> PNG re-encode") {
    import spark.implicits._
    val (w0, h0, tw, th) = (37, 23, 16, 12)
    val blobs = Seq((7L, Multimodal.encodePng(w0, h0, gray(7L))))
      .toDF("id", "content")
    val resized = Multimodal.resize(blobs, tw, th)
      .select(col("resized")).head().getAs[Array[Byte]](0)
    // decoded dims are the fixed-width contract
    val m = Multimodal.withMeta(Seq((7L, resized)).toDF("id", "content"))
      .select(col("meta.width"), col("meta.height")).head()
    assert((m.getInt(0), m.getInt(1)) == (tw, th))
    // every output pixel equals the brute-force nearest-neighbor sample
    for (y <- 0 until th; x <- 0 until tw) {
      val (sx, sy) = ((x.toLong * w0 / tw).toInt, (y.toLong * h0 / th).toInt)
      assert(Multimodal.grayAt(resized, x, y) == gray(7L)(sx, sy),
        s"resized pixel ($x,$y) != source ($sx,$sy)")
    }
  }

  test("non-image and undecodable blobs pass through resize unchanged") {
    import spark.implicits._
    val audio = Multimodal.encodeStubHeader("audio", 0, 0, 8000, 0,
      Array[Byte](5, 6))
    val garbage = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0)
    val out = Multimodal.resize(
      Seq((1L, audio), (2L, garbage)).toDF("id", "content"), 4, 4)
      .select(col("id"), col("resized"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Array[Byte]](1).toSeq)).toMap
    assert(out(1L) == audio.toSeq && out(2L) == garbage.toSeq)
  }

  test("q253 health audit: corruption counted, brightness from valid only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_imgh_").toString
    // ids 0..13, one source: ids 0 and 7 corrupt (id % 7 == 0)
    val docs = (0L until 14L).map(i => (i, "srcX", 40L + i))
    docs.toDF("doc_id", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Registry.queries("q253_image_health")(spark, tmp)
      .collect().head
    assert(r.getString(0) == "srcX")
    assert(r.getAs[Long]("n_images") == 14L)
    assert(r.getAs[Long]("n_corrupt") == 2L)
    assert(r.getAs[Long]("corrupt_ppm") == 2L * 1000000L / 14L)
    // valid mid-pixel sum from the closed form gray(id)(w/2, h/2)
    val sum = (0L until 14L).filter(_ % 7 != 0).map { id =>
      val w = ((40 + id) % 61 + 4).toInt; val h = (id % 45 + 4).toInt
      (id * 7 + (w / 2) * 31 + (h / 2) * 17) % 256
    }.sum
    assert(r.getAs[Long]("mean_mid_micro") == sum * 1000000L / 12L)
  }

  test("q253 all-corrupt source reports zero brightness, no crash") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_imgh_").toString
    // single doc with id 0 -> corrupt -> n_valid = 0 branch
    Seq((0L, "srcY", 50L)).toDF("doc_id", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = Registry.queries("q253_image_health")(spark, tmp)
      .collect().head
    assert(r.getAs[Long]("n_corrupt") == 1L)
    assert(r.getAs[Long]("corrupt_ppm") == 1000000L)
    assert(r.getAs[Long]("mean_mid_micro") == 0L)
  }
}
