package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL video path (round 9): spec-correct RIFF/AVI demux + PNG
  * frame decode through `javax.imageio`. Brute-force twin of
  * q265/q266; the toy header remains only for the H.264-class branch
  * the sandbox cannot decode. */
class VideoPlumbingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gray(id: Long, k: Int)(x: Int, y: Int): Int =
    ((id * 7 + x * 31 + y * 17 + k * 97) % 256).toInt

  test("AVI encode -> withMeta decode round-trips geometry + frame count") {
    import spark.implicits._
    val blobs = Seq((1L, 5, 9, 2), (2L, 28, 4, 5), (3L, 17, 20, 3))
      .map { case (id, w, h, f) =>
        (id, Multimodal.encodeAviMpng(w, h,
          (0 until f).map(k => gray(id, k) _)))
      }
      .toDF("id", "content")
    val meta = Multimodal.withMeta(blobs)
      .select(col("id"), col("meta.kind"), col("meta.width"),
        col("meta.height"), col("meta.nFrames"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(meta == Set((1L, "video", 5, 9, 2), (2L, "video", 28, 4, 5),
      (3L, "video", 17, 20, 3)))
  }

  test("every pixel of every demuxed frame decodes bit-exactly") {
    val (w, h, f) = (13, 11, 4)
    val avi = Multimodal.encodeAviMpng(w, h,
      (0 until f).map(k => gray(9L, k) _))
    val Some((dw, dh, declared, frames)) = Multimodal.demuxAvi(avi)
    assert((dw, dh, declared, frames.length) == (w, h, f, f))
    for (k <- 0 until f; y <- 0 until h; x <- 0 until w)
      assert(Multimodal.grayAt(frames(k), x, y) == gray(9L, k)(x, y),
        s"frame $k pixel ($x,$y)")
  }

  test("sampleFrames takes the real demux path with stride") {
    import spark.implicits._
    val avi = Multimodal.encodeAviMpng(6, 6,
      (0 until 5).map(k => gray(2L, k) _))
    val rows = Multimodal.sampleFrames(
        Seq((2L, avi)).toDF("id", "content"), frameBytes = 0, stride = 2)
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](2)))
    assert(rows.map(_._1).toSeq == Seq(0, 2, 4))
    for ((k, fr) <- rows)
      assert(Multimodal.grayAt(fr, 3, 3) == gray(2L, k)(3, 3))
  }

  test("corrupt and truncated containers decode as unknown, not a crash") {
    import spark.implicits._
    val full = Multimodal.encodeAviMpng(6, 6, Seq(gray(1L, 0) _))
    val truncated = full.take(20)
    val midMovi = full.take(full.length - 3) // last chunk cut short
    val blobs = Seq((1L, truncated), (2L, midMovi)).toDF("id", "content")
    val kinds = Multimodal.withMeta(blobs).select(col("meta.kind"))
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("unknown"))
    assert(Multimodal.demuxAvi(truncated).isEmpty)
    assert(Multimodal.sampleFrames(blobs, 0, 1).count() == 0L)
  }

  test("toy header still serves the H.264-class stub branch") {
    import spark.implicits._
    val blobs = Seq((1L, Multimodal.encodeStubHeader("video", 320, 240,
      0, 120, Array[Byte](9, 9, 9, 9)))).toDF("id", "content")
    val got = Multimodal.withMeta(blobs)
      .select(col("meta.kind"), col("meta.nFrames")).head()
    assert((got.getString(0), got.getInt(1)) == ("video", 120))
  }

  test("q266 health audit: corruption counted, stats from valid only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_vidh_").toString
    // ids 0..11, one source: ids 0 and 6 corrupt (id % 6 == 0)
    val docs = (0L until 12L).map(i => (i, "srcV", 40L + i))
    docs.toDF("doc_id", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Registry.queries("q266_video_health")(spark, tmp)
      .collect().head
    assert(r.getString(0) == "srcV")
    assert(r.getAs[Long]("n_videos") == 12L)
    assert(r.getAs[Long]("n_corrupt") == 2L)
    assert(r.getAs[Long]("corrupt_ppm") == 2L * 1000000L / 12L)
    val valid = (0L until 12L).filterNot(_ % 6 == 0)
    assert(r.getAs[Long]("total_frames") == valid.map(_ % 4 + 2).sum)
    val sumMid = valid.map { id =>
      val w = ((40 + id) % 25 + 4).toInt; val h = (id % 17 + 4).toInt
      gray(id, 0)(w / 2, h / 2).toLong
    }.sum
    assert(r.getAs[Long]("mean_mid_micro") == sumMid * 1000000L / 10L)
  }
}
