package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def blobs = {
    import spark.implicits._
    Seq(
      (1L, Multimodal.encodeStubHeader("image", 640, 480, 0, 1,
        Array.tabulate(100)(_.toByte))),
      (2L, Multimodal.encodeStubHeader("video", 320, 240, 30, 500,
        Array.tabulate(4096)(i => (i * 7).toByte))),
      (3L, "not a media file".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "content")
  }

  test("metadata decode: typed struct, unknown/null-safe") {
    val m = Multimodal.withMeta(blobs).select("id", "meta.*")
      .orderBy("id").collect()
    assert(m(0).getString(1) == "image" && m(0).getInt(2) == 640 &&
      m(0).getInt(3) == 480)
    assert(m(1).getString(1) == "video" && m(1).getInt(4) == 30 &&
      m(1).getInt(5) == 500)
    assert(m(2).getString(1) == "unknown")
    assert(m(3).getString(1) == "unknown" && m(3).getLong(6) == 0L)
  }

  test("feature extraction: fixed width, normalized, deterministic") {
    val f = Multimodal.withFeatures(blobs).select("id", "features")
      .orderBy("id").collect()
    val v1 = f(0).getSeq[Float](1)
    assert(v1.length == 16)
    assert(math.abs(v1.sum - 1.0f) < 1e-3) // normalized histogram
    val again = Multimodal.withFeatures(blobs).select("features")
      .orderBy("id").collect()(0).getSeq[Float](0)
    assert(v1 == again)
  }

  test("resize: fixed output size, header rewritten, pass-through for non-images") {
    val out = Multimodal.resize(blobs, 8, 4)
      .select("id", "resized").orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // image: output = 16-byte header + 8×4 raster, whatever the input size
    val img = out(1L)
    assert(img.length == 16 + 8 * 4)
    val meta = Multimodal.withMeta {
      import spark.implicits._
      Seq((1L, img)).toDF("id", "content")
    }.select("meta.kind", "meta.width", "meta.height").head()
    assert(meta.getString(0) == "image" && meta.getInt(1) == 8 &&
      meta.getInt(2) == 4)
    // deterministic: same input → same bytes
    val again = Multimodal.resize(blobs, 8, 4)
      .select("id", "resized").orderBy("id").collect()
    assert(java.util.Arrays.equals(again(0).getAs[Array[Byte]](1), img))
    // non-image and null blobs pass through unchanged
    assert(java.util.Arrays.equals(out(3L), "not a media file".getBytes))
    assert(out(4L) == null)
    // video blob is not resized either (kind gate)
    assert(out(2L).length == 16 + 4096)
  }

  test("frame sampling: strided chunks with index") {
    val frames = Multimodal.sampleFrames(blobs, frameBytes = 256, stride = 4)
      .collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(2L).length == 4) // 4096/256=16 frames, stride 4
    assert(byId(2L).map(_.getInt(1)).sorted.toSeq == Seq(0, 4, 8, 12))
    assert(byId(2L).forall(_.getAs[Array[Byte]](2).length == 256))
    assert(!byId.contains(3L) || byId(3L).isEmpty) // short blob skipped
  }
}
