package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in `mapPartitions`
  * (the Scala analog of pandas-batch UDF plumbing).
  *
  * IMPORTANT — STUBBED DECODERS: this container has no image/audio
  * codecs, so `decodeStub` parses a tiny deterministic fake header
  * instead of real JPEG/WAV/MP4 decoding; swap the marked block for a
  * real codec (e.g. javax.imageio / ffmpeg bindings) on a real cluster.
  * Everything around the stub — schema, batch iteration shape,
  * partitioning, null handling — is the real production plumbing and is
  * tested.
  *
  * Scale notes: decode is embarrassingly parallel → `repartition(n)` by
  * id hash balances skew from variable blob sizes; feature vectors are
  * fixed-width `Array[Float]` so downstream similarity ops reuse the
  * Similarity battery; frame sampling emits one row per frame
  * (explode-shaped), keeping blobs bounded per row.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | video | unknown
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sampleRate", IntegerType),
    StructField("nFrames", IntegerType),
    StructField("sizeBytes", LongType)))

  /** Deterministic fake "decode" — STUB for a real codec. Reads our toy
    * 16-byte header: magic(4) kind(1) w(2) h(2) rate(3) frames(4). */
  private def decodeStub(bytes: Array[Byte]): Row = {
    // >>> BEGIN STUB (replace with real codec calls) <<<
    if (bytes == null || bytes.length < 16 ||
      !(bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F' && bytes(3) == 'T'))
      return Row("unknown", null, null, null, null,
        if (bytes == null) 0L else bytes.length.toLong)
    def u16(i: Int) = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def u24(i: Int) = (u16(i) << 8) | (bytes(i + 2) & 0xff)
    def u32(i: Int) = (u24(i) << 8) | (bytes(i + 3) & 0xff)
    val kind = bytes(4) match {
      case 1 => "image"; case 2 => "audio"; case 3 => "video"
      case _ => "unknown"
    }
    Row(kind, u16(5), u16(7), u24(9), u32(12), bytes.length.toLong)
    // >>> END STUB <<<
  }

  /** Encode the toy header (used by tests / synthetic data). */
  def encodeStubHeader(kind: String, w: Int, h: Int, rate: Int,
      frames: Int, payload: Array[Byte]): Array[Byte] = {
    val k: Byte = kind match {
      case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
    }
    val header = Array[Byte]('G', 'R', 'F', 'T', k,
      (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
      (rate >> 16).toByte, (rate >> 8).toByte, rate.toByte,
      (frames >> 24).toByte, (frames >> 16).toByte, (frames >> 8).toByte,
      frames.toByte)
    header ++ payload
  }

  /** Decode metadata for a DataFrame with an `id` column and a binary
    * `content` column → adds a `meta` struct. Batch shape: one
    * mapPartitions pass, no per-row task overhead. */
  def withMeta(df: DataFrame): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("meta", metaSchema))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ decodeStub(row.getAs[Array[Byte]](binIdx)))
      }
    }(enc)
  }

  /** Fixed-width feature extraction: 16-bin byte histogram normalized to
    * [0,1] — STUB for a real embedding model, but the batch shape,
    * width contract, and determinism are production-real. */
  def withFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val hist = new Array[Float](dim)
        if (bytes != null && bytes.nonEmpty) {
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) * dim / 256) += 1f
            i += 1
          }
          var j = 0
          while (j < dim) { hist(j) /= bytes.length; j += 1 }
        }
        Row.fromSeq(row.toSeq :+ hist.toSeq)
      }
    }(enc)
  }

  /** Resize for "image" blobs: nearest-neighbor raster resample to
    * (targetW × targetH), header rewritten with the new dimensions —
    * STUB for a real image scaler (javax.imageio / libvips on a real
    * cluster), but the contract is production-real: binary in → binary
    * out, output size = header + targetW·targetH bytes regardless of
    * input size (the property that makes downstream batches
    * fixed-width), deterministic, non-image/undecodable blobs pass
    * through unchanged. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = decodeStub(bytes)
        val out =
          if (meta.getString(0) != "image" || meta.isNullAt(1)) bytes
          else {
            val (w0, h0) = (math.max(meta.getInt(1), 1),
              math.max(meta.getInt(2), 1))
            val payload = bytes.drop(16)
            // >>> BEGIN STUB (replace with a real scaler) <<<
            // treat payload as a row-major w0×h0 raster (short payloads
            // read as zero) and nearest-neighbor sample it
            val res = new Array[Byte](targetW * targetH)
            var y = 0
            while (y < targetH) {
              val sy = y.toLong * h0 / targetH
              var x = 0
              while (x < targetW) {
                val sx = x.toLong * w0 / targetW
                val src = sy * w0 + sx
                res(y * targetW + x) =
                  if (src < payload.length) payload(src.toInt) else 0
                x += 1
              }
              y += 1
            }
            // >>> END STUB <<<
            encodeStubHeader("image", targetW, targetH, 0, 0, res)
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(enc)
  }

  /** Frame sampling for "video" blobs: every `stride`-th fixed-size
    * chunk of the payload becomes one frame row (id, frameIdx, frame).
    * Real video decode replaces chunking with keyframe extraction. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("frameIdx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex("id")
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(idIdx)
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.length <= 16) Iterator.empty
        else {
          val payload = bytes.drop(16)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(id, f, payload.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }(enc)
  }
}
