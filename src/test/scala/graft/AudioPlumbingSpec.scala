package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The REAL audio codec path (round 9): `Multimodal` decodes genuine
  * RIFF/WAVE containers with the JDK's `javax.sound.sampled` —
  * metadata and PCM sample probes run a real encoder/decoder, with the
  * toy header now retained only for video. Brute-force twin of
  * q256/q257. */
class AudioPlumbingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sampleAt(id: Long)(i: Int): Int =
    (((id * 13 + i.toLong * 37) % 65536) - 32768).toInt

  test("WAV encode -> withMeta decode round-trips rate and frame count") {
    import spark.implicits._
    val blobs = Seq((1L, 8000, 5), (2L, 44100, 97), (3L, 16000, 33))
      .map { case (id, rate, n) =>
        (id, Multimodal.encodeWav(rate, n, sampleAt(id)))
      }
      .toDF("id", "content")
    val meta = Multimodal.withMeta(blobs)
      .select(col("id"), col("meta.kind"), col("meta.sampleRate"),
        col("meta.nFrames"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3))).toSet
    assert(meta == Set((1L, "audio", 8000, 5), (2L, "audio", 44100, 97),
      (3L, "audio", 16000, 33)))
  }

  test("every PCM16 sample round-trips bit-exactly, negatives included") {
    val n = 300
    val wav = Multimodal.encodeWav(12000, n, sampleAt(3L))
    val got = Multimodal.audioProbe(wav, (_, frames) => 0 until frames)
    assert(got.isDefined)
    val (rate, frames, ps) = got.get
    assert(rate == 12000 && frames == n)
    for (i <- 0 until n)
      assert(ps(i) == sampleAt(3L)(i),
        s"sample $i diverged — endianness or sign handling")
  }

  test("out-of-bounds probe indices yield the -65536 sentinel") {
    val wav = Multimodal.encodeWav(8000, 4, sampleAt(1L))
    val ps = Multimodal.audioProbe(wav, (_, _) => Seq(-1, 0, 3, 4)).get._3
    assert(ps(0) == -65536 && ps(3) == -65536)
    assert(ps(1) == sampleAt(1L)(0) && ps(2) == sampleAt(1L)(3))
  }

  test("corrupt and truncated containers decode as unknown, not a crash") {
    import spark.implicits._
    val truncated = Multimodal.encodeWav(8000, 10, sampleAt(1L)).take(16)
    val garbage = Array[Byte]('R', 'I', 'F', 'F', 1, 2, 3, 4,
      'W', 'A', 'V', 'E', 9)
    val blobs = Seq((1L, truncated), (2L, garbage)).toDF("id", "content")
    val kinds = Multimodal.withMeta(blobs).select(col("meta.kind"))
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("unknown"))
    assert(Multimodal.audioProbe(truncated, (_, _) => Seq(0)).isEmpty)
  }

  test("mu-law AU containers are rejected, not mis-probed as PCM8") {
    // Minimal valid AU: '.snd' magic, data offset 24, encoding 1 =
    // 8-bit mu-law, 8 kHz mono — a layout isRealAudio admits and the
    // JDK AU reader parses, but whose samples are NOT linear PCM. The
    // probe must return None rather than run (v-128)<<8 on mu-law.
    def be32(v: Int): Array[Byte] = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val body = Array.tabulate[Byte](64)(i => ((i * 7) & 0xff).toByte)
    val au = ".snd".getBytes("US-ASCII") ++ be32(24) ++
      be32(body.length) ++ be32(1) ++ be32(8000) ++ be32(1) ++ body
    assert(Multimodal.audioProbe(au, (_, _) => Seq(0)).isEmpty,
      "mu-law must not take the 8-bit unsigned-PCM arithmetic path")
  }

  test("toy video headers still decode through the stub") {
    import spark.implicits._
    val blobs = Seq((1L, Multimodal.encodeStubHeader("video", 320, 240,
      0, 120, Array[Byte](9)))).toDF("id", "content")
    val got = Multimodal.withMeta(blobs)
      .select(col("meta.kind"), col("meta.nFrames")).head()
    assert((got.getString(0), got.getInt(1)) == ("video", 120))
  }

  test("q257 health audit: corruption counted, amplitude from valid only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wavh_").toString
    // ids 0..9, one source: ids 0 and 5 corrupt (id % 5 == 0)
    val docs = (0L until 10L).map(i => (i, "srcA", 40L + i))
    docs.toDF("doc_id", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Registry.queries("q257_wav_health")(spark, tmp)
      .collect().head
    assert(r.getString(0) == "srcA")
    assert(r.getAs[Long]("n_audio") == 10L)
    assert(r.getAs[Long]("n_corrupt") == 2L)
    assert(r.getAs[Long]("corrupt_ppm") == 2L * 1000000L / 10L)
    val sum = (0L until 10L).filter(_ % 5 != 0).map { id =>
      val n = ((40 + id) % 97 + 5).toInt
      math.abs(sampleAt(id)(n / 2)).toLong
    }.sum
    assert(r.getAs[Long]("mean_abs_mid_micro") == sum * 1000000L / 8L)
  }

  test("q257 all-corrupt source reports zero amplitude, no crash") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_wavh_").toString
    Seq((0L, "srcB", 50L)).toDF("doc_id", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val r = Registry.queries("q257_wav_health")(spark, tmp)
      .collect().head
    assert(r.getAs[Long]("n_corrupt") == 1L)
    assert(r.getAs[Long]("corrupt_ppm") == 1000000L)
    assert(r.getAs[Long]("mean_abs_mid_micro") == 0L)
  }
}
