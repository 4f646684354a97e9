package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in `mapPartitions`
  * (the Scala analog of pandas-batch UDF plumbing).
  *
  * IMAGE DECODE IS REAL (round 8): PNG / JPEG / BMP / GIF blobs are
  * sniffed by magic bytes and decoded with the JDK's built-in
  * `javax.imageio` — no external libraries — so metadata, resize, and
  * pixel probes run a genuine codec path (ImagePlumbingSpec +
  * q225/q226 pin the round-trip against closed-form oracles).
  *
  * AUDIO DECODE IS REAL (round 9): WAV / AIFF / AU containers are
  * sniffed by magic bytes and decoded with the JDK's built-in
  * `javax.sound.sampled.AudioSystem` — again no external libraries —
  * so sample-rate/frame-count metadata and PCM sample probes run a
  * genuine audio codec path (AudioPlumbingSpec + q256/q257 pin the
  * encode→decode round-trip against closed-form sample oracles).
  *
  * VIDEO DECODE IS REAL FOR THE MJPEG/MPNG CLASS (round 9): RIFF/AVI
  * containers are demuxed by a spec-correct chunk walk ([[demuxAvi]]:
  * hdrl/avih/strf headers, LIST movi '00dc' frame payloads, word
  * alignment), and the per-frame payloads decode through the REAL
  * `javax.imageio` codec — Motion-PNG frames make the whole
  * container→frame→pixel chain lossless and closed-form-gateable
  * (q265/q266 + VideoPlumbingSpec). H.264-class inter-frame codecs
  * genuinely need ffmpeg-class libraries this sandbox lacks — THAT
  * remaining branch keeps the deterministic toy header
  * (`decodeStub`); swap it for real bindings on a cluster that has
  * them. Everything around it — schema, batch iteration shape,
  * partitioning, null handling — is the real production plumbing and
  * is tested.
  *
  * Scale notes: decode is embarrassingly parallel → `repartition(n)` by
  * id hash balances skew from variable blob sizes; feature vectors are
  * fixed-width `Array[Float]` so downstream similarity ops reuse the
  * Similarity battery; frame sampling emits one row per frame
  * (explode-shaped), keeping blobs bounded per row.
  */
object Multimodal {

  // ImageIO defaults to FILE-backed stream caches — one temp file
  // created and deleted per encode/decode, which at 24+ executor
  // threads turns the codec path into disk-churn contention (measured:
  // 1.2-1.35 scaling exponents on q225/q226 at sf10). Blobs here are
  // small in-memory byte arrays; memory-cached streams are strictly
  // right. JVM-global, set once on class load of this object.
  javax.imageio.ImageIO.setUseCache(false)

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType), // image | audio | video | unknown
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sampleRate", IntegerType),
    StructField("nFrames", IntegerType),
    StructField("sizeBytes", LongType)))

  /** True for the real image containers the JDK can decode natively
    * (PNG, JPEG, BMP, GIF magic bytes). */
  private def isRealImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG SOI
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'))

  /** Real image decode via the JDK's `javax.imageio`; None when the
    * blob is corrupt or no reader claims it. */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  /** True for the real audio containers the JDK can decode natively:
    * WAV (RIFF…WAVE), AIFF (FORM…AIFF/AIFC), AU (.snd). */
  private def isRealAudio(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
        b(8) == 'A' && b(9) == 'I' && b(10) == 'F') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  // AudioSystem.getAudioInputStream re-resolves its AudioFileReader
  // providers on EVERY call through a JVM-global synchronized service
  // registry — measured on this box: 32 threads decode SLOWER than one
  // (28.5 → 16.5 kops/s total). The provider list is immutable per
  // JVM, so resolve it once; the decoders themselves (the JDK's real
  // WAV/AIFF/AU codecs) are stateless and thread-safe.
  // Second measured trap: the JDK ships a MIDI-sequencer-backed reader
  // (SoftMidiAudioFileReader) AHEAD of the WAV reader in provider
  // order, and its rejection path is both 20× slower than a WAV parse
  // and lock-contended. [[isRealAudio]] only ever admits RIFF/WAVE,
  // AIFF, and AU magic — never MIDI ("MThd") — so the MIDI reader is
  // dropped outright and WAV readers (the common container) try first.
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
      .filterNot(_.getClass.getSimpleName.contains("Midi"))
      .sortBy(r => if (r.getClass.getSimpleName.startsWith("Wave")) 0 else 1)
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` codecs
    * (providers cached — see above); None when the blob is corrupt or
    * no provider claims it. */
  private def decodeAudio(bytes: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return Some(it.next().getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
        case _: java.io.IOException => ()
      }
    }
    None
  }

  /** Metadata decode: REAL `javax.imageio` for image containers, REAL
    * `javax.sound.sampled` for audio containers, toy header for the
    * stubbed kind (video), `unknown` otherwise. */
  private def decode(bytes: Array[Byte]): Row =
    if (isRealImage(bytes))
      decodeImage(bytes) match {
        case Some(img) => Row("image", img.getWidth, img.getHeight,
          null, null, bytes.length.toLong)
        case None => Row("unknown", null, null, null, null,
          bytes.length.toLong) // corrupt container
      }
    else if (isRealAudio(bytes))
      decodeAudio(bytes) match {
        case Some(ais) =>
          val f = ais.getFormat
          val frames = ais.getFrameLength
          ais.close()
          Row("audio", null, null, math.round(f.getSampleRate),
            if (frames >= 0 && frames <= Int.MaxValue) frames.toInt else null,
            bytes.length.toLong)
        case None => Row("unknown", null, null, null, null,
          bytes.length.toLong) // corrupt container
      }
    else if (isRealVideo(bytes))
      demuxAvi(bytes) match {
        case Some((w, h, declared, _)) =>
          Row("video", w, h, null, declared, bytes.length.toLong)
        case None => Row("unknown", null, null, null, null,
          bytes.length.toLong) // corrupt container
      }
    else decodeStub(bytes)

  /** Deterministic fake decode — STUB for the codecs this sandbox
    * genuinely lacks (audio/video). Reads our toy 16-byte header:
    * magic(4) kind(1) w(2) h(2) rate(3) frames(4). */
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

  /** Deterministic grayscale PNG encoder (JDK `javax.imageio`; the
    * fixture generator for the real-decode queries/specs — a pure
    * function of (w, h, gray), so both engines can recompute any pixel
    * closed-form). */
  def encodePng(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic mono 16-bit PCM WAV encoder (JDK
    * `javax.sound.sampled`; the fixture generator for the real-decode
    * audio queries/specs — a pure function of (rate, n, sample), so
    * both engines can recompute any sample closed-form). `sample(i)`
    * is masked to a signed 16-bit value. */
  def encodeWav(rate: Int, n: Int, sample: Int => Int): Array[Byte] = {
    // canonical 44-byte RIFF/WAVE PCM header written directly — the
    // container spec is 11 fixed little-endian fields, and
    // AudioSystem.write pays the same synchronized provider-registry
    // toll as the decode path did (see audioReaders). The DECODE side
    // stays the genuine JDK codec, which AudioPlumbingSpec drives over
    // exactly these bytes.
    val dataLen = 2 * n
    val out = new Array[Byte](44 + dataLen)
    def w32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.indices.foreach(i => out(o + i) = s.charAt(i).toByte)
    tag(0, "RIFF"); w32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16) // PCM fmt chunk is 16 bytes
    out(20) = 1; out(21) = 0 // audio format 1 = PCM
    out(22) = 1; out(23) = 0 // mono
    w32(24, rate); w32(28, rate * 2) // byte rate = rate · blockAlign
    out(32) = 2; out(33) = 0 // block align (1 ch × 16 bit)
    out(34) = 16; out(35) = 0 // bits per sample
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < n) {
      val v = sample(i).toShort
      out(44 + 2 * i) = (v & 0xff).toByte // little-endian PCM16
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** ONE audio decode, many probes: decoded (sampleRate, nFrames) plus
    * the channel-0 PCM16 sample at each frame index `pts(rate, n)`
    * yields (out-of-bounds → -65536, outside the signed-16 range), or
    * None for non-audio/corrupt blobs. Mirrors [[decodeProbe]]: a
    * k-point probe costs one codec pass. Handles both endiannesses and
    * 8/16-bit PCM (8-bit is widened to the 16-bit scale). */
  def audioProbe(bytes: Array[Byte],
      pts: (Int, Int) => Seq[Int]): Option[(Int, Int, Seq[Int])] =
    if (!isRealAudio(bytes)) None
    else decodeAudio(bytes).flatMap { ais =>
      val f = ais.getFormat
      // Only integer-PCM layouts this probe can interpret: signed
      // 16-bit or unsigned 8-bit. Anything else a container may carry
      // (24/32-bit, float, mu-law AU) would silently take the wrong
      // arithmetic path — reject it as non-probe-able instead.
      val enc = f.getEncoding
      val supported =
        (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16) ||
        (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
          f.getSampleSizeInBits == 8)
      if (!supported) { ais.close(); None }
      else {
        val rate = math.round(f.getSampleRate)
        val frameSize = f.getFrameSize
        val declaredFrames = ais.getFrameLength
        val data = ais.readAllBytes()
        ais.close()
        val n = if (frameSize > 0) data.length / frameSize
          else declaredFrames.toInt
        def sampleAt(i: Int): Int =
          if (i < 0 || i >= n) -65536
          else if (f.getSampleSizeInBits == 16) {
            val o = i * frameSize // channel 0 = first sample of the frame
            if (f.isBigEndian) (data(o) << 8) | (data(o + 1) & 0xff)
            else (data(o + 1) << 8) | (data(o) & 0xff)
          } else { // 8-bit: unsigned by WAV convention; center + widen
            val v = data(i * frameSize) & 0xff
            (v - 128) << 8
          }
        Some((rate, n, pts(rate, n).map(sampleAt)))
      }
    }

  /** True for RIFF/AVI video containers. */
  private def isRealVideo(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Minimal but SPEC-CORRECT AVI container writer (RIFF 'AVI ' →
    * LIST hdrl {avih, LIST strl {strh 'vids', strf
    * BITMAPINFOHEADER}} → LIST movi {'00dc' frame chunks,
    * word-aligned}) carrying Motion-PNG frames — 'MPNG' is a
    * registered AVI video codec whose frames are whole PNG images, so
    * the demux side exercises a REAL container walk and a REAL
    * (lossless → closed-form-gateable) frame codec. The fixture
    * generator for the video queries/specs. */
  def encodeAviMpng(w: Int, h: Int,
      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      cc(id) ++ u32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      cc("LIST") ++ u32(body.length + 4) ++ cc(kind) ++ body
    val pngs = frames.map(f => encodePng(w, h, f))
    val maxBuf = if (pngs.isEmpty) 0 else pngs.map(_.length).max
    val avih = u32(100000) ++ u32(0) ++ u32(0) ++ u32(0) ++ // usec/frame…
      u32(frames.length) ++ u32(0) ++ u32(1) ++ u32(maxBuf) ++
      u32(w) ++ u32(h) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val strh = cc("vids") ++ cc("MPNG") ++ u32(0) ++ u16(0) ++ u16(0) ++
      u32(0) ++ u32(1) ++ u32(10) ++ u32(0) ++ // scale 1, rate 10 fps
      u32(frames.length) ++ u32(maxBuf) ++ u32(0xffffffff.toInt) ++
      u32(0) ++ u16(0) ++ u16(0) ++ u16(w) ++ u16(h)
    val strf = u32(40) ++ u32(w) ++ u32(h) ++ u16(1) ++ u16(24) ++
      cc("MPNG") ++ u32(w * h * 3) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      pngs.map(p => chunk("00dc", p)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = cc("AVI ") ++ hdrl ++ movi
    bos.write(cc("RIFF")); bos.write(u32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Real AVI demux: walk the RIFF chunk tree (sizes little-endian,
    * odd chunks padded to word boundaries), read the declared geometry
    * from the strf BITMAPINFOHEADER and the frame count from avih, and
    * collect the '00dc'/'00db' frame payloads from LIST movi. Returns
    * (width, height, declaredFrames, frames) or None when the
    * container is corrupt/truncated. Frame payloads decode through
    * [[decodeImage]] (real PNG/JPEG codec) downstream — this pair is
    * the Motion-PNG/MJPEG-class video path; H.264-class streams still
    * need ffmpeg-class libraries this sandbox lacks. */
  def demuxAvi(bytes: Array[Byte])
      : Option[(Int, Int, Int, Seq[Array[Byte]])] = {
    if (!isRealVideo(bytes)) return None
    def u32(o: Int): Int =
      if (o + 4 > bytes.length) -1
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def cc(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes, o, 4, "US-ASCII")
    val riffEnd = math.min(8L + u32(4), bytes.length.toLong).toInt
    if (riffEnd < 12) return None
    var w = -1; var h = -1; var declared = -1
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Boolean = {
      var o = from
      while (o + 8 <= to) {
        val id = cc(o); val sz = u32(o + 4)
        if (sz < 0 || o + 8 + sz > to) return false // truncated chunk
        id match {
          case "LIST" =>
            if (sz < 4) return false
            if (!walk(o + 12, o + 8 + sz)) return false
          case "avih" => if (sz >= 40) declared = u32(o + 8 + 16)
          case "strf" => if (sz >= 12) { w = u32(o + 8 + 4); h = u32(o + 8 + 8) }
          case "00dc" | "00db" =>
            frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + sz)
          case _ => ()
        }
        o += 8 + sz + (sz & 1) // word alignment
      }
      true
    }
    if (!walk(12, riffEnd)) None
    else if (w < 0 || declared < 0) None // headers missing
    else Some((w, h, declared, frames.result()))
  }

  /** Resample for "audio" blobs: integer DECIMATION by `factor` —
    * keep every factor-th PCM16 channel-0 sample (the audio analog of
    * [[resize]]'s nearest-neighbor raster rule: our own loop, no
    * interpolation filter, so the result is bit-deterministic and
    * closed-form recomputable) and re-encode as mono WAV at
    * rate div factor. REAL containers take the real decode path;
    * non-audio / corrupt blobs pass through unchanged (the [[resize]]
    * contract). */
  def resampleAudio(df: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val outSchema = StructType(df.schema.fields :+
      StructField("resampled", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val out =
          if (!isRealAudio(bytes)) bytes
          else audioProbe(bytes, (_, n) => 0 until n by factor) match {
            case None => bytes // corrupt real container: pass through
            case Some((rate, _, kept)) =>
              encodeWav(math.max(rate / factor, 1), kept.length,
                i => kept(i))
          }
        Row.fromSeq(row.toSeq :+ out)
      }
    }(enc)
  }

  /** Raw raster sample for single-band (grayscale) images —
    * `getRGB` would route TYPE_BYTE_GRAY through sRGB color
    * management (gamma), destroying integer-exactness — and integer
    * luminance for multi-band images. */
  private def graySample(img: java.awt.image.BufferedImage,
      x: Int, y: Int): Int =
    if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
    else {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
    }

  /** ONE decode, many probes: decoded (width, height) plus the gray
    * value at each point `pts(w, h)` yields (out-of-bounds → -1), or
    * None for non-image/corrupt blobs. The per-row batch form of
    * [[grayAt]] — a k-point probe costs one codec pass, not k
    * (measured: the per-probe re-decode was the whole q225/q226 cost
    * at sf10). */
  def decodeProbe(bytes: Array[Byte],
      pts: (Int, Int) => Seq[(Int, Int)]): Option[(Int, Int, Seq[Int])] =
    if (!isRealImage(bytes)) None
    else decodeImage(bytes).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      (w, h, pts(w, h).map { case (x, y) =>
        if (x >= 0 && y >= 0 && x < w && y < h) graySample(img, x, y)
        else -1 })
    }

  /** Decoded gray value at (x, y), or -1 when the blob is not a
    * decodable real image or the point is out of bounds.
    * Executor-side probe for the real-decode queries/specs (one decode
    * per call — batch probes should use [[decodeProbe]]). */
  def grayAt(bytes: Array[Byte], x: Int, y: Int): Int =
    if (!isRealImage(bytes)) -1
    else decodeImage(bytes) match {
      case Some(img) if x >= 0 && y >= 0 &&
          x < img.getWidth && y < img.getHeight => graySample(img, x, y)
      case _ => -1
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
        Row.fromSeq(row.toSeq :+ decode(row.getAs[Array[Byte]](binIdx)))
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
    * (targetW × targetH). REAL images (PNG/JPEG/BMP/GIF) take the real
    * path: `javax.imageio` decode → integer nearest-neighbor sample
    * (src = ⌊x·w0/W⌋ — our own loop, no Graphics2D filtering, so the
    * result is bit-deterministic across platforms) → grayscale PNG
    * re-encode. Toy-header images keep the raster stub. The contract
    * either way is production-real: binary in → binary out, output
    * raster exactly targetW·targetH regardless of input size (the
    * property that makes downstream batches fixed-width),
    * deterministic, non-image/undecodable blobs pass through
    * unchanged. */
  def resize(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("resized", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex("content")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        lazy val real = decodeImage(bytes)
        val meta = if (isRealImage(bytes)) null else decodeStub(bytes)
        val out =
          if (meta == null) real match {
            case None => bytes // corrupt real container: pass through
            case Some(img) =>
              val (w0, h0) = (img.getWidth, img.getHeight)
              encodePng(targetW, targetH, (x, y) => {
                val sx = (x.toLong * w0 / targetW).toInt
                val sy = (y.toLong * h0 / targetH).toInt
                graySample(img, sx, sy)
              })
          }
          else if (meta.getString(0) != "image" || meta.isNullAt(1)) bytes
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

  /** Frame sampling for "video" blobs: every `stride`-th frame becomes
    * one row (id, frameIdx, frame). REAL AVI containers take the real
    * path — [[demuxAvi]] walks the RIFF chunk tree and emits the
    * '00dc' payloads (PNG/JPEG images, decodable by [[decodeImage]]);
    * corrupt AVIs emit nothing. Toy-header blobs keep the fixed-size
    * chunking stub (`frameBytes` applies only there). */
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
        if (isRealVideo(bytes))
          demuxAvi(bytes) match {
            case Some((_, _, _, frames)) =>
              (0 until frames.length by stride).iterator.map { f =>
                Row(id, f, frames(f))
              }
            case None => Iterator.empty // corrupt container
          }
        else if (bytes == null || bytes.length <= 16) Iterator.empty
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
