package graft.ops

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Eighteenth wave (round 8): REAL image decode through the JDK's
  * built-in `javax.imageio` — the round-7 verdict's "the image half of
  * the multimodal stub needs no external libraries" lead. Each query
  * GENERATES real grayscale PNGs on the executors from a closed-form
  * pixel function of the document row, pushes them through the
  * production plumbing (`Multimodal.withMeta` / `Multimodal.resize`,
  * both now running a genuine PNG codec for real containers), and
  * reports decoded dimensions plus probed pixel values. The DuckDB
  * oracle recomputes every reported number from the same closed form —
  * so a green hash proves the real encode → decode → (resample →
  * re-encode → decode) round-trip is bit-exact, not just shaped right.
  *
  * Scale shape: codec work is embarrassingly parallel per row (no
  * shuffle added by the decode stages); outputs are one bounded row
  * per document, ordered by key. Audio/video remain stubbed — those
  * codecs genuinely don't exist in this sandbox. */
object Wave18 {

  // Shared generative geometry: w ∈ [4,64], h ∈ [4,48], pixel
  // gray(x,y) = (7·doc_id + 31x + 17y) mod 256 — closed-form in both
  // engines, non-degenerate in both axes.
  private def geometry(s: SparkSession, dir: String) =
    load(s, dir, "documents").select(col("doc_id"),
      expr("CAST(n_chars % 61 + 4 AS INT)").as("w"),
      expr("CAST(doc_id % 45 + 4 AS INT)").as("h"))

  private def gray(id: Long)(x: Int, y: Int): Int =
    ((id * 7 + x * 31 + y * 17) % 256).toInt

  // ------------------------------------------------------------- q225

  /** q225: REAL PNG DECODE — encode each document's generative raster
    * as a genuine grayscale PNG (`ImageIO.write`), decode it back
    * through `Multimodal.withMeta`'s real-image path (`ImageIO.read`),
    * and probe three raster corners from the DECODED image using the
    * DECODED dimensions. The oracle recomputes width, height, and all
    * three gray values from the closed form — any header
    * misinterpretation, stride bug, or color-management drift (the
    * `getRGB` sRGB-gamma trap) flips the hash. */
  private def qPngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = geometry(s, dir).as[(Long, Int, Int)]
      .map { case (id, w, h) => (id, Multimodal.encodePng(w, h, gray(id))) }
      .toDF("id", "content")
    Multimodal.withMeta(blobs)
      .select(col("id"), col("meta.kind").as("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, c) =>
        // one decode serves dims + all three probes (decodeProbe);
        // the probe coords come from the DECODED dimensions
        val (w, h, ps) = Multimodal.decodeProbe(c, (w, h) =>
          Seq((0, 0), (w / 2, h / 2), (w - 1, h - 1)))
          .getOrElse((-1, -1, Seq(-1, -1, -1)))
        (id, kind, w, h, ps(0), ps(1), ps(2))
      }
      .toDF("doc_id", "kind", "width", "height", "p00", "pmid", "pend")
      .orderBy(col("doc_id"))
  }

  private val qPngDecodeSql =
    """SELECT doc_id, 'image' AS kind,
      |  CAST(n_chars % 61 + 4 AS INT) AS width,
      |  CAST(doc_id % 45 + 4 AS INT) AS height,
      |  CAST((doc_id * 7) % 256 AS INT) AS p00,
      |  CAST((doc_id * 7 + ((n_chars % 61 + 4) // 2) * 31
      |        + ((doc_id % 45 + 4) // 2) * 17) % 256 AS INT) AS pmid,
      |  CAST((doc_id * 7 + (n_chars % 61 + 3) * 31
      |        + (doc_id % 45 + 3) * 17) % 256 AS INT) AS pend
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q226

  /** q226: REAL PNG RESIZE ROUND-TRIP — the same generated PNGs pushed
    * through `Multimodal.resize(16, 12)`'s real path (decode →
    * integer nearest-neighbor resample sx = ⌊x·w0/W⌋ → PNG re-encode),
    * then DECODED AGAIN and probed. The oracle replays the resample
    * arithmetic closed-form, so the gate pins the full
    * decode→scale→encode→decode chain bit-exactly; the fixed 16×12
    * output raster is the fixed-width contract downstream batches rely
    * on. */
  private def qPngResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = geometry(s, dir).as[(Long, Int, Int)]
      .map { case (id, w, h) => (id, Multimodal.encodePng(w, h, gray(id))) }
      .toDF("id", "content")
    Multimodal.resize(blobs, targetW = 16, targetH = 12)
      .select(col("id"), col("resized"))
      .as[(Long, Array[Byte])]
      .map { case (id, r) =>
        val ps = Multimodal.decodeProbe(r,
          (_, _) => Seq((0, 0), (8, 6), (15, 11)))
          .map(_._3).getOrElse(Seq(-1, -1, -1))
        (id, ps(0), ps(1), ps(2))
      }
      .toDF("doc_id", "p00", "pmid", "pend")
      .orderBy(col("doc_id"))
  }

  private val qPngResizeSql =
    """WITH d AS (
      |  SELECT doc_id, n_chars % 61 + 4 AS w0, doc_id % 45 + 4 AS h0
      |  FROM documents)
      |SELECT doc_id,
      |  CAST((doc_id * 7) % 256 AS INT) AS p00,
      |  CAST((doc_id * 7 + ((8 * w0) // 16) * 31
      |        + ((6 * h0) // 12) * 17) % 256 AS INT) AS pmid,
      |  CAST((doc_id * 7 + ((15 * w0) // 16) * 31
      |        + ((11 * h0) // 12) * 17) % 256 AS INT) AS pend
      |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q253

  /** q253: IMAGE-CORPUS DECODE-HEALTH audit (round 8, wave 29) — the
    * ingestion-time report a multimodal pipeline runs before training:
    * per source, how many blobs decode at all, and the brightness
    * profile of the ones that do. A deterministic seventh of the blobs
    * is CORRUPTED (container magic intact, IHDR truncated), so the
    * gate exercises the real `ImageIO` failure path — corrupt blobs
    * must land in `n_corrupt` via `decodeProbe`'s None, never crash an
    * executor, never contribute to the brightness sum. The oracle
    * recomputes the corruption rule and every valid mid-pixel closed
    * form. Decode stays embarrassingly parallel; the report is one
    * per-source groupBy. */
  private def qImageHealth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = load(s, dir, "documents").select(col("doc_id"),
      col("source"),
      expr("CAST(n_chars % 61 + 4 AS INT)").as("w"),
      expr("CAST(doc_id % 45 + 4 AS INT)").as("h"))
    val probed = src.as[(Long, String, Int, Int)]
      .map { case (id, source, w, h) =>
        val png = Multimodal.encodePng(w, h, gray(id))
        // deterministic corruption: magic survives, header does not
        val blob = if (id % 7 == 0) png.take(12) else png
        Multimodal.decodeProbe(blob, (dw, dh) => Seq((dw / 2, dh / 2)))
        match {
          case Some((_, _, ps)) => (source, 0L, ps.head.toLong)
          case None => (source, 1L, 0L)
        }
      }
      .toDF("source", "corrupt", "pmid")
    probed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("corrupt")).as("n_corrupt"),
        sum(col("pmid")).as("sum_mid"))
      .select(col("source"), col("n_images"), col("n_corrupt"),
        expr("n_corrupt * 1000000 div n_images").as("corrupt_ppm"),
        expr("CASE WHEN n_images = n_corrupt THEN 0 ELSE " +
          "sum_mid * 1000000 div (n_images - n_corrupt) END")
          .as("mean_mid_micro"))
      .orderBy(col("source"))
  }

  private val qImageHealthSql =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars % 61 + 4 AS w, doc_id % 45 + 4 AS h,
      |    CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS corrupt
      |  FROM documents),
      |p AS (
      |  SELECT source, corrupt,
      |    CASE WHEN corrupt = 1 THEN 0
      |      ELSE (doc_id * 7 + (w // 2) * 31 + (h // 2) * 17) % 256
      |      END AS pmid
      |  FROM d)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_images,
      |  CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
      |  CAST(SUM(corrupt) * 1000000 // COUNT(*) AS BIGINT) AS corrupt_ppm,
      |  CAST(CASE WHEN COUNT(*) = SUM(corrupt) THEN 0 ELSE
      |    SUM(pmid) * 1000000 // (COUNT(*) - SUM(corrupt)) END AS BIGINT)
      |    AS mean_mid_micro
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q225_png_decode" -> QueryDef(qPngDecode, Some(qPngDecodeSql),
      "real javax.imageio PNG decode through the multimodal meta path"),
    "q226_png_resize" -> QueryDef(qPngResize, Some(qPngResizeSql),
      "real PNG decode->nearest-neighbor resample->re-encode round-trip"),
    "q253_image_health" -> QueryDef(qImageHealth, Some(qImageHealthSql),
      "per-source decode-health + brightness audit over corrupted blobs"))
}
