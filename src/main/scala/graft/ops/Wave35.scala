package graft.ops

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Thirty-fifth wave (round 9):
  *
  *  - q263: ONE-PASS TABLE PROFILE — the Deequ-style column-statistics
  *    audit a platform runs before accepting a 100 TB drop: per
  *    column, row/null counts, EXACT distinct count, and the
  *    mergeable-sketch distinct ESTIMATE from the engine's own
  *    `graft_kmv` aggregate (the production path — at scale the exact
  *    branch is the one you delete, and the sketch moves ≤k values
  *    per (partition, column) through the shuffle). One melt
  *    (`stack`) scans the table once into (column, value) rows;
  *    values are canonicalized to strings both engines render
  *    identically (BIGINT/dates/flags), hashed by the md5-hex device
  *    (q166), and every statistic is oracle-gated — including the
  *    estimator itself.
  *  - q264: REAL AUDIO RESAMPLE ROUND-TRIP — q226's device on the
  *    audio axis: generated WAVs pushed through
  *    `Multimodal.resampleAudio` (real decode → integer decimation
  *    keep-every-3rd → WAV re-encode at rate/3), DECODED AGAIN and
  *    probed; the oracle replays the decimation arithmetic closed
  *    form, pinning the full decode→decimate→encode→decode chain
  *    bit-exactly.
  *
  * Scale shapes: q263 is one scan + a 5-group aggregate (columns are
  * the groups — map-side partials collapse each partition to 5 sketch
  * buffers); q264 decode is embarrassingly parallel, one bounded row
  * per document. */
object Wave35 {

  // ------------------------------------------------------------- q263

  private val ProfK = 256
  private val ProfM = 281474976710656L // 2^48, the 12-hex-char space

  private def qTableProfile(s: SparkSession, dir: String): DataFrame = {
    graft.functions.KmvSketch.register(s)
    load(s, dir, "lineitem").selectExpr(
      """stack(5,
        |  'l_partkey',    CAST(l_partkey AS STRING),
        |  'l_suppkey',    CAST(l_suppkey AS STRING),
        |  'l_quantity',   CAST(CAST(l_quantity AS BIGINT) AS STRING),
        |  'l_returnflag', CAST(l_returnflag AS STRING),
        |  'l_shipdate',   CAST(l_shipdate AS STRING)
        |) AS (col_name, v)""".stripMargin)
      .createOrReplaceTempView("graft_q263_melt")
    s.sql(s"""
      |SELECT col_name, n_rows, n_null, ndv_exact,
      |  CASE WHEN size(sk) < $ProfK THEN CAST(size(sk) AS BIGINT)
      |    ELSE (${ProfK - 1} * ${ProfM}L) div element_at(sk, size(sk))
      |    END AS ndv_est,
      |  min_s, max_s
      |FROM (
      |  SELECT col_name,
      |    COUNT(*) AS n_rows,
      |    COUNT(*) - COUNT(v) AS n_null,
      |    COUNT(DISTINCT v) AS ndv_exact,
      |    graft_kmv(CAST(conv(substring(md5(v), 1, 12), 16, 10)
      |      AS BIGINT), $ProfK) AS sk,
      |    MIN(v) AS min_s, MAX(v) AS max_s
      |  FROM graft_q263_melt
      |  GROUP BY col_name) t
      |ORDER BY col_name""".stripMargin)
  }

  private val qTableProfileSql =
    s"""WITH melt AS (
       |  SELECT 'l_partkey' AS col_name, CAST(l_partkey AS VARCHAR) AS v
       |    FROM lineitem
       |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR)
       |    FROM lineitem
       |  UNION ALL SELECT 'l_quantity',
       |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) FROM lineitem
       |  UNION ALL SELECT 'l_returnflag', CAST(l_returnflag AS VARCHAR)
       |    FROM lineitem
       |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR)
       |    FROM lineitem),
       |h AS (
       |  SELECT col_name, v,
       |    CAST(('0x' || substring(md5(v), 1, 12)) AS BIGINT) AS hv
       |  FROM melt),
       |-- top-$ProfK per column via row_number, NOT
       |-- array_agg(DISTINCT .. ORDER BY ..)[1:k]: the array form
       |-- materializes a fully sorted multi-million-element list per
       |-- group and ground for ~30+ min on the 30M-row sf1 melt; the
       |-- windowed form is one sort + an early cut (same result)
       |hd AS (SELECT DISTINCT col_name, hv FROM h
       |       WHERE hv IS NOT NULL),
       |hr AS (SELECT col_name, hv, row_number() OVER
       |         (PARTITION BY col_name ORDER BY hv) AS rn FROM hd),
       |sk AS (
       |  SELECT col_name, array_agg(hv ORDER BY hv) AS sk
       |  FROM hr WHERE rn <= $ProfK GROUP BY 1)
       |SELECT m.col_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) - COUNT(m.v) AS BIGINT) AS n_null,
       |  CAST(COUNT(DISTINCT m.v) AS BIGINT) AS ndv_exact,
       |  CAST(CASE WHEN len(s.sk) < $ProfK THEN len(s.sk)
       |    ELSE (${ProfK - 1} * $ProfM) // s.sk[len(s.sk)] END
       |    AS BIGINT) AS ndv_est,
       |  MIN(m.v) AS min_s, MAX(m.v) AS max_s
       |FROM melt m JOIN sk s ON s.col_name = m.col_name
       |GROUP BY m.col_name, s.sk
       |ORDER BY m.col_name""".stripMargin

  // ------------------------------------------------------------- q264

  /** Same generative signal family as q256 (Wave31). */
  private def qWavResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = load(s, dir, "documents").select(col("doc_id"),
        expr("CAST(8000 + (doc_id % 3) * 4000 AS INT)").as("rate"),
        expr("CAST(n_chars % 97 + 5 AS INT)").as("n"))
      .as[(Long, Int, Int)]
      .map { case (id, rate, n) =>
        (id, Multimodal.encodeWav(rate, n,
          i => (((id * 13 + i.toLong * 37) % 65536) - 32768).toInt))
      }
      .toDF("id", "content")
    Multimodal.resampleAudio(blobs, factor = 3)
      .select(col("id"), col("resampled"))
      .as[(Long, Array[Byte])]
      .map { case (id, r) =>
        val (rate, n, ps) = Multimodal.audioProbe(r,
          (_, n) => Seq(0, n / 2, n - 1))
          .getOrElse((-1, -1, Seq(-65536, -65536, -65536)))
        (id, rate, n, ps(0), ps(1), ps(2))
      }
      .toDF("doc_id", "rate2", "n2", "s0", "smid", "send")
      .orderBy(col("doc_id"))
  }

  /** Decimation replay: n' = ⌈n/3⌉, rate' = rate div 3, kept sample j
    * is original sample 3j. */
  private val qWavResampleSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    (8000 + (doc_id % 3) * 4000) // 3 AS rate2,
      |    (n_chars % 97 + 5 + 2) // 3 AS n2,
      |    n_chars % 97 + 5 AS n
      |  FROM documents)
      |SELECT doc_id, CAST(rate2 AS INT) AS rate2, CAST(n2 AS INT) AS n2,
      |  CAST((doc_id * 13) % 65536 - 32768 AS INT) AS s0,
      |  CAST((doc_id * 13 + ((n2 // 2) * 3) * 37) % 65536 - 32768
      |    AS INT) AS smid,
      |  CAST((doc_id * 13 + ((n2 - 1) * 3) * 37) % 65536 - 32768
      |    AS INT) AS send
      |FROM d ORDER BY doc_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q263_table_profile" -> QueryDef(qTableProfile, Some(qTableProfileSql),
      "one-pass Deequ-style column profile: null/exact-distinct counts " +
        "+ the native graft_kmv distinct estimate, all oracle-gated"),
    "q264_wav_resample" -> QueryDef(qWavResample, Some(qWavResampleSql),
      "real audio decode->integer decimation->re-encode->decode " +
        "round-trip, closed-form sample oracle"))
}
