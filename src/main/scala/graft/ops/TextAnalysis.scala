package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import Tables.load

/** Text-analysis operators a large-scale training-data pipeline needs:
  * token statistics, quality scoring, language-ID heuristics, document
  * fingerprinting. All are single-pass narrow projections + one hash
  * aggregation — no shuffle beyond the final groupBy, so they scale
  * linearly with the corpus.
  */
object TextAnalysis {

  /** Whitespace token counting + type-token ratio. */
  private def qStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast(LongType)
          .as("n_uniq_tokens"),
        expr("length(replace(text, ' ', ''))").cast(LongType)
          .as("n_token_chars"))
      .withColumn("avg_token_len",
        col("n_token_chars").cast(DoubleType) / col("n_tokens"))
      .withColumn("ttr",
        col("n_uniq_tokens").cast(DoubleType) / col("n_tokens"))
      .orderBy(col("doc_id"))

  private val qStatsSql =
    """SELECT doc_id,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
      | CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_token_chars,
      | CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
      | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |   / len(string_split(text, ' ')) AS ttr
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Quality scoring: stopword ratio + type-token ratio + length gate
    * (the length/punct/stopword-ratio class of corpus filters). */
  private def qQuality(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        expr("size(filter(split(text, ' '), w -> w IN ('the', 'a')))")
          .cast(LongType).as("n_stop"),
        size(array_distinct(split(col("text"), " "))).cast(LongType)
          .as("n_uniq"))
      .withColumn("stop_ratio",
        col("n_stop").cast(DoubleType) / col("n_tokens"))
      .withColumn("score",
        (col("n_uniq").cast(DoubleType) / col("n_tokens")) *
          (lit(1.0) - col("stop_ratio")))
      .withColumn("is_quality",
        col("n_tokens").between(20, 400) && col("stop_ratio") < 0.2)
      .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "score",
        "is_quality")
      .orderBy(col("doc_id"))

  private val qQualitySql =
    """SELECT doc_id, n_tokens, n_stop,
      | CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      | (CAST(n_uniq AS DOUBLE) / n_tokens) * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) AS score,
      | n_tokens BETWEEN 20 AND 400 AND CAST(n_stop AS DOUBLE) / n_tokens < 0.2 AS is_quality
      |FROM (
      |  SELECT doc_id,
      |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: marker-token ratio + mean token length
    * decide the predicted tag (an n-gram-frequency classifier shape,
    * deterministic so the oracle can mirror it). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("actual_lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        expr("size(filter(split(text, ' '), w -> w IN ('the', 'a')))")
          .cast(LongType).as("n_stop"),
        expr("length(replace(text, ' ', ''))").cast(LongType).as("n_chars"))
      .withColumn("stop_ratio",
        col("n_stop").cast(DoubleType) / col("n_tokens"))
      .withColumn("avg_len",
        col("n_chars").cast(DoubleType) / col("n_tokens"))
      .withColumn("predicted_lang",
        when(col("stop_ratio") >= 0.1, "en")
          .when(col("avg_len") >= 4.8, "de")
          .otherwise("unk"))
      .select("doc_id", "actual_lang", "predicted_lang", "stop_ratio")
      .orderBy(col("doc_id"))

  private val qLangIdSql =
    """SELECT doc_id, lang AS actual_lang,
      | CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.1 THEN 'en'
      |      WHEN CAST(n_chars AS DOUBLE) / n_tokens >= 4.8 THEN 'de'
      |      ELSE 'unk' END AS predicted_lang,
      | CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio
      |FROM (
      |  SELECT doc_id, lang,
      |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
      |   CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: hash of the 8-token prefix shingle —
    * groups near-identical leads (the content-defined-fingerprint
    * class; rolling-hash winnowing lives in the non-oracle surface). */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
          .as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc"))
      .orderBy(col("fingerprint"))

  private val qFingerprintSql =
    """SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fingerprint,
      | COUNT(*) AS n_docs, min(doc_id) AS keeper_doc
      |FROM documents
      |GROUP BY 1 ORDER BY fingerprint""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q30_text_token_stats" -> QueryDef(qStats, Some(qStatsSql),
      "token counting + type-token ratio"),
    "q31_text_quality" -> QueryDef(qQuality, Some(qQualitySql),
      "quality scoring (stopword/length gates)"),
    "q32_text_langid" -> QueryDef(qLangId, Some(qLangIdSql),
      "language-ID heuristic"),
    "q33_text_fingerprint" -> QueryDef(qFingerprint, Some(qFingerprintSql),
      "prefix-shingle document fingerprint"))
}
