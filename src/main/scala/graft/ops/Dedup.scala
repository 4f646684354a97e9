package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import Tables.load

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard. Scale notes:
  *  - exact dedup is one hash aggregation on the content hash;
  *  - MinHash+LSH is shingle-explode → per-doc signature agg → band
  *    explode → '''shuffle on band key''' — candidate pairs only ever form
  *    inside a bucket, which is what keeps it sub-quadratic at 100 TB;
  *  - pairwise Jaccard is restricted to LSH-style candidate scopes (here
  *    a language partition) — never the full cross product.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy, min doc id is the keeper. */
  private def qExact(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_doc"))
      .orderBy(col("content_hash"))

  private val qExactSql =
    """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
      | min(doc_id) AS keeper_doc
      |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin

  private val NumHashes = 8
  private val Bands = 4 // 2 hashes per band

  /** MinHash+LSH candidate pairs: word-3-shingles → 8 min-hashes (min of
    * keyed md5 over the shingle set) → 4 bands → docs sharing any band.
    * Hash family = lexicographic min of `md5("i:" + shingle)` so the
    * DuckDB oracle reproduces it bit-for-bit. */
  private def qMinHash(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val shingles = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
        .as("sh"))
      .distinct()
    val hashAggs = (0 until NumHashes)
      .map(i => min(md5(concat(lit(s"$i:"), col("sh")))).as(s"h$i"))
    val sigs = shingles.groupBy(col("doc_id"))
      .agg(hashAggs.head, hashAggs.tail: _*)
    val bandCols = (0 until Bands).map(b =>
      md5(concat(lit(s"$b:"), col(s"h${2 * b}"), col(s"h${2 * b + 1}"))))
    val bands = sigs.select(col("doc_id"),
      explode(array(bandCols: _*)).as("band"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val qMinHashSql = {
    val hs = (0 until NumHashes)
      .map(i => s"min(md5('$i:' || sh)) AS h$i").mkString(",\n   ")
    val bs = (0 until Bands)
      .map(b => s"md5('$b:' || h${2 * b} || h${2 * b + 1})").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |   unnest(list_transform(range(1, len(ws) - 1),
       |     i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
       |  FROM w),
       |sig AS (
       |  SELECT doc_id,
       |   $hs
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, unnest([$bs]) AS band FROM sig)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.doc_id < y.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  private val HighHex = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** 16-bit SimHash over the distinct word set: bit j votes by the j-th
    * hex digit's high bit of md5(word). */
  private def qSimHash(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
    val bitAggs = (0 until 16).map(j =>
      sum(when(substring(md5(col("w")), j + 1, 1).isInCollection(HighHex),
        1).otherwise(-1)).as(s"b$j"))
    val fp: Column = (0 until 16)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    words.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .orderBy(col("doc_id"))
  }

  private val qSimHashSql = {
    val sums = (0 until 16).map(j =>
      s"sum(CASE WHEN substring(md5(w), ${j + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n   ")
    val fp = (0 until 16)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    s"""SELECT doc_id, CAST($fp AS BIGINT) AS simhash
       |FROM (
       |  SELECT doc_id,
       |   $sums
       |  FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
       |        FROM documents) t
       |  GROUP BY doc_id) b
       |ORDER BY doc_id""".stripMargin
  }

  /** Word-set Jaccard near-dup pairs inside one candidate scope (lang
    * partition) — the verify stage that follows LSH candidate
    * generation. */
  private def qJaccard(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .filter(col("lang") === "de")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    d.as("a")
      .join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.ws"), col("b.ws"))).cast(LongType))
      .withColumn("uni",
        size(col("a.ws")).cast(LongType) + size(col("b.ws")) - col("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val qJaccardSql =
    """WITH d AS (
      |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      |  FROM documents WHERE lang = 'de')
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      | CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
      |   / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
      |   / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q34_dedup_exact" -> QueryDef(qExact, Some(qExactSql),
      "exact dedup via content-hash groupBy"),
    "q35_dedup_minhash_lsh" -> QueryDef(qMinHash, Some(qMinHashSql),
      "MinHash+LSH candidate pairs (shingle→signature→band→bucket join)"),
    "q36_dedup_simhash" -> QueryDef(qSimHash, Some(qSimHashSql),
      "16-bit SimHash fingerprints"),
    "q37_dedup_ngram_jaccard" -> QueryDef(qJaccard, Some(qJaccardSql),
      "word-set Jaccard near-dup pairs within candidate scope"))
}
