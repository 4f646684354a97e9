package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Embedding similarity search. Brute-force cosine top-k is the exact
  * baseline; the LSH (sign-random-projection) variant is the scale path:
  * bucket on the hyperplane sign pattern → shuffle on bucket key →
  * candidates only form inside a bucket (sub-quadratic, same shape as the
  * MinHash band join).
  */
object Similarity {

  /** Codegen dot product (graft.functions.DotProduct) — same left-to-
    * right summation order as the interpreted fold and DuckDB's
    * list_dot_product, so oracle hashes are unaffected. */
  private def dot(a: Column, b: Column): Column = graft.functions.vec.dot(a, b)

  private def withNorm(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** Brute-force cosine top-10 for the first 5 query vectors; rank-only
    * output so ULP-level float differences between engines cannot flip
    * the hash (ranks are tie-broken by neighbor id). */
  private def qTopK(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(s, dir)
    val q = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("norm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    base.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id").as("nid"), col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  private val qTopKSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
      |p AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
      |       list_dot_product(q.v, x.v) / (q.norm * x.norm) AS cos
      |      FROM n q JOIN n x ON q.vec_id < 5 AND x.vec_id <> q.vec_id),
      |r AS (SELECT qid, nid,
      |       ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
      |      FROM p)
      |SELECT qid, nid, rnk FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  /** Embedding-cosine near-dup pairs (the dedup flavor): all pairs with
    * cosine ≥ 0.4 (data max is ~0.51, so this is a sparse candidate
    * set well clear of the threshold's ULP neighborhood). */
  private def qNearDup(s: SparkSession, dir: String): DataFrame = {
    val base = withNorm(s, dir)
    val a = base.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("norm").as("na"))
    val b = base.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  private val qNearDupSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Deterministic sign-random-projection hyperplanes (seeded — NOT
    * wall-clock random; the bucket function must be stable across runs
    * and engines). */
  private[graft] def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Multi-probe LSH ANN: 6 hyperplane sign bits → 64 buckets; each
    * query probes its own bucket plus all buckets at Hamming distance 1
    * (7 probes) — the standard multi-probe trick that recovers most of
    * the recall lost to boundary-crossing neighbors at ~7× candidate
    * cost instead of 64×. Neighbors ranked over the union of probed
    * buckets. Rows-only check (the bucket function is not SQL-portable);
    * recall vs brute force is asserted in SimilaritySpec. */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val nBits = 6
    val ps = planes(nBits, 64)
    val bucket: Column = ps.zipWithIndex.map { case (p, j) =>
      val lits = array(p.map(lit): _*)
      when(dot(col("v"), lits) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val base = withNorm(s, dir).withColumn("bucket", bucket)
    val probes = array((lit(0) +: (0 until nBits).map(j => lit(1 << j))): _*)
    val q = base.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("norm").as("qn"),
        explode(probes).as("flip"), col("bucket"))
      .select(col("qid"), col("qv"), col("qn"),
        expr("int(bucket ^ flip)").as("qbucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    base.join(q,
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("vec_id").as("nid"), col("rnk"),
        col("bucket"))
      .orderBy(col("qid"), col("rnk"))
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q38_sim_cosine_topk" -> QueryDef(qTopK, Some(qTopKSql),
      "brute-force cosine top-k (exact ANN baseline)"),
    "q39_sim_ann_lsh" -> QueryDef(qAnnLsh, None,
      "LSH sign-random-projection bucketed ANN (rows-only; recall tested)"),
    "q40_sim_cosine_neardup" -> QueryDef(qNearDup, Some(qNearDupSql),
      "embedding-cosine near-dup pairs"))
}
