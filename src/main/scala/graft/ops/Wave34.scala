package graft.ops

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import Tables.load

/** Thirty-fourth wave (round 9):
  *
  *  - q261: MMR (maximal-marginal-relevance) DIVERSIFIED RE-RANKING —
  *    the standard post-retrieval step that trades relevance against
  *    redundancy: pick argmax of λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
  *    greedily, k times. The DISTRIBUTED part is candidate scoring +
  *    pool selection (integer-grid dot products against the query
  *    vector, then TakeOrdered-64 — exactly how production MMR
  *    re-ranks a bounded retrieval pool, never the corpus); the greedy
  *    loop runs on the ≤64-row pool. λ = 7/10 stays integral
  *    (score = 7·rel − 3·maxsim); ties break on vec_id, so the whole
  *    pick sequence is hash-gateable — the DuckDB oracle replays all
  *    ten greedy rounds as unrolled materialized CTEs over the same
  *    pool and pairwise-dot table.
  *  - q262: STREAMING DECODE-HEALTH parity — q257's audio audit run
  *    through Structured Streaming: the corpus geometry is staged as
  *    time-ordered file slices, each micro-batch encodes + decodes its
  *    rows through the REAL `javax.sound.sampled` path inside the
  *    stream (typed map, no state), the per-row decode verdicts land
  *    in a parquet sink, and the per-source report aggregates the
  *    read-back. Gate: identical to q257's oracle — streaming == batch
  *    for the codec path (the q26==q27 device applied to multimodal).
  *
  * Scale shapes: q261 scoring is one broadcast-join pass + TakeOrdered
  * (the pool bound is the operator's contract); q262 decode is
  * stateless per-row inside micro-batches — state O(1), sink is the
  * only materialization. */
object Wave34 {

  // ------------------------------------------------------------- q261

  private val MmrDim = 64
  private val MmrPool = 64
  private val MmrK = 10

  private def qMmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = load(s, dir, "embeddings").select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))")
      .as("qv"))
    val q0 = g.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val rel = g.crossJoin(broadcast(q0)) // one-row query-vector frame
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id"), col("qv"),
        expr("aggregate(zip_with(qv, qq, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("rel"))
    val pool = rel.orderBy(col("rel").desc, col("vec_id")).limit(MmrPool)
    // bounded collect: the ≤64-row candidate pool (the operator's
    // contract bound — production MMR re-ranks a bounded pool)
    val cand = pool.collect().map(r => (r.getLong(0),
      r.getSeq[Long](1).toArray, r.getLong(2)))
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length && i < b.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Array[Long])]
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)] // pick, id, rel, maxsim, mmr
    val remaining =
      scala.collection.mutable.ArrayBuffer.from(cand)
    var k = 1
    while (k <= MmrK && remaining.nonEmpty) {
      val scored = remaining.map { case (id, v, r) =>
        val ms = if (selected.isEmpty) 0L
          else selected.map(sv => dot(v, sv._2)).max
        (id, v, r, ms, 7L * r - 3L * ms)
      }
      val best = scored.minBy { case (id, _, _, _, mmr) => (-mmr, id) }
      picks += ((k.toLong, best._1, best._3, best._4, best._5))
      selected += ((best._1, best._2))
      remaining --= remaining.filter(_._1 == best._1)
      k += 1
    }
    picks.toSeq.toDF("pick", "vec_id", "rel", "maxsim", "mmr")
      .orderBy(col("pick"))
  }

  private val qMmrRerankSql: String = {
    val dotExpr = (a: String, b: String) =>
      s"CAST(list_sum(list_transform(range(1, $MmrDim + 1), " +
        s"i -> $a.qv[i] * $b.qv[i])) AS BIGINT)"
    val rounds = (2 to MmrK).map { n =>
      s"""s$n AS MATERIALIZED (
         |  SELECT vec_id, rel, ms, $n AS pick FROM (
         |    SELECT p.vec_id AS vec_id, p.rel AS rel, MAX(y.d) AS ms
         |    FROM pool p JOIN sym y ON y.a = p.vec_id
         |    WHERE y.b IN (SELECT vec_id FROM all${n - 1})
         |      AND p.vec_id NOT IN (SELECT vec_id FROM all${n - 1})
         |    GROUP BY 1, 2) t
         |  ORDER BY 7 * rel - 3 * ms DESC, vec_id LIMIT 1),
         |all$n AS MATERIALIZED (
         |  SELECT * FROM all${n - 1} UNION ALL SELECT * FROM s$n)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
       |  FROM embeddings),
       |q0 AS (SELECT vec_id AS qid, qv FROM g ORDER BY vec_id LIMIT 1),
       |rel AS (
       |  SELECT v.vec_id, v.qv,
       |    ${dotExpr("v", "q")} AS rel
       |  FROM g v, q0 q WHERE v.vec_id <> q.qid),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, qv, rel FROM rel
       |  ORDER BY rel DESC, vec_id LIMIT $MmrPool),
       |sym AS MATERIALIZED (
       |  SELECT a.vec_id AS a, b.vec_id AS b, ${dotExpr("a", "b")} AS d
       |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
       |s1 AS MATERIALIZED (
       |  SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms, 1 AS pick
       |  FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       |all1 AS MATERIALIZED (SELECT * FROM s1),
       |$rounds
       |SELECT CAST(pick AS BIGINT) AS pick, vec_id, rel,
       |  ms AS maxsim, 7 * rel - 3 * ms AS mmr
       |FROM all$MmrK ORDER BY pick""".stripMargin
  }

  // ------------------------------------------------------------- q262

  /** q262: q257's audio decode-health computed INSIDE a stream — the
    * encode → corrupt-every-fifth → real-codec decode runs per row in
    * micro-batches (16 time-ordered file slices, AvailableNow), the
    * verdict rows land in the gate sink, the report aggregates the
    * read-back. The oracle is q257's: streaming == batch. */
  private def qStreamWavHealth(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val schema = new StructType()
      .add("doc_id", LongType).add("source", StringType)
      .add("rate", LongType).add("n", LongType)
    val result = graft.streaming.StreamScratch.withScratch("graft_swav_") { tmp =>
      val geo = load(s, dir, "documents").select(col("doc_id"),
        col("source"),
        expr("8000 + (doc_id % 3) * 4000").as("rate"),
        expr("n_chars % 97 + 5").as("n"),
        (col("doc_id") % 16).as("slice"))
      val in = graft.streaming.SliceReplay.stage(tmp,
        geo.select(to_json(struct(col("doc_id"), col("source"),
          col("rate"), col("n"))).as("value"), col("slice")), 16)
      val out = graft.streaming.GateOut.dir()
      val q = s.readStream
        .option("maxFilesPerTrigger", 1)
        .text(in)
        .select(from_json(col("value"), schema).as("d"))
        .select(col("d.doc_id").as("doc_id"), col("d.source").as("source"),
          col("d.rate").as("rate"), col("d.n").as("n"))
        .as[(Long, String, Long, Long)]
        .map { case (id, source, rate, n) =>
          // the REAL codec path, inside the micro-batch
          val wav = Multimodal.encodeWav(rate.toInt, n.toInt,
            i => (((id * 13 + i.toLong * 37) % 65536) - 32768).toInt)
          val blob = if (id % 5 == 0) wav.take(16) else wav
          Multimodal.audioProbe(blob, (_, nf) => Seq(nf / 2)) match {
            case Some((_, _, ps)) => (source, 0L, math.abs(ps.head).toLong)
            case None => (source, 1L, 0L)
          }
        }
        .toDF("source", "corrupt", "abs_mid")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/chk")
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
      s.read.parquet(out)
    }
    result.groupBy(col("source"))
      .agg(count(lit(1)).as("n_audio"),
        sum(col("corrupt")).as("n_corrupt"),
        sum(col("abs_mid").cast("decimal(38,0)")).as("sum_abs_mid"))
      .select(col("source"), col("n_audio"), col("n_corrupt"),
        expr("n_corrupt * 1000000 div n_audio").as("corrupt_ppm"),
        expr("CASE WHEN n_audio = n_corrupt THEN 0L ELSE " +
          "sum_abs_mid * 1000000 div (n_audio - n_corrupt) END")
          .as("mean_abs_mid_micro"))
      .orderBy(col("source"))
  }

  /** Same report as q257 (column names adjusted): streaming == batch. */
  private val qStreamWavHealthSql =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars % 97 + 5 AS n,
      |    CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS corrupt
      |  FROM documents),
      |p AS (
      |  SELECT source, corrupt,
      |    CASE WHEN corrupt = 1 THEN 0
      |      ELSE abs((doc_id * 13 + (n // 2) * 37) % 65536 - 32768)
      |      END AS abs_mid
      |  FROM d)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_audio,
      |  CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
      |  CAST(SUM(corrupt) * 1000000 // COUNT(*) AS BIGINT) AS corrupt_ppm,
      |  CAST(CASE WHEN COUNT(*) = SUM(corrupt) THEN 0 ELSE
      |    SUM(CAST(abs_mid AS HUGEINT)) * 1000000
      |      // (COUNT(*) - SUM(corrupt)) END AS BIGINT)
      |    AS mean_abs_mid_micro
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q261_mmr_rerank" -> QueryDef(qMmrRerank, Some(qMmrRerankSql),
      "MMR diversified re-rank: distributed scoring + TakeOrdered pool, " +
        "integer greedy, oracle replays all ten rounds"),
    "q262_stream_wav_health" -> QueryDef(qStreamWavHealth,
      Some(qStreamWavHealthSql),
      "q257's audio decode-health inside Structured Streaming — " +
        "streaming == batch for the real codec path"))
}
