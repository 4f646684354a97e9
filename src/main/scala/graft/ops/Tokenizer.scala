package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): the one
  * preprocessing artifact a pretraining pipeline builds that none of the
  * scoring/dedup operators cover. The trainer learns merge rules from
  * the corpus's own statistics: count adjacent symbol pairs, adopt the
  * most frequent pair as a new symbol, rewrite, repeat.
  *
  * Scale shape — the reason BPE training is feasible at 100 TB: the ONLY
  * corpus-scale pass is the initial word-frequency aggregation (one
  * explode + one keyed count). Every merge round then runs on the
  * Zipf-bounded VOCABULARY table (distinct words × counts — MBs at any
  * corpus size, which is exactly why SentencePiece/HF trainers consume
  * word-frequency files, not raw text). Per round: one pair explode +
  * keyed sum over the vocab, one 1-row argmax to the driver (the merge
  * rule IS a driver-side artifact), one map-side fold rewriting each
  * word's symbol array. Nothing pairwise, nothing quadratic, no state
  * larger than the vocab.
  *
  * Determinism: pair counts are exact integers; the argmax tie-breaks
  * (count desc, left asc, right asc); the rewrite is the standard greedy
  * left-to-right application. The Spark side applies it as a left fold
  * (`aggregate`); the oracle states the SAME greedy rule independently
  * as window islands with run-parity (in a run of k overlapping matches
  * — only possible when left==right — merge positions 0,2,4…). Two
  * formulations, one semantics, hash-gated equal.
  */
object Tokenizer {

  /** Merge rounds the gate learns (a real run continues to 32k–100k). */
  private val MergeRounds = 3

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  private def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var words = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr("filter(split(word, ''), x -> x <> '')"))
      .persist()
    val rounds = Seq.newBuilder[(Long, String, String, Long, Long)]
    for (r <- 1 to MergeRounds) {
      val best = words
        .select(col("cnt"), explode(expr(
          // slice, not sequence(1, n-1): Spark's sequence RUNS BACKWARDS
          // when the bound is below the start, so a 1-symbol word would
          // probe index 2 instead of yielding no pairs
          """transform(slice(sequence(1, size(syms)), 1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS l,
            |              element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .collect().head // 1-row argmax: the learned rule is driver data
      val (a, b, c) = (best.getString(0), best.getString(1), best.getLong(2))
      val prev = words
      words = prev.withColumn("syms", expr(
        s"""aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) ->
           |  CASE WHEN size(acc) > 0
           |         AND element_at(acc, -1) = '${esc(a)}'
           |         AND x = '${esc(b)}'
           |    THEN concat(slice(acc, 1, size(acc) - 1),
           |                array('${esc(a + b)}'))
           |    ELSE concat(acc, array(x)) END)""".stripMargin))
        .persist()
      val total = words.select(sum(col("cnt") * size(col("syms"))))
        .collect().head.getLong(0)
      prev.unpersist()
      rounds += ((r.toLong, a, b, c, total))
    }
    words.unpersist()
    rounds.result()
      .toDF("round", "left_sym", "right_sym", "pair_count",
        "corpus_symbols_after")
      .orderBy(col("round"))
  }

  /** One oracle merge round: pair counts → argmax → island/parity greedy
    * rewrite of `src` into `rb$r`. */
  private def roundSql(r: Int, src: String): String =
    s"""sym$r AS (
       |  SELECT word, cnt, j, syms[j] AS s
       |  FROM $src, unnest(range(1, len(syms) + 1)) AS u(j)),
       |pr$r AS (
       |  SELECT word, cnt, i, syms[i] AS s, syms[i+1] AS t
       |  FROM $src, unnest(range(1, len(syms))) AS u(i)),
       |pc$r AS (SELECT s, t, CAST(SUM(cnt) AS BIGINT) AS c
       |         FROM pr$r GROUP BY s, t),
       |best$r AS (SELECT s AS a, t AS b, c FROM pc$r
       |           ORDER BY c DESC, s, t LIMIT 1),
       |hit$r AS (
       |  SELECT p.word, p.cnt, p.i, (p.s = b.a AND p.t = b.b) AS hit
       |  FROM pr$r p CROSS JOIN best$r b),
       |isl$r AS (
       |  SELECT word, cnt, i, hit,
       |    i - ROW_NUMBER() OVER (PARTITION BY word, hit ORDER BY i) AS grp
       |  FROM hit$r),
       |keep$r AS (
       |  SELECT word, i
       |  FROM (SELECT word, i, grp,
       |          (i - MIN(i) OVER (PARTITION BY word, grp)) % 2 AS par
       |        FROM isl$r WHERE hit)
       |  WHERE par = 0),
       |rb$r AS (
       |  SELECT s.word, s.cnt,
       |    list(CASE WHEN k2.i IS NOT NULL THEN s.s || b.b ELSE s.s END
       |         ORDER BY s.j) AS syms
       |  FROM sym$r s
       |  CROSS JOIN best$r b
       |  LEFT JOIN keep$r k2 ON k2.word = s.word AND k2.i = s.j
       |  LEFT JOIN keep$r k1 ON k1.word = s.word AND k1.i = s.j - 1
       |  WHERE k1.i IS NULL
       |  GROUP BY s.word, s.cnt)""".stripMargin

  private val qBpeTrainSql = {
    val chain = (1 to MergeRounds)
      .map(r => roundSql(r, if (r == 1) "ws0" else s"rb${r - 1}"))
      .mkString(",\n")
    val rows = (1 to MergeRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, a AS left_sym, b AS right_sym,
         |  c AS pair_count,
         |  (SELECT CAST(SUM(cnt * len(syms)) AS BIGINT) FROM rb$r)
         |    AS corpus_symbols_after
         |FROM best$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |ws0 AS (
       |  SELECT word, cnt,
       |    list_filter(string_split(word, ''), x -> x <> '') AS syms
       |  FROM t),
       |$chain
       |SELECT * FROM ($rows) ORDER BY round""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q97_bpe_train" -> QueryDef(qBpeTrain, Some(qBpeTrainSql),
      "distributed BPE merge training on the Zipf-bounded vocab table"))
}
