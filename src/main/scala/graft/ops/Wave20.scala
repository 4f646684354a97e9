package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load
import graft.util.Pin

/** Twentieth wave (round 8): journey, keyword, and data-quality
  * operators, each reusing a custom tier this engine already owns —
  * the q106 session device (q231), the TopKPerGroup physical operator
  * (q232), and the round-8 distributed prefix devices (q233 runs on
  * `Ranks.prefixMax`). House rules: integer/ppm exactness,
  * deterministic orders, DuckDB oracle per query, bounded outputs. */
object Wave20 {

  /** Session gap shared with q229 (30 minutes, microseconds). */
  private val GapUs = 1800L * 1000000L

  // ------------------------------------------------------------- q231

  /** q231: FIRST-ORDER MARKOV TRANSITIONS between event types within a
    * session — the user-journey matrix ("after a view, what happens
    * next?"): consecutive-event pairs per (user, 30-min session) via
    * one `lead` over the per-user shuffle, counted into the (from, to)
    * matrix (alphabet² bounded), with row-normalized probability in
    * exact ppm and each row's top destination flagged. The ORDERED
    * complement of q110's unordered co-occurrence. Terminal events
    * (session's last) emit no pair — the matrix is over observed
    * transitions, the standard convention. */
  private def qMarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("us"),
      col("event_id"))
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("brk", when(coalesce(col("us") - lag(col("us"), 1)
        .over(wu), lit(GapUs + 1)) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wu))
      .withColumn("next_type", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("us"), col("event_id"))))
      .filter(col("next_type").isNotNull)
    val m = ev.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total", sum(col("n")).over(
        Window.partitionBy(col("from_type"))))
      .withColumn("p_ppm", expr("n * 1000000 div row_total"))
    m.withColumn("is_top", (row_number().over(
        Window.partitionBy(col("from_type"))
          .orderBy(col("n").desc, col("to_type"))) === 1))
      .select(col("from_type"), col("to_type"), col("n"), col("p_ppm"),
        col("is_top"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val qMarkovTransitionsSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
       |  FROM events),
       |o AS (
       |  SELECT *, lag(us) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS pus
       |  FROM e),
       |b AS (
       |  SELECT *, CASE WHEN pus IS NULL OR us - pus > $GapUs
       |    THEN 1 ELSE 0 END AS brk FROM o),
       |sid AS (
       |  SELECT *, SUM(brk) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS sid
       |  FROM b),
       |pairs AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id, sid
       |      ORDER BY us, event_id) AS to_type
       |  FROM sid),
       |m AS (
       |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |r AS (
       |  SELECT *, CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
       |    AS row_total
       |  FROM m)
       |SELECT from_type, to_type, n, n * 1000000 // row_total AS p_ppm,
       |  CAST(row_number() OVER (PARTITION BY from_type
       |    ORDER BY n DESC, to_type) AS INT) = 1 AS is_top
       |FROM r ORDER BY from_type, to_type""".stripMargin

  // ------------------------------------------------------------- q232

  /** q232: PER-DOCUMENT KEYWORD EXTRACTION — top 3 words per document
    * by integer tf·idf (idf_ppm = N·10⁶ div df — monotone, exact),
    * executed through the custom [[graft.plans.TopKPerGroup]] physical
    * operator: partial bounded-heap pass before the doc_id shuffle,
    * exact pass after — never a full per-doc rank materialization,
    * which is the difference between O(vocab-hits) heap work and a
    * window sort over every (doc, word) pair at corpus scale. Short
    * stopword-ish tokens (< 4 chars) are dropped; ties break on the
    * word so the 3-row-per-doc result is deterministic. */
  private def qKeywords(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 4)
    val nDocs = load(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    // tf IS the distinct (doc, word) set — df comes from it for free,
    // instead of a second full-width distinct shuffle over the corpus
    val tf = Pin(words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "word")
      .crossJoin(broadcast(nDocs)) // 1-row corpus-size scalar
      .withColumn("score", expr(
        "CAST(tf * (CAST(n_docs AS DECIMAL(38,0)) * 1000000 div df)" +
          " AS BIGINT)"))
    graft.plans.TopK.perGroup(
        scored.select(col("doc_id"), col("word"), col("tf"), col("score")),
        Seq(col("doc_id")),
        Seq(col("score").desc, col("word").asc), 3)
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("word").asc)))
      .select(col("doc_id"), col("rk"), col("word"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private val qKeywordsSql =
    """WITH w AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |w4 AS MATERIALIZED (SELECT * FROM w WHERE len(word) >= 4),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |df AS (
      |  SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM w4 GROUP BY 1),
      |tf AS (
      |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM w4 GROUP BY 1, 2),
      |sc AS (
      |  SELECT doc_id, tf.word, tf,
      |    CAST(tf * (CAST(n_docs AS HUGEINT) * 1000000 // df)
      |      AS BIGINT) AS score
      |  FROM tf JOIN df ON df.word = tf.word CROSS JOIN nd),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score DESC, word) AS INT) AS rk
      |  FROM sc)
      |SELECT doc_id, rk, word, tf, score FROM rk
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  // ------------------------------------------------------------- q233

  /** q233: OUT-OF-ORDER ARRIVAL AUDIT — how late events arrive
    * relative to the stream's high watermark. The synthetic feed's
    * event_id is already time-ordered (measured: lateness
    * identically 0 — a vacuous audit), so arrival is modeled as the
    * ubiquitous PER-SOURCE BATCHED UPLOAD: each hour, every source
    * (user) ships its batch, batches arriving in user order — arrival
    * key (hour, user_id, us, event_id). Under that order the running
    * maximum of event time is the watermark each event met; lateness =
    * watermark − event_time. Reported as a bounded histogram
    * (minutes-late buckets capped at 10) plus per-type totals —
    * exactly the report that sizes a production `withWatermark` delay
    * (q22/q27's knob) from observed data.
    *
    * The running max is [[graft.util.Ranks.prefixMax]] — the same
    * range-partitioned device as q229's sweep, with max as the
    * combiner; the classic `max().over(partitionBy(type) orderBy ...)`
    * would funnel each type's whole arrival history through one task.
    */
  private def qOutOfOrder(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("event_type"), col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("hr", expr("us div 3600000000"))
    val wm = graft.util.Ranks.prefixMax(ev, Seq("event_type"),
      Seq(col("hr"), col("user_id"), col("us"), col("event_id")),
      col("us"), "wm_us")
    wm.withColumn("late_us", col("wm_us") - col("us"))
      .withColumn("bucket_min",
        least(expr("late_us div 60000000"), lit(10L)))
      .groupBy(col("event_type"), col("bucket_min"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
      .orderBy(col("event_type"), col("bucket_min"))
  }

  private val qOutOfOrderSql =
    """WITH e AS (
      |  SELECT event_type, event_id, user_id, epoch_us(ts) AS us,
      |    epoch_us(ts) // 3600000000 AS hr
      |  FROM events),
      |wm AS (
      |  SELECT event_type, us,
      |    MAX(us) OVER (PARTITION BY event_type
      |      ORDER BY hr, user_id, us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm_us
      |  FROM e),
      |l AS (SELECT event_type, wm_us - us AS late_us FROM wm)
      |SELECT event_type,
      |  CAST(LEAST(late_us // 60000000, 10) AS BIGINT) AS bucket_min,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_late,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us
      |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q231_markov_transitions" -> QueryDef(qMarkovTransitions,
      Some(qMarkovTransitionsSql),
      "ordered within-session transition matrix, exact ppm rows"),
    "q232_keywords_topk" -> QueryDef(qKeywords, Some(qKeywordsSql),
      "per-doc tf-idf keywords through the TopKPerGroup custom operator"),
    "q233_out_of_order" -> QueryDef(qOutOfOrder, Some(qOutOfOrderSql),
      "arrival-order watermark lateness audit on Ranks.prefixMax"))
}
