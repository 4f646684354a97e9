package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Nineteenth wave (round 8): layout, retrieval, and interval
  * analytics — four operators a 100-TB platform runs around the core
  * curation pipeline, each built on a scale-safe device this round
  * hardened:
  *
  *  - q227: typo-tolerant vocabulary join (deletion-1 neighborhood
  *    blocking + exact Levenshtein verify — the FastSS device; the
  *    edit-distance complement of the shingle/minhash batteries).
  *  *  - q228: Z-ORDER layout audit (bit-interleaved clustering key +
  *    per-bucket extent report — the data-skipping layout check run
  *    before rewriting a 100-TB table's sort order).
  *  - q229: peak concurrent sessions via a DISTRIBUTED sweep-line —
  *    the interval staple, running on [[graft.util.Ranks.prefixSum]]
  *    instead of the per-group single-task window it classically
  *    compiles to.
  *  - q230: integer BM25-style retrieval over posting lists with a
  *    corpus-derived term set and TakeOrdered top-k.
  *
  * House rules throughout: integer/ppm exactness (no float in any
  * hashed column), deterministic ORDER BY + tie-breaks, DuckDB oracle
  * at every scale, unpartitioned windows only over audited bounded
  * tables. */
object Wave19 {

  // ------------------------------------------------------------- q227

  /** q227: TYPO-TOLERANT JOIN over the corpus vocabulary — all word
    * pairs at Levenshtein distance ≤ 1, found by DELETION-1
    * NEIGHBORHOOD blocking (FastSS k=1): each word emits itself plus
    * its single-character deletions; two words within distance 1 MUST
    * share a variant (substitution → same deletion at one position;
    * insertion/deletion → one word is a deletion of the other), so an
    * equi-join on the variant key finds every true pair, and an exact
    * `levenshtein` check discards hash-block false positives (distinct
    * words sharing a variant at distance 2, e.g. two different
    * substitutions at the same position are distance 2 but share that
    * position's deletion). The candidate set is equi-key bounded:
    * variants per word ≤ len+1, so the join is posting-list shaped —
    * never all-pairs. Name length capped to [4, 24]. Input: CUSTOMER
    * NAMES — a namespace dense in distance-1 neighborhoods (ids
    * differing in one digit), where the synthetic documents' word list
    * has none, so the verify stage does real work at every scale.
    * Output is the bounded top-20 names by neighbor count
    * (deterministic ties), not the pair list — the pair set grows with
    * the namespace. */
  private def qTypoJoin(s: SparkSession, dir: String): DataFrame = {
    val names = load(s, dir, "customer").select(col("c_name").as("w"))
      .distinct().filter(length(col("w")).between(4, 24))
    val variants = names.select(col("w"), explode(concat(
        array(col("w")),
        expr("transform(sequence(1, length(w)), " +
          "i -> concat(substring(w, 1, i - 1), substring(w, i + 1)))")))
      .as("v"))
    // verify BEFORE distinct: graft_within_edit1 is a one-pass native
    // predicate (the O(len^2) levenshtein DP on every candidate was
    // measured as the whole query cost), and the distinct then
    // deduplicates the smaller surviving set
    val pairs = variants.as("a")
      .join(variants.as("b"),
        col("a.v") === col("b.v") && col("a.w") < col("b.w"))
      .select(col("a.w").as("wa"), col("b.w").as("wb"))
      .filter(graft.functions.WithinEdit1(col("wa"), col("wb")))
      .distinct()
    val neighbors = pairs.select(col("wa").as("w"))
      .unionByName(pairs.select(col("wb").as("w")))
      .groupBy(col("w")).agg(count(lit(1)).as("n_neighbors"))
    val ord = Seq(col("n_neighbors").desc, col("w").asc)
    neighbors.orderBy(ord: _*).limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk"), col("w").as("name"), col("n_neighbors"))
      .orderBy(col("rk"))
  }

  private val qTypoJoinSql =
    """WITH names AS MATERIALIZED (
      |  SELECT DISTINCT c_name AS w FROM customer
      |  WHERE len(c_name) BETWEEN 4 AND 24),
      |variants AS MATERIALIZED (
      |  SELECT w, unnest(list_prepend(w,
      |    list_transform(range(1, len(w) + 1),
      |      i -> substr(w, 1, i - 1) || substr(w, i + 1)))) AS v
      |  FROM names),
      |pairs AS (
      |  SELECT DISTINCT a.w AS wa, b.w AS wb
      |  FROM variants a JOIN variants b
      |    ON a.v = b.v AND a.w < b.w),
      |ok AS (
      |  SELECT wa, wb FROM pairs WHERE levenshtein(wa, wb) <= 1),
      |nb AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_neighbors FROM (
      |    SELECT wa AS w FROM ok UNION ALL SELECT wb FROM ok) t
      |  GROUP BY 1),
      |top AS (
      |  SELECT * FROM nb ORDER BY n_neighbors DESC, w LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY n_neighbors DESC, w)
      |    AS INT) AS rk,
      |  w AS name, n_neighbors
      |FROM top ORDER BY rk""".stripMargin

  // ------------------------------------------------------------- q228

  /** Shared bit-interleave arithmetic (Morton/Z-order key from the low
    * 16 bits of two keys) spelled with integer div/mod — the one token
    * the engines spell differently (`div` vs `//`) is a parameter, the
    * arithmetic is otherwise the same string on both. */
  private[ops] def zExpr(a: String, b: String, idiv: String): String =
    (0 until 16).map { i =>
      s"((($a) $idiv ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + ((($b) $idiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** q228: Z-ORDER LAYOUT AUDIT — interleave the low 16 bits of
    * (l_partkey, l_suppkey) into a Morton key, bucket the table by the
    * key's top bits, and report each heavy bucket's row count and
    * per-dimension extents. The point of Z-order is that every bucket
    * is a small axis-aligned box in (partkey, suppkey) space — so
    * min/max pruning skips files for BOTH predicates; the extents
    * (versus each dimension's global range) are exactly the
    * data-skipping win a layout rewrite would buy. The audit is one
    * map-side key computation + one groupBy + TakeOrdered(24): the
    * report you run BEFORE paying for a 100-TB re-sort.
    *
    * All arithmetic is div/mod/mult on BIGINT — bit-identical across
    * engines; the rank label windows over the 24 surviving rows
    * only. */
  private def qZOrderAudit(s: SparkSession, dir: String): DataFrame = {
    val z = zExpr("l_partkey % 65536", "l_suppkey % 65536", "div")
    val bucketed = load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zb", expr(s"($z) div ${1L << 22}"))
      .groupBy(col("zb"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .withColumn("pk_extent", col("pk_max") - col("pk_min") + 1)
      .withColumn("sk_extent", col("sk_max") - col("sk_min") + 1)
    val ord = Seq(col("n_rows").desc, col("zb").asc)
    bucketed.orderBy(ord: _*).limit(24)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk"), col("zb"), col("n_rows"), col("pk_min"),
        col("pk_max"), col("pk_extent"), col("sk_min"), col("sk_max"),
        col("sk_extent"))
      .orderBy(col("rk"))
  }

  private val qZOrderAuditSql = {
    val z = zExpr("l_partkey % 65536", "l_suppkey % 65536", "//")
    s"""WITH b AS (
       |  SELECT ($z) // ${1L << 22} AS zb,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |    MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
       |  FROM lineitem GROUP BY 1),
       |top AS (
       |  SELECT *, pk_max - pk_min + 1 AS pk_extent,
       |    sk_max - sk_min + 1 AS sk_extent
       |  FROM b ORDER BY n_rows DESC, zb LIMIT 24)
       |SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, zb) AS INT)
       |    AS rk,
       |  zb, n_rows, pk_min, pk_max, pk_extent, sk_min, sk_max, sk_extent
       |FROM top ORDER BY rk""".stripMargin
  }

  // ------------------------------------------------------------- q229

  /** Session gap: 30 minutes, in microseconds. */
  private val GapUs = 1800L * 1000000L

  /** q229: PEAK CONCURRENT SESSIONS per event type — the interval
    * sweep-line: sessionize each (user, type) stream by 30-minute gap,
    * emit +1 at each session start and −1 just after its end (end
    * exclusive at last_ts + 1µs, so single-event sessions still span an
    * instant), net the deltas per (type, timestamp) — which makes the
    * sweep key UNIQUE per type and collapses the shuffle — and take
    * the running sum's maximum plus the earliest time it is reached.
    *
    * The classic formulation is `sum(delta).over(Window.partitionBy
    * (type).orderBy(t))` — with a handful of types that funnels the
    * entire corpus timeline through a few window tasks, the same
    * single-task shape the round-8 plan gate rejects. Here the running
    * sum is [[graft.util.Ranks.prefixSum]]: a range-repartitioned
    * parallel sweep with broadcast per-group offsets — full cluster
    * parallelism at any timeline length. */
  private def qPeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val wu = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"))
    val sess = ev
      .withColumn("brk", when(coalesce(col("us") - lag(col("us"), 1)
        .over(wu), lit(GapUs + 1)) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wu))
      .groupBy(col("user_id"), col("event_type"), col("sid"))
      .agg(min(col("us")).as("s_us"), (max(col("us")) + 1).as("e_us"))
    val deltas = sess.select(col("event_type"), col("s_us").as("t"),
        lit(1L).as("d"))
      .unionByName(sess.select(col("event_type"), col("e_us").as("t"),
        lit(-1L).as("d")))
      .groupBy(col("event_type"), col("t"))
      .agg(sum(col("d")).as("dv"))
    val run = graft.util.Ranks.prefixSum(deltas, Seq("event_type"),
      Seq(col("t")), col("dv"), "run")
    val peak = run.groupBy(col("event_type")).agg(max(col("run")).as("peak"))
    run.join(broadcast(peak), "event_type")
      .filter(col("run") === col("peak"))
      .groupBy(col("event_type"))
      .agg(max(col("peak")).as("peak"), min(col("t")).as("peak_at_us"))
      .orderBy(col("event_type"))
  }

  private val qPeakConcurrencySql =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |o AS (
       |  SELECT user_id, event_type, us,
       |    lag(us) OVER (PARTITION BY user_id, event_type ORDER BY us)
       |      AS pus
       |  FROM e),
       |b AS (
       |  SELECT user_id, event_type, us,
       |    CASE WHEN pus IS NULL OR us - pus > $GapUs THEN 1 ELSE 0 END
       |      AS brk
       |  FROM o),
       |sid AS (
       |  SELECT user_id, event_type, us,
       |    SUM(brk) OVER (PARTITION BY user_id, event_type ORDER BY us)
       |      AS sid
       |  FROM b),
       |sess AS (
       |  SELECT user_id, event_type, sid,
       |    MIN(us) AS s_us, MAX(us) + 1 AS e_us
       |  FROM sid GROUP BY 1, 2, 3),
       |d AS (
       |  SELECT event_type, s_us AS t, CAST(1 AS BIGINT) AS d FROM sess
       |  UNION ALL
       |  SELECT event_type, e_us, CAST(-1 AS BIGINT) FROM sess),
       |net AS (
       |  SELECT event_type, t, CAST(SUM(d) AS BIGINT) AS dv
       |  FROM d GROUP BY 1, 2),
       |run AS (
       |  SELECT event_type, t,
       |    CAST(SUM(dv) OVER (PARTITION BY event_type ORDER BY t)
       |      AS BIGINT) AS run
       |  FROM net),
       |pk AS (SELECT event_type, MAX(run) AS peak FROM run GROUP BY 1)
       |SELECT run.event_type, CAST(MAX(pk.peak) AS BIGINT) AS peak,
       |  CAST(MIN(t) AS BIGINT) AS peak_at_us
       |FROM run JOIN pk ON pk.event_type = run.event_type
       |  AND run.run = pk.peak
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q230

  /** q230: INTEGER BM25-STYLE RETRIEVAL — score every document against
    * a corpus-derived term set (the 3 highest-df words, ties by word)
    * with the saturating-tf family BM25 belongs to, kept integer-exact:
    * idf_ppm(t) = N·10⁶ div df(t) (a monotone integer transform of the
    * true log idf — rankings need monotonicity, not logarithms), and
    * tf saturation tf·1000 div (tf + 2) (k₁ = 2, b = 0: the classic
    * curve with exact division). Top 20 docs by score via
    * `orderBy().limit(20)` (TakeOrdered — never a global window), score
    * products DECIMAL-routed.
    *
    * Scale shape: posting lists (explode → broadcast semi-join on the
    * 3-term table → per-(doc, term) tf) — the score agg reuses the
    * doc_id shuffle; the term table is alphabet-bounded by LIMIT. */
  private def qBm25TopK(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val n = load(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val terms = words.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("word")).limit(3)
    val tf = words.join(broadcast(terms), "word")
      .groupBy(col("doc_id"), col("word"), col("df"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf.crossJoin(broadcast(n)) // 1-row corpus-size scalar
      .withColumn("idf_ppm", expr("n_docs * 1000000 div df"))
      .withColumn("part_score", expr(
        "CAST(CAST(idf_ppm AS DECIMAL(38,0)) * (tf * 1000 div (tf + 2))" +
          " AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("part_score")).as("score"),
        count(lit(1)).as("n_terms_hit"))
    val ord = Seq(col("score").desc, col("doc_id").asc)
    scored.orderBy(ord: _*).limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk"), col("doc_id"), col("score"), col("n_terms_hit"))
      .orderBy(col("rk"))
  }

  private val qBm25TopKSql =
    """WITH w AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |terms AS (
      |  SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM w GROUP BY 1 ORDER BY df DESC, word LIMIT 3),
      |tf AS (
      |  SELECT doc_id, w.word, df, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM w JOIN terms ON terms.word = w.word
      |  GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT doc_id,
      |    CAST(SUM(CAST(n_docs * 1000000 // df AS HUGEINT)
      |      * (tf * 1000 // (tf + 2))) AS BIGINT) AS score,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      |  FROM tf CROSS JOIN nd GROUP BY 1),
      |top AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
      |    AS rk,
      |  doc_id, score, n_terms_hit
      |FROM top ORDER BY rk""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q227_typo_join" -> QueryDef(qTypoJoin, Some(qTypoJoinSql),
      "deletion-1 neighborhood blocking + exact Levenshtein<=1 verify"),
    "q228_zorder_audit" -> QueryDef(qZOrderAudit, Some(qZOrderAuditSql),
      "Morton-key bucket extents: the data-skipping layout audit"),
    "q229_peak_concurrency" -> QueryDef(qPeakConcurrency,
      Some(qPeakConcurrencySql),
      "interval sweep-line on the distributed prefix-sum device"),
    "q230_bm25_topk" -> QueryDef(qBm25TopK, Some(qBm25TopKSql),
      "integer BM25-family retrieval over posting lists, TakeOrdered top-k"))
}
