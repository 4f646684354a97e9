package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Seventh-wave battery (round 7): retrieval evaluation, model-quality
  * statistics, web-corpus hygiene, and the watermark-sizing audit —
  * operators a training-data platform runs AROUND the pipeline the
  * earlier waves built. House rules apply: integer-exact arithmetic
  * wherever engines could disagree on floats, every pairwise stage
  * candidate-scoped, every per-group rank computed on a bounded table
  * (the q154/q168 histogram lesson), deterministic ORDER BY with
  * tie-breaks everywhere.
  */
object Wave7 {

  // ------------------------------------------------------------- q184

  /** Integer milli-quantized log2(i+1) for ranks i = 1..10 — the DCG
    * denominators, precomputed so BOTH engines divide by the same
    * integers and the whole nDCG computation stays in BIGINT. */
  private val Log2Milli: Seq[Long] = Seq(1000000L, 1584962L, 2000000L,
    2321928L, 2584962L, 2807354L, 3000000L, 3169925L, 3321928L, 3459431L)

  /** q184: nDCG@10 RETRIEVAL EVALUATION, integer-exact — the metric a
    * retrieval/RAG stack reports per query. Eval set synthesized
    * deterministically from the corpus: query = source (bounded
    * alphabet), system ranking = n_chars desc (the "retriever"),
    * graded relevance = doc_id mod 4, gain = 2^rel − 1. DCG uses the
    * [[Log2Milli]] table (identical literals in the oracle), so
    * DCG_milli, ideal-DCG_milli and ndcg_ppm are pure BIGINT — no
    * engine can disagree by an ulp.
    *
    * Scale shape: BOTH top-10 cuts (system order and ideal-gain order)
    * go through the custom [[graft.plans.TopK]] plan — per-partition
    * heaps + one k-bounded merge, never a per-group sort of the full
    * corpus; the rank windows then run on the 10-row-per-query result.
    */
  private def qNdcg(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("CAST(shiftleft(1L, CAST(doc_id % 4 AS INT)) - 1 AS BIGINT)")
          .as("gain"))
    val log2 = expr(s"array(${Log2Milli.mkString("L,") + "L"})")
    def dcg(top: DataFrame, ord: Seq[org.apache.spark.sql.Column],
        out: String) =
      top
        .withColumn("rnk",
          row_number().over(Window.partitionBy(col("source")).orderBy(ord: _*)))
        .withColumn("l2", log2(col("rnk") - 1))
        .groupBy(col("source"))
        .agg(sum(expr("gain * 1000000 div l2")).as(out))
    val sys = dcg(
      graft.plans.TopK.perGroup(d, Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc), 10),
      Seq(col("n_chars").desc, col("doc_id").asc), "dcg_milli")
    val ideal = dcg(
      graft.plans.TopK.perGroup(d, Seq(col("source")),
        Seq(col("gain").desc, col("doc_id").asc), 10),
      Seq(col("gain").desc, col("doc_id").asc), "idcg_milli")
    sys.join(ideal, "source")
      // a query whose best-10 gains are ALL zero has no ideal ranking:
      // nDCG is defined 0 there (tiny-SF sources can hit this)
      .withColumn("ndcg_ppm", expr(
        "CASE WHEN idcg_milli = 0 THEN 0L " +
          "ELSE dcg_milli * 1000000 div idcg_milli END"))
      .select(col("source"), col("dcg_milli"), col("idcg_milli"),
        col("ndcg_ppm"))
      .orderBy(col("source"))
  }

  private val qNdcgSql = {
    val l2list = Log2Milli.mkString(", ")
    s"""WITH d AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST((1 << (doc_id % 4)) - 1 AS BIGINT) AS gain
       |  FROM documents),
       |sys AS (
       |  SELECT source, gain, ROW_NUMBER() OVER
       |    (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM d),
       |ideal AS (
       |  SELECT source, gain, ROW_NUMBER() OVER
       |    (PARTITION BY source ORDER BY gain DESC, doc_id) AS rnk
       |  FROM d),
       |l2 AS (SELECT unnest(range(1, 11)) AS rnk,
       |              unnest([$l2list]) AS l2m),
       |sdcg AS (
       |  SELECT source, CAST(SUM(gain * 1000000 // l2m) AS BIGINT)
       |    AS dcg_milli
       |  FROM sys JOIN l2 USING (rnk) WHERE rnk <= 10 GROUP BY 1),
       |idcg AS (
       |  SELECT source, CAST(SUM(gain * 1000000 // l2m) AS BIGINT)
       |    AS idcg_milli
       |  FROM ideal JOIN l2 USING (rnk) WHERE rnk <= 10 GROUP BY 1)
       |SELECT source, dcg_milli, idcg_milli,
       |  CAST(CASE WHEN idcg_milli = 0 THEN 0
       |       ELSE dcg_milli * 1000000 // idcg_milli END AS BIGINT)
       |    AS ndcg_ppm
       |FROM sdcg JOIN idcg USING (source)
       |ORDER BY source""".stripMargin
  }

  // ------------------------------------------------------------- q185

  /** q185: GROUP AUC (Mann–Whitney), integer-exact, histogram-shaped —
    * the ranking-quality statistic for "does value separate purchases
    * from the rest", per user segment. Doubled-U convention keeps
    * half-credit ties in BIGINT: 2U = Σ_v pos(v)·(2·negBelow(v) +
    * neg(v)), auc_ppm = 2U·10^6 div (2·nPos·nNeg), with the final
    * products routed through DECIMAL(38,0) (2U·10^6 overflows int64 at
    * the 100× directory).
    *
    * Scale shape: the q154/q168 lesson applied from the start — the
    * only big-data op is the map-side-combinable groupBy(segment,
    * value); ranks, tie credit, and the AUC itself come from running
    * sums over the value HISTOGRAM, never a row_number over the raw
    * table. */
  private def qGroupAuc(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(pmod(col("user_id"), lit(4)).as("segment"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    val hist = ev.groupBy(col("segment"), col("v"))
      .agg(sum(col("pos")).as("p"), sum(lit(1L) - col("pos")).as("ng"))
    val w = Window.partitionBy(col("segment")).orderBy(col("v"))
    hist
      .withColumn("neg_below", sum(col("ng")).over(w) - col("ng"))
      .groupBy(col("segment"))
      .agg(sum(col("p")).as("n_pos"), sum(col("ng")).as("n_neg"),
        sum(expr("p * (2 * neg_below + ng)")).as("u2"))
      .withColumn("auc_ppm", expr(
        "CAST(CAST(u2 AS DECIMAL(38,0)) * 1000000 div " +
          "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
      .select(col("segment"), col("n_pos"), col("n_neg"), col("auc_ppm"))
      .orderBy(col("segment"))
  }

  private val qGroupAucSql =
    """WITH ev AS (
      |  SELECT user_id % 4 AS segment,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events),
      |hist AS (
      |  SELECT segment, v, CAST(SUM(pos) AS BIGINT) AS p,
      |    CAST(SUM(1 - pos) AS BIGINT) AS ng
      |  FROM ev GROUP BY 1, 2),
      |c AS (
      |  SELECT segment, p, ng,
      |    SUM(ng) OVER (PARTITION BY segment ORDER BY v) - ng AS neg_below
      |  FROM hist)
      |SELECT segment, CAST(SUM(p) AS BIGINT) AS n_pos,
      |  CAST(SUM(ng) AS BIGINT) AS n_neg,
      |  CAST(CAST(SUM(p * (2 * neg_below + ng)) AS HUGEINT) * 1000000
      |    // (2 * CAST(SUM(p) AS HUGEINT) * SUM(ng)) AS BIGINT) AS auc_ppm
      |FROM c GROUP BY segment ORDER BY segment""".stripMargin

  // ------------------------------------------------------------- q186

  /** q186: URL CANONICALIZATION + DEDUP — web-corpus hygiene: the same
    * page arrives once as its canonical URL and once utm-tagged from a
    * feed; normalization (lowercase scheme+host, strip default :443
    * port, drop the fragment, remove `utm_*` tracking params while
    * KEEPING meaningful ones) must collapse the pair. The corpus has
    * no URL column, so both arrival forms are synthesized
    * deterministically per document — the operator under test is the
    * canonicalizer, a pure projection + higher-order array filter that
    * runs scan-parallel at any scale; the dedup is one groupBy on the
    * canonical key. Gate: per source, raw count = 2× canonical count,
    * and every canonical URL carries exactly 2 raw forms. */
  private def qUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        concat(lit("HTTPS://"), upper(col("source")),
          lit(".Example.COM:443/"), col("lang"), lit("/doc/"), col("doc_id"),
          lit("?ref="), pmod(col("doc_id"), lit(7)), lit("#sec")).as("u1"),
        concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc/"), col("doc_id"),
          lit("?utm_source=feed&ref="), pmod(col("doc_id"), lit(7)),
          lit("&utm_campaign=w7")).as("u2"))
    val raw = d.select(col("source"), col("doc_id"),
      explode(array(col("u1"), col("u2"))).as("url"))
    val norm = raw
      // scheme+host+port: lowercase, strip default https port
      .withColumn("base", regexp_replace(
        lower(regexp_extract(col("url"), "^([^?#]*)", 1)), ":443/", "/"))
      .withColumn("qs", regexp_extract(col("url"), "\\?([^#]*)", 1))
      .withColumn("keep", expr(
        "array_join(filter(split(qs, '&'), p -> p NOT LIKE 'utm_%'), '&')"))
      .withColumn("canon", when(col("keep") === "", col("base"))
        .otherwise(concat(col("base"), lit("?"), col("keep"))))
    norm.groupBy(col("source"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("canon")).as("n_canonical"),
        countDistinct(when(col("url") === col("canon"), col("canon")))
          .as("n_already_canonical"))
      .withColumn("all_pairs_collapsed",
        col("n_raw") === col("n_canonical") * 2)
      .orderBy(col("source"))
  }

  private val qUrlNormalizeSql =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    'HTTPS://' || upper(source) || '.Example.COM:443/' || lang ||
      |      '/doc/' || doc_id || '?ref=' || (doc_id % 7) || '#sec' AS u1,
      |    'https://' || source || '.example.com/' || lang || '/doc/' ||
      |      doc_id || '?utm_source=feed&ref=' || (doc_id % 7) ||
      |      '&utm_campaign=w7' AS u2
      |  FROM documents),
      |raw AS (
      |  SELECT source, doc_id, unnest([u1, u2]) AS url FROM d),
      |n AS (
      |  SELECT source, url,
      |    replace(lower(regexp_extract(url, '^([^?#]*)', 1)),
      |      ':443/', '/') AS base,
      |    regexp_extract(url, '\?([^#]*)', 1) AS qs
      |  FROM raw),
      |k AS (
      |  SELECT source, url, base,
      |    array_to_string(list_filter(string_split(qs, '&'),
      |      p -> p NOT LIKE 'utm_%'), '&') AS keep
      |  FROM n),
      |c AS (
      |  SELECT source, url,
      |    CASE WHEN keep = '' THEN base
      |         ELSE base || '?' || keep END AS canon
      |  FROM k)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw,
      |  CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
      |  CAST(COUNT(DISTINCT CASE WHEN url = canon THEN canon END)
      |    AS BIGINT) AS n_already_canonical,
      |  COUNT(*) = COUNT(DISTINCT canon) * 2 AS all_pairs_collapsed
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------- q187

  /** q187: N-GRAM NOVELTY vs a reference corpus — "how much of this
    * document is text we have never seen": the dataset-curation signal
    * behind dedup thresholds and freshness screens (and the inverse of
    * contamination). Reference = even doc_ids, eval = odd. Per eval
    * doc: distinct word-5-gram digests, anti-joined against the
    * reference's distinct digest set; novelty_ppm = novel·10^6 div
    * distinct grams. Per-language means stay integer (sum div count).
    *
    * Scale shape: gram tables are (digest)-keyed; the membership probe
    * is a LEFT ANTI equi-join on the digest — posting-list algebra,
    * never a doc×doc comparison; everything partial-aggregates before
    * the shuffle. */
  private def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    def grams(docs: DataFrame) = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(0, size(ws) - 5),
          |  i -> md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3],
          |                     ws[i+4])))""".stripMargin)).as("g"))
      .distinct()
    val d = load(s, dir, "documents")
    val ref = grams(d.filter(pmod(col("doc_id"), lit(2)) === 0))
      .select(col("g")).distinct()
    val ev = grams(d.filter(pmod(col("doc_id"), lit(2)) === 1))
    val novel = ev.join(ref, Seq("g"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("novel"))
    ev.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .withColumn("novel", coalesce(col("novel"), lit(0L)))
      .withColumn("novelty_ppm", expr("novel * 1000000 div n_grams"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(novelty_ppm) div count(1)").as("mean_novelty_ppm"),
        min(col("novelty_ppm")).as("min_novelty_ppm"),
        max(col("novelty_ppm")).as("max_novelty_ppm"))
      .orderBy(col("lang"))
  }

  private val qNgramNoveltySql =
    """WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ws
      |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |g AS (
      |  SELECT DISTINCT doc_id, lang,
      |    unnest(list_transform(range(1, len(ws) - 3),
      |      i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
      |                ws[i+3] || ' ' || ws[i+4]))) AS g
      |  FROM w),
      |ref AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
      |ev AS (SELECT * FROM g WHERE doc_id % 2 = 1),
      |novel AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS novel
      |  FROM ev ANTI JOIN ref USING (g) GROUP BY 1),
      |per_doc AS (
      |  SELECT ev.doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
      |    COALESCE(MAX(novel.novel), 0) AS novel
      |  FROM ev LEFT JOIN novel ON ev.doc_id = novel.doc_id
      |  GROUP BY 1, 2),
      |ppm AS (
      |  SELECT lang, novel * 1000000 // n_grams AS novelty_ppm
      |  FROM per_doc)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(novelty_ppm) // COUNT(*) AS BIGINT) AS mean_novelty_ppm,
      |  CAST(MIN(novelty_ppm) AS BIGINT) AS min_novelty_ppm,
      |  CAST(MAX(novelty_ppm) AS BIGINT) AS max_novelty_ppm
      |FROM ppm GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- q188

  /** The (bands, rows) plans the sweep compares — all consume the SAME
    * 8-hash signature — with the integer-milli S-curve threshold
    * (1/b)^(1/r) each plan targets (precomputed: 1/8 → 0.125,
    * (1/4)^(1/2) → 0.5, (1/2)^(1/4) → 0.840896…). */
  private val SweepPlans: Seq[(Int, Int, Long)] =
    Seq((8, 1, 125L), (4, 2, 500L), (2, 4, 840L))

  /** q188: LSH BANDING-PARAMETER SWEEP — the tuning table an operator
    * reads before picking a near-dup threshold: for each (bands, rows)
    * split of the SAME MinHash signature ([[Dedup.sigTable]], shared
    * with the production q35 chain), the distinct candidate-pair count
    * the plan would generate. More bands ⇒ lower effective threshold ⇒
    * the candidate set can only GROW (asserted by the spec); the
    * jump between plans tells you where your corpus's similarity mass
    * sits.
    *
    * Scale shape: one signature pass (the q35 stage, map-side
    * combinable), then per plan a band equi-join — candidates only
    * ever form inside a (plan, band) bucket; the three plans ride ONE
    * union-keyed shuffle, not three scans. */
  private def qLshSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = Dedup.sigTable(load(s, dir, "documents"))
    val bandCols = SweepPlans.flatMap { case (b, r, _) =>
      (0 until b).map { bi =>
        struct(lit(s"b${b}r$r").as("plan"),
          md5(concat((lit(s"$b:$r:$bi:") +:
            (0 until r).map(i => col(s"h${bi * r + i}"))): _*)).as("band"))
      }
    }
    val bands = sigs.select(col("doc_id"),
      explode(array(bandCols: _*)).as("pb"))
      .select(col("doc_id"), col("pb.plan").as("plan"),
        col("pb.band").as("band"))
    val thresholds = SweepPlans.map { case (b, r, t) => (s"b${b}r$r", b, r, t) }
      .toDF("plan", "bands", "rws", "threshold_milli")
    bands.as("x")
      .join(bands.as("y"),
        col("x.plan") === col("y.plan") && col("x.band") === col("y.band") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.plan").as("plan"), col("x.doc_id").as("a"),
        col("y.doc_id").as("b"))
      .distinct()
      .groupBy(col("plan"))
      .agg(count(lit(1)).as("n_candidates"))
      .join(broadcast(thresholds), Seq("plan"), "right")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .select(col("plan"), col("bands"), col("rws"),
        col("threshold_milli"), col("n_candidates"))
      .orderBy(col("bands").desc)
  }

  private val qLshSweepSql = {
    val perPlan = SweepPlans.map { case (b, r, t) =>
      val bs = (0 until b)
        .map(bi => s"md5('$b:$r:$bi:' || " +
          (0 until r).map(i => s"h${bi * r + i}").mkString(" || ") + ")")
        .mkString(", ")
      s"""SELECT doc_id, 'b${b}r$r' AS plan, $b AS bands, $r AS rws,
         |  CAST($t AS BIGINT) AS threshold_milli,
         |  unnest([$bs]) AS band FROM sig""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${Dedup.sigCte},
       |bands AS ($perPlan),
       |cand AS (
       |  SELECT DISTINCT x.plan, x.bands, x.rws, x.threshold_milli,
       |    x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.plan = y.plan AND x.band = y.band AND x.doc_id < y.doc_id)
       |SELECT plan, CAST(MAX(bands) AS INT) AS bands,
       |  CAST(MAX(rws) AS INT) AS rws,
       |  MAX(threshold_milli) AS threshold_milli,
       |  CAST(COUNT(*) AS BIGINT) AS n_candidates
       |FROM cand GROUP BY plan ORDER BY MAX(bands) DESC""".stripMargin
  }

  // ------------------------------------------------------------- q189

  /** Block width for the two-level prefix scan — 2^16 events per
    * block keeps every within-block window partition small and the
    * block-summary table ~n/65536 rows. */
  private val ScanBlock = 65536L

  /** q189: OUT-OF-ORDER ARRIVAL AUDIT — the measurement that SIZES a
    * watermark delay (T2): per event type, how many events arrive
    * with an event time older than something already seen (arrival
    * order = event_id), the worst lateness, and the nearest-rank p99
    * lateness in milliseconds. Run this before choosing
    * `withWatermark`, not after the stream drops data.
    *
    * Scale shape — a distributed TWO-LEVEL PREFIX SCAN, because the
    * naive `max(us) OVER (PARTITION BY type ORDER BY event_id)` is a
    * per-type single-task sort (the q154/q168 trap, amplified: type is
    * a 5-value alphabet): (1) within 65536-event blocks, a running max
    * over a (type, block)-partitioned window — thousands of small
    * parallel partitions; (2) block maxes form a TINY summary table
    * whose exclusive running max per type gives each block its prefix;
    * (3) lateness = max(block prefix, within-block running max) − us.
    * The p99 then comes from the lateness-ms HISTOGRAM, nearest-rank
    * by running count — no raw-table rank window anywhere. */
  private def qOooAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (col("event_id") / ScanBlock).cast(LongType).as("blk"))
    val wIn = Window.partitionBy(col("event_type"), col("blk"))
      .orderBy(col("event_id"))
    val wBlk = Window.partitionBy(col("event_type")).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = ev.groupBy(col("event_type"), col("blk"))
      .agg(max(col("us")).as("blk_max"))
      .withColumn("prefix_max", max(col("blk_max")).over(wBlk))
    val late = ev
      .withColumn("run_max", max(col("us")).over(wIn))
      .join(blocks.select(col("event_type"), col("blk"), col("prefix_max")),
        Seq("event_type", "blk"))
      .withColumn("seen_max", greatest(col("run_max"),
        coalesce(col("prefix_max"), lit(Long.MinValue))))
      .withColumn("late_ms",
        expr("greatest(seen_max - us, 0L) div 1000"))
    val counts = late.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_ms") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_ms")).as("max_late_ms"))
    // p99 of the LATE events only, nearest-rank over the ms histogram
    val hist = late.filter(col("late_ms") > 0)
      .groupBy(col("event_type"), col("late_ms"))
      .agg(count(lit(1)).as("cnt"))
    val wMs = Window.partitionBy(col("event_type")).orderBy(col("late_ms"))
    val p99 = hist
      .withColumn("cum", sum(col("cnt")).over(wMs))
      .withColumn("nl", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("target", expr("(nl * 99 + 99) div 100"))
      .groupBy(col("event_type"))
      .agg(min(when(col("cum") >= col("target"), col("late_ms")))
        .as("p99_late_ms"))
    counts.join(p99, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"), col("n_late"),
        col("max_late_ms"), col("p99_late_ms"))
      .orderBy(col("event_type"))
  }

  private val qOooAuditSql =
    """WITH ev AS (
      |  SELECT event_type, event_id, epoch_us(ts) AS us
      |  FROM events),
      |r AS (
      |  SELECT event_type, us,
      |    MAX(us) OVER (PARTITION BY event_type ORDER BY event_id)
      |      AS seen_max
      |  FROM ev),
      |l AS (
      |  SELECT event_type,
      |    GREATEST(seen_max - us, 0) // 1000 AS late_ms
      |  FROM r),
      |counts AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_late,
      |    CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
      |  FROM l GROUP BY 1),
      |lh AS (
      |  SELECT event_type, late_ms, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM l WHERE late_ms > 0 GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type, late_ms,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY late_ms) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS nl
      |  FROM lh),
      |p AS (
      |  SELECT event_type,
      |    CAST(MIN(CASE WHEN cum >= (nl * 99 + 99) // 100
      |                  THEN late_ms END) AS BIGINT) AS p99_late_ms
      |  FROM c GROUP BY 1)
      |SELECT counts.event_type, n_events, n_late, max_late_ms,
      |  p99_late_ms
      |FROM counts LEFT JOIN p ON counts.event_type = p.event_type
      |ORDER BY counts.event_type""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q184_ndcg" -> QueryDef(qNdcg, Some(qNdcgSql),
      "integer nDCG@10 retrieval eval: TopK custom plan × 2, BIGINT-only DCG"),
    "q185_group_auc" -> QueryDef(qGroupAuc, Some(qGroupAucSql),
      "Mann-Whitney AUC per segment, doubled-U tie handling, value-histogram ranks"),
    "q186_url_normalize" -> QueryDef(qUrlNormalize, Some(qUrlNormalizeSql),
      "URL canonicalization + dedup (utm strip, case/port/fragment) as a scan-parallel projection"),
    "q187_ngram_novelty" -> QueryDef(qNgramNovelty, Some(qNgramNoveltySql),
      "per-doc 5-gram novelty vs reference corpus via digest anti-join, ppm-exact"),
    "q188_lsh_sweep" -> QueryDef(qLshSweep, Some(qLshSweepSql),
      "banding-parameter sweep over one shared MinHash signature: candidates per (b,r) plan"),
    "q189_ooo_audit" -> QueryDef(qOooAudit, Some(qOooAuditSql),
      "watermark-sizing audit: two-level distributed prefix scan + lateness-histogram p99"))
}
