package graft.ops

import graft.{QueryDef, Tables}
import graft.util.Ranks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Forty-second wave (round 10): four operators the battery lacked —
  *
  *  - q280: EDIT-DISTANCE FUZZY JOIN (entity resolution) — likely-
  *    duplicate customer records within a nation at Levenshtein ≤ 1.
  *    The scale device is FastSS deletion-neighborhood blocking over
  *    DISTINCT (nation, name): each distinct name emits itself plus
  *    its |s| single-character-deletion variants as equi-join keys
  *    (for d=1 this candidate set is provably complete: equal strings
  *    share the original, a substitution shares the deletion at the
  *    edited position, an insertion's deletion equals the shorter
  *    original), candidates are deduped, only candidates pay the
  *    levenshtein verify — never an all-pairs comparison — and keys
  *    re-enter only in the output expansion, which is sized by the
  *    true result. Blocking on raw rows instead measured unboundedly
  *    worse on duplicate-heavy corpora (sf10: |group|² candidate
  *    blow-up for pairs needing no verify).
  *  - q281: SKYLINE (Pareto frontier) of part on (price ↓ better,
  *    size ↑ better) — the classic dominance query, computed as a
  *    DISTRIBUTED SWEEP instead of the O(n²) NOT-EXISTS: per-price
  *    max-size aggregate (a keyed reduction), the distributed running
  *    max over price order ([[Ranks.prefixMax]] — no single-task
  *    global window), the strict-prefix max recovered by an
  *    equi-join on adjacent global ranks, and a row survives iff it
  *    holds its price's max size AND beats every strictly-cheaper
  *    price's best. One pass over the fact table + bounded-size maps.
  *  - q282: EXACT CHANGEPOINT (binary-segmentation step) on the daily
  *    order-count series: the split k maximizing the between-segment
  *    SSE-reduction term Sₗ²/k + Sᵣ²/(n−k), priced exactly on the
  *    integer micro-grid (DECIMAL(38,0) cross-multiplied numerator,
  *    floored ×10⁶ quotient) so both engines agree bit-for-bit. The
  *    series is a bounded alphabet (≤ ~2 600 days at any data scale —
  *    the groupBy collapses 100 TB to that), prefix sums via the
  *    distributed [[Ranks.prefixSum]], argmax with smallest-k
  *    tie-break via two one-row broadcast scalars.
  *  - q283: SURVIVAL RISK TABLE (discrete Kaplan-Meier risk sets) on
  *    customer lifetime: duration = first→last order span in 30-day
  *    buckets; a customer is an EVENT (churn) when inactive ≥ 90 days
  *    before the corpus end, else CENSORED. Per bucket: n_at_risk
  *    (suffix count over the bounded bucket table), events, censored,
  *    and the integer hazard ppm — the engine-side form of a
  *    retention curve; the survival product is the consumer's fold.
  *
  * Scale shapes: q280 emits ≤ |s|+1 keys/row into an equi-join;
  * q281/q282/q283 are keyed reductions to bounded tables + Ranks
  * prefix-scan devices + one-row broadcast scalars — nothing
  * quadratic, no unpartitioned windows. */
object Wave42 {

  // ------------------------------------------------------------- q280

  /** itself + every single-character-deletion variant, tagged so the
    * join key carries the blocking nation. */
  private val DeletionVariants =
    "transform(sequence(0, length(c_name)), i -> CASE WHEN i = 0 " +
      "THEN c_name ELSE concat(substring(c_name, 1, i - 1), " +
      "substring(c_name, i + 1)) END)"

  /** Verified DISTINCT-name fuzzy pairs per nation: (c_nationkey,
    * name1 ≤ name2, dist ≤ 1); self-pairs (name1 == name2) mark
    * exact-duplicate groups. Shared by q280 (key expansion) and
    * q291's entity-resolution clustering. */
  private[ops] def fuzzyNamePairs(s: SparkSession, dir: String)
      : DataFrame = {
    val dn = graft.util.Pin(
      load(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_name"))
        .agg(count(lit(1)).as("cnt")))
    // explode the deletion-variant posting list ONCE and pin — both
    // sides of the blocking self-join read the same table
    val variants = graft.util.Pin(
      dn.select(col("c_nationkey"), col("c_name"),
        explode(expr(DeletionVariants)).as("v")))
    def side(tag: String): DataFrame =
      variants.withColumnRenamed("c_name", s"name$tag")
    // name1 == name2 keeps the self-pair (exact-duplicate groups);
    // name1 < name2 orients distinct-name pairs once
    side("1").join(side("2"), Seq("c_nationkey", "v"))
      .filter(col("name1") <= col("name2"))
      .select(col("c_nationkey"), col("name1"), col("name2"))
      .distinct() // a pair can share several deletion variants
      .withColumn("dist", levenshtein(col("name1"), col("name2"))
        .cast(LongType))
      .filter(col("dist") <= 1) // blocking is complete for d=1; verify
  }

  private def qFuzzyNameJoin(s: SparkSession, dir: String): DataFrame = {
    val c = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    // collapse to DISTINCT (nation, name) before any blocking: record
    // linkage corpora carry duplicate-name groups (here: ScaleUp
    // replicas; in the wild: real exact dupes), and blocking on raw
    // rows makes every posting list |group|× longer and the candidate
    // join |group|²× wider for pairs that need no verify at all. The
    // name-level join is the verify stage; keys re-enter only in the
    // final output expansion, which is sized by the TRUE result.
    val cand = fuzzyNamePairs(s, dir)
    // expand verified NAME pairs back to key pairs (output-sized)
    def keys(tag: String): DataFrame =
      c.select(col("c_nationkey"), col("c_name").as(s"name$tag"),
        col("c_custkey").as(s"ka$tag"))
    cand.join(keys("1"), Seq("c_nationkey", "name1"))
      .join(keys("2"), Seq("c_nationkey", "name2"))
      // same-name groups: keep each unordered key pair once; distinct
      // names: every (ka1, ka2) appears exactly once already
      .filter(col("name1") =!= col("name2") || col("ka1") < col("ka2"))
      .select(
        least(col("ka1"), col("ka2")).as("k1"),
        greatest(col("ka1"), col("ka2")).as("k2"),
        when(col("ka1") < col("ka2"), col("name1"))
          .otherwise(col("name2")).as("name1"),
        when(col("ka1") < col("ka2"), col("name2"))
          .otherwise(col("name1")).as("name2"),
        col("dist"))
      .orderBy(col("k1"), col("k2"))
  }

  private val qFuzzyNameJoinSql =
    """SELECT a.c_custkey AS k1, b.c_custkey AS k2,
      |  a.c_name AS name1, b.c_name AS name2,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY k1, k2""".stripMargin

  // ------------------------------------------------------------- q281

  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val parts = load(s, dir, "part")
    val g = parts.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).cast(LongType).as("msz"))
    // running max size over price order, then the STRICT-prefix max by
    // an adjacent-rank equi-join (row 1 has no cheaper price)
    val gm = Ranks.globalRank(
      Ranks.prefixMax(g, Seq(), Seq(col("p_retailprice")), col("msz"),
        "m_incl"),
      "rk", col("p_retailprice"))
    val prev = gm.select((col("rk") + 1).as("rk"),
      col("m_incl").as("m_excl"))
    val bound = gm.join(prev, Seq("rk"), "left")
      .select(col("p_retailprice"), col("msz"),
        coalesce(col("m_excl"), lit(Long.MinValue)).as("m_excl"))
    // a row is undominated iff it holds its price's max size AND that
    // size strictly beats every strictly-cheaper price's best
    parts.join(bound, Seq("p_retailprice"))
      .filter(col("p_size").cast(LongType) === col("msz") &&
        col("p_size").cast(LongType) > col("m_excl"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("p_size").cast(LongType).as("p_size"))
      .orderBy(col("p_partkey"))
  }

  private val qSkylineSql =
    """SELECT p_partkey, p_name, p_retailprice,
      |  CAST(p_size AS BIGINT) AS p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= p.p_retailprice
      |    AND b.p_size >= p.p_size
      |    AND (b.p_retailprice < p.p_retailprice
      |         OR b.p_size > p.p_size))
      |ORDER BY p_partkey""".stripMargin

  // ------------------------------------------------------------- q282

  private def qChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("y"))
    val pre = Ranks.prefixSum(
      Ranks.globalRank(daily, "k", col("day")),
      Seq(), Seq(col("day")), col("y"), "sl")
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("st"))
    val scored = pre.crossJoin(broadcast(tot)) // one-row totals frame
      .filter(col("k") < col("n"))
      .withColumn("sr", col("st") - col("sl"))
      // the k<n filter above makes the divisor nonzero; the CASE guard
      // additionally makes the expression total so no optimizer
      // evaluation order can trip ANSI divide-by-zero
      .withColumn("score_e6", expr(
        "CASE WHEN k >= n THEN NULL ELSE " +
          "CAST((CAST(sl AS DECIMAL(38,0)) * sl * (n - k) + " +
          "CAST(sr AS DECIMAL(38,0)) * sr * k) * 1000000 div " +
          "(CAST(k AS DECIMAL(38,0)) * (n - k)) AS BIGINT) END"))
    val mx = scored.agg(max(col("score_e6")).as("mx"))
    val bk = scored.crossJoin(broadcast(mx)) // one-row argmax scalar
      .filter(col("score_e6") === col("mx"))
      .agg(min(col("k")).as("best_k"))
    scored.crossJoin(broadcast(bk)) // one-row best-k scalar
      .select(col("k"), col("day").as("split_day"), col("sl"),
        col("sr"), col("score_e6"),
        (col("k") === col("best_k")).as("is_best"))
      .orderBy(col("k"))
  }

  private val qChangepointSql =
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT day, y,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
      |    CAST(SUM(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS sl
      |  FROM d),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(SUM(y) AS BIGINT) AS st FROM d),
      |sc AS (
      |  SELECT k, day AS split_day, sl, st - sl AS sr,
      |    CAST((CAST(sl AS HUGEINT) * sl * (n - k) +
      |          CAST(st - sl AS HUGEINT) * (st - sl) * k) * 1000000
      |      // (CAST(k AS HUGEINT) * (n - k)) AS BIGINT) AS score_e6
      |  FROM r, t WHERE k < n),
      |mx AS (SELECT MAX(score_e6) AS mx FROM sc),
      |bk AS (SELECT MIN(k) AS best_k FROM sc, mx
      |       WHERE score_e6 = mx.mx)
      |SELECT k, split_day, sl, CAST(sr AS BIGINT) AS sr, score_e6,
      |  k = bk.best_k AS is_best
      |FROM sc, bk ORDER BY k""".stripMargin

  // ------------------------------------------------------------- q283

  private val BucketDays = 30
  private val ChurnGapDays = 90

  private def qSurvivalTable(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
    val endD = o.agg(max(col("d")).as("end_d"))
    val per = o.groupBy(col("o_custkey"))
      .agg(min(col("d")).as("f"), max(col("d")).as("l"))
      .crossJoin(broadcast(endD)) // one-row corpus-end scalar
      .select(
        expr(s"CAST(datediff(l, f) div $BucketDays AS BIGINT)")
          .as("bucket"),
        (datediff(col("end_d"), col("l")) >= ChurnGapDays).as("event"))
    val byB = per.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event"), 1L).otherwise(0L)).as("n_event"))
    val tot = byB.agg(sum(col("n_total")).as("tot"))
    Ranks.prefixSum(byB, Seq(), Seq(col("bucket")), col("n_total"),
        "cum")
      .crossJoin(broadcast(tot)) // one-row cohort-size scalar
      .select(col("bucket"),
        (col("tot") - col("cum") + col("n_total")).as("n_risk"),
        col("n_event"),
        (col("n_total") - col("n_event")).as("n_censored"),
        expr("n_event * 1000000 div (tot - cum + n_total)")
          .as("hazard_ppm"))
      .orderBy(col("bucket"))
  }

  private val qSurvivalTableSql =
    s"""WITH o AS (
       |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
       |e AS (SELECT MAX(d) AS end_d FROM o),
       |p AS (SELECT o_custkey, MIN(d) AS f, MAX(d) AS l
       |      FROM o GROUP BY 1),
       |c AS (
       |  SELECT CAST(date_diff('day', f, l) // $BucketDays AS BIGINT)
       |      AS bucket,
       |    date_diff('day', l, e.end_d) >= $ChurnGapDays AS event
       |  FROM p, e),
       |b AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_total,
       |    CAST(SUM(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_event
       |  FROM c GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_total) AS BIGINT) AS tot FROM b),
       |w AS (
       |  SELECT bucket, n_total, n_event,
       |    CAST(SUM(n_total) OVER (ORDER BY bucket ROWS BETWEEN
       |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM b)
       |SELECT bucket, t.tot - w.cum + w.n_total AS n_risk, n_event,
       |  n_total - n_event AS n_censored,
       |  CAST(n_event * 1000000 // (t.tot - w.cum + n_total)
       |    AS BIGINT) AS hazard_ppm
       |FROM w, t ORDER BY bucket""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q280_fuzzy_name_join" -> QueryDef(qFuzzyNameJoin,
      Some(qFuzzyNameJoinSql),
      "edit-distance fuzzy entity-resolution join at Levenshtein <= 1 " +
        "via FastSS deletion-neighborhood blocking (complete for d=1), " +
        "candidate-scoped verify, never all-pairs"),
    "q281_skyline" -> QueryDef(qSkyline, Some(qSkylineSql),
      "skyline / Pareto frontier (min price, max size) as a " +
        "distributed sweep: per-price max, Ranks.prefixMax running " +
        "best, strict-prefix bound by adjacent-rank equi-join"),
    "q282_changepoint" -> QueryDef(qChangepoint, Some(qChangepointSql),
      "exact single changepoint (binary-segmentation step) on the " +
        "daily order-count series: integer-grid between-segment SSE " +
        "score per split, argmax with smallest-k tie-break"),
    "q283_survival_table" -> QueryDef(qSurvivalTable,
      Some(qSurvivalTableSql),
      "discrete survival risk table over customer lifetimes: 30-day " +
        "duration buckets, inactivity-censoring, suffix-count risk " +
        "sets and integer hazard ppm"))
}
