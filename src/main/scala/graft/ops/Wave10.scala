package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Tenth wave (round 7): entity resolution — the record-linkage
  * operator family (canonicalize → block → score → link → quality
  * audit), distinct from text near-dup: keys are STRUCTURED fields,
  * and the engineering problem is keeping the pair space sub-quadratic
  * while provably bounding what the blocking can miss. */
object Wave10 {

  /** q200: ENTITY RESOLUTION with canonicalize-then-link + multi-pass
    * blocking + quality audit. A "dirty" duplicate of every customer
    * record is synthesized deterministically (case-noised name,
    * balance off by custkey%5−2 cents, and — for custkey%7=0 — a
    * WRONG nation, the records no same-nation blocking can reach).
    *
    * The reference side is CANONICALIZED first (exact dedup on the
    * field tuple, min-key representative): linking against raw
    * references makes the candidate space grow as duplication², the
    * classic ER scale trap (measured here: the 100× directory clones
    * every customer 100-fold and a raw-side link blew up 39× per
    * decade); against canonical entities the block sizes are
    * independent of duplication and the join is linear in the dirty
    * side. Blocking runs two passes on (nation, segment, 10-dollar
    * balance bucket), the second with buckets shifted half a width: a
    * ±2-cent perturbation can cross one bucket boundary but never both
    * (boundary families are ≥498 cents apart), so within-nation truth
    * is captured by construction and the measured recall shortfall is
    * EXACTLY the wrong-nation injections. A candidate links when the
    * case-folded names agree and the balances are within 2 cents; a
    * link is TRUE when it lands on the canonical representative of the
    * dirty record's own source group.
    *
    * Scale shape: canonicalization is one map-side-combinable groupBy;
    * candidates form only inside (nation, segment, bucket, pass)
    * blocks with a deduplicated canonical side — never clean×dirty;
    * the truth lookup is one equi-join on the field tuple. */
  private def qEntityResolution(s: SparkSession, dir: String): DataFrame = {
    val clean = load(s, dir, "customer")
      .select(col("c_custkey").as("key"), col("c_name").as("nm"),
        col("c_nationkey").cast("long").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
    val canon = clean.groupBy(col("nm"), col("nat"), col("seg"), col("cents"))
      .agg(min(col("key")).as("canon_key"))
    val dirty = clean
      .select(col("key"), upper(col("nm")).as("nm"),
        when(pmod(col("key"), lit(7)) === 0, pmod(col("nat") + 1, lit(25)))
          .otherwise(col("nat")).as("nat"),
        col("seg"),
        (col("cents") + pmod(col("key"), lit(5)) - 2).as("cents"))
    // each dirty record's expected canonical rep: via its own clean row
    val expected = clean.join(canon, Seq("nm", "nat", "seg", "cents"))
      .select(col("key").as("b_key"), col("canon_key").as("expected_key"))
    def blocks(side: DataFrame, pfx: String, keyCol: String) = {
      def pass(p: Long, shift: Long) = side.select(
        col(keyCol).as(s"${pfx}_key"), col("nm").as(s"${pfx}_nm"),
        col("cents").as(s"${pfx}_cents"), col("nat"), col("seg"),
        lit(p).as("pass"), expr(s"(cents + $shift) div 1000").as("bkt"))
      pass(0L, 0L).unionByName(pass(1L, 500L))
    }
    val cand = blocks(canon, "a", "canon_key")
      .join(blocks(dirty, "b", "key"), Seq("nat", "seg", "pass", "bkt"))
      .select(col("nat"), col("a_key"), col("b_key"), col("a_nm"),
        col("b_nm"), col("a_cents"), col("b_cents"))
      .distinct()
    val scored = cand
      .withColumn("link",
        (lower(col("a_nm")) === lower(col("b_nm"))) &&
          abs(col("a_cents") - col("b_cents")) <= 2)
      .join(broadcast_safe(expected), Seq("b_key"), "left")
      .withColumn("true_link",
        col("link") && col("a_key") === col("expected_key"))
    val truth = clean.groupBy(col("nat"))
      .agg(count(lit(1)).as("n_dirty"))
    scored.groupBy(col("nat"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("link"), 1L).otherwise(0L)).as("n_links"),
        sum(when(col("true_link"), 1L).otherwise(0L)).as("n_true_links"))
      .join(truth, Seq("nat"), "right")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_links", coalesce(col("n_links"), lit(0L)))
      .withColumn("n_true_links", coalesce(col("n_true_links"), lit(0L)))
      .withColumn("precision_ppm", expr(
        "CASE WHEN n_links = 0 THEN 0L " +
          "ELSE n_true_links * 1000000 div n_links END"))
      .withColumn("recall_ppm",
        expr("n_true_links * 1000000 div n_dirty"))
      .select(col("nat").as("nation"), col("n_dirty"),
        col("n_candidates"), col("n_links"), col("precision_ppm"),
        col("recall_ppm"))
      .orderBy(col("nation"))
  }

  /** The expected-rep lookup is corpus-sized, not a broadcast dim —
    * plain shuffle join (named so the intent reads at the call site). */
  private def broadcast_safe(df: DataFrame): DataFrame = df

  private val qEntityResolutionSql =
    """WITH clean AS (
      |  SELECT c_custkey AS key, c_name AS nm,
      |    CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
      |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      |  FROM customer),
      |canon AS (
      |  SELECT nm, nat, seg, cents, MIN(key) AS canon_key
      |  FROM clean GROUP BY 1, 2, 3, 4),
      |dirty AS (
      |  SELECT key, upper(nm) AS nm,
      |    CASE WHEN key % 7 = 0 THEN (nat + 1) % 25 ELSE nat END AS nat,
      |    seg, cents + key % 5 - 2 AS cents
      |  FROM clean),
      |expected AS (
      |  SELECT clean.key AS b_key, canon.canon_key AS expected_key
      |  FROM clean JOIN canon USING (nm, nat, seg, cents)),
      |ab AS (
      |  SELECT canon_key AS a_key, nm, cents, nat, seg, 0 AS pass,
      |    cents // 1000 AS bkt FROM canon
      |  UNION ALL
      |  SELECT canon_key AS a_key, nm, cents, nat, seg, 1 AS pass,
      |    (cents + 500) // 1000 AS bkt FROM canon),
      |bb AS (
      |  SELECT key AS b_key, nm, cents, nat, seg, 0 AS pass,
      |    cents // 1000 AS bkt FROM dirty
      |  UNION ALL
      |  SELECT key AS b_key, nm, cents, nat, seg, 1 AS pass,
      |    (cents + 500) // 1000 AS bkt FROM dirty),
      |cand AS (
      |  SELECT DISTINCT a.nat, a.a_key, b.b_key,
      |    a.nm AS a_nm, b.nm AS b_nm,
      |    a.cents AS a_cents, b.cents AS b_cents
      |  FROM ab a JOIN bb b ON a.nat = b.nat AND a.seg = b.seg
      |    AND a.pass = b.pass AND a.bkt = b.bkt),
      |scored AS (
      |  SELECT c.nat, c.a_key, c.b_key,
      |    lower(a_nm) = lower(b_nm) AND abs(a_cents - b_cents) <= 2
      |      AS link,
      |    lower(a_nm) = lower(b_nm) AND abs(a_cents - b_cents) <= 2
      |      AND c.a_key = e.expected_key AS true_link
      |  FROM cand c LEFT JOIN expected e ON c.b_key = e.b_key),
      |agg AS (
      |  SELECT nat, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |    CAST(SUM(CASE WHEN link THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_links,
      |    CAST(SUM(CASE WHEN true_link THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_true_links
      |  FROM scored GROUP BY 1),
      |truth AS (
      |  SELECT nat, CAST(COUNT(*) AS BIGINT) AS n_dirty
      |  FROM clean GROUP BY 1)
      |SELECT truth.nat AS nation, n_dirty,
      |  COALESCE(n_candidates, 0) AS n_candidates,
      |  COALESCE(n_links, 0) AS n_links,
      |  CAST(CASE WHEN COALESCE(n_links, 0) = 0 THEN 0
      |       ELSE COALESCE(n_true_links, 0) * 1000000 // n_links END
      |    AS BIGINT) AS precision_ppm,
      |  CAST(COALESCE(n_true_links, 0) * 1000000 // n_dirty AS BIGINT)
      |    AS recall_ppm
      |FROM truth LEFT JOIN agg ON truth.nat = agg.nat
      |ORDER BY nation""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q200_entity_resolution" -> QueryDef(qEntityResolution,
      Some(qEntityResolutionSql),
      "record linkage: canonicalize-then-link, multi-pass balance-bucket blocking, per-nation precision/recall"))
}
