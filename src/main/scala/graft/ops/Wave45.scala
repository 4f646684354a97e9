package graft.ops

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Forty-fifth wave (round 10): the Hilbert layout USED (not just
  * audited), and the embedding-training graph precursor —
  *
  *  - q287: HILBERT RANGE-SCAN PRUNING — q284 measured that the
  *    Hilbert layout's files have tight bounding boxes; this query
  *    CASHES that in: a rectangle predicate (20–30% of the partkey
  *    domain × 40–60% of the suppkey domain) is answered by scanning
  *    ONLY the files whose zone-map box intersects the rectangle.
  *    The output carries both the pruned-scan match count and the
  *    full-scan match count side by side — their equality is the
  *    pruning-soundness proof, hash-gated cross-engine; files_scanned
  *    vs 64 is the measured data-skipping win a lakehouse gets from
  *    the layout (zone maps can only prune what the layout clusters).
  *  - q288: DETERMINISTIC RANDOM WALKS (DeepWalk's input stage) over
  *    the co-purchase graph: from every node, a 4-step walk where
  *    step t at node v moves to the neighbor w minimizing the stated
  *    48-bit md5 hash of "t{t}|v|w" — a pseudo-random but
  *    hash-gateable choice (the same device the battery uses
  *    everywhere randomness must replay: the choice is a FUNCTION of
  *    (t, v, w), so both engines walk identically). next(t, ·) is
  *    computed ONCE per node per step (walks are memoryless given
  *    the step index), so the whole corpus of walks is 4 equi-joins
  *    against 4 argmin tables — never a per-walk loop.
  *
  * Scale shapes: q287 is the q284 ranking (one range shuffle) + one
  * ≤64-row zone-map table + broadcast scalars; q288 is the shared
  * Pinned strongEdges device + 4 keyed argmin aggregates + 4
  * equi-joins — the standard distributed DeepWalk shape (each step
  * touches each edge once). */
object Wave45 {

  // ------------------------------------------------------------- q287

  // rectangle bounds as ppc (percent) of each key domain, stated once
  private val PkLoPct = 20L; private val PkHiPct = 30L
  private val SkLoPct = 40L; private val SkHiPct = 60L

  private def qHilbertRangeScan(s: SparkSession, dir: String): DataFrame = {
    val assigned = Wave43.rankedFiles(Wave43.scaledBase(s, dir),
      Wave43.hilbertKey)
      .withColumn("lo1", expr(s"pk_mx * $PkLoPct div 100"))
      .withColumn("hi1", expr(s"pk_mx * $PkHiPct div 100"))
      .withColumn("lo2", expr(s"sk_mx * $SkLoPct div 100"))
      .withColumn("hi2", expr(s"sk_mx * $SkHiPct div 100"))
      .withColumn("m", col("l_partkey").between(col("lo1"), col("hi1"))
        && col("l_suppkey").between(col("lo2"), col("hi2")))
    val files = assigned.groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("pk_min"),
        max(col("l_partkey")).as("pk_max"),
        min(col("l_suppkey")).as("sk_min"),
        max(col("l_suppkey")).as("sk_max"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_match"),
        max(col("lo1")).as("lo1"), max(col("hi1")).as("hi1"),
        max(col("lo2")).as("lo2"), max(col("hi2")).as("hi2"))
      // zone-map pruning rule: scan iff the file's box intersects the
      // rectangle on BOTH dimensions
      .withColumn("scanned",
        col("pk_min") <= col("hi1") && col("pk_max") >= col("lo1") &&
          col("sk_min") <= col("hi2") && col("sk_max") >= col("lo2"))
    val totals = files.agg(
      sum(when(col("scanned"), 1L).otherwise(0L)).as("files_scanned"),
      sum(when(col("scanned"), col("n_match")).otherwise(0L))
        .as("rows_in_rect_pruned"),
      sum(col("n_match")).as("rows_in_rect_full"))
    files.crossJoin(broadcast(totals)) // one-row totals scalar
      .select(col("file"), col("scanned"), col("n_rows"),
        col("n_match"), col("files_scanned"),
        col("rows_in_rect_pruned"), col("rows_in_rect_full"))
      .orderBy(col("file"))
  }

  private val qHilbertRangeScanSql =
    s"""WITH mx AS (
       |  SELECT MAX(l_partkey) AS pk_mx, MAX(l_suppkey) AS sk_mx
       |  FROM lineitem),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem),
       |sc AS MATERIALIZED (
       |  SELECT l_partkey, l_suppkey,
       |    l_partkey * 65536 // (pk_mx + 1) AS x,
       |    l_suppkey * 65536 // (sk_mx + 1) AS y,
       |    pk_mx * $PkLoPct // 100 AS lo1, pk_mx * $PkHiPct // 100 AS hi1,
       |    sk_mx * $SkLoPct // 100 AS lo2, sk_mx * $SkHiPct // 100 AS hi2
       |  FROM lineitem, mx),
       |h0 AS (
       |  SELECT l_partkey, l_suppkey, x, y, CAST(0 AS BIGINT) AS d
       |  FROM sc),
       |${Wave43.hilbertSqlChain("h0")},
       |hm AS (
       |  SELECT h.l_partkey, h.l_suppkey, h.d, s.lo1, s.hi1, s.lo2,
       |    s.hi2,
       |    h.l_partkey BETWEEN s.lo1 AND s.hi1
       |      AND h.l_suppkey BETWEEN s.lo2 AND s.hi2 AS m
       |  FROM hst15 h, (SELECT DISTINCT lo1, hi1, lo2, hi2 FROM sc) s),
       |f AS MATERIALIZED (
       |  SELECT file, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       |    MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max,
       |    CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_match,
       |    MAX(lo1) AS lo1, MAX(hi1) AS hi1,
       |    MAX(lo2) AS lo2, MAX(hi2) AS hi2
       |  FROM (
       |    SELECT *, ((row_number() OVER (ORDER BY d, l_partkey,
       |      l_suppkey)) - 1) * ${Wave43.NumFiles} // n.n_total AS file
       |    FROM hm, n)
       |  GROUP BY 1),
       |fs AS (
       |  SELECT *,
       |    pk_min <= hi1 AND pk_max >= lo1 AND sk_min <= hi2
       |      AND sk_max >= lo2 AS scanned
       |  FROM f),
       |t AS (
       |  SELECT CAST(SUM(CASE WHEN scanned THEN 1 ELSE 0 END)
       |      AS BIGINT) AS files_scanned,
       |    CAST(SUM(CASE WHEN scanned THEN n_match ELSE 0 END)
       |      AS BIGINT) AS rows_in_rect_pruned,
       |    CAST(SUM(n_match) AS BIGINT) AS rows_in_rect_full
       |  FROM fs)
       |SELECT CAST(file AS BIGINT) AS file, scanned, n_rows, n_match,
       |  files_scanned, rows_in_rect_pruned, rows_in_rect_full
       |FROM fs, t ORDER BY file""".stripMargin

  // ------------------------------------------------------------- q288

  private val WalkSteps = 4
  private val WalkSupport = 2L

  private def stepHashExpr(t: Int): String =
    s"CAST(conv(substring(md5(concat('t$t|', a, '|', b)), 1, 12), " +
      "16, 10) AS BIGINT)"

  private def qRandomWalks(s: SparkSession, dir: String): DataFrame = {
    val e = Graphs.symmetricEdges(
      Graphs.strongEdges(s, dir, WalkSupport))
    // next(t, v): the hash-argmin neighbor, computed once per node per
    // step (walks are memoryless given the step index)
    def nxt(t: Int): DataFrame =
      e.withColumn("h", expr(stepHashExpr(t)))
        .groupBy(col("a"))
        .agg(min(struct(col("h"), col("b"))).as("m"))
        .select(col("a").as(s"c$t"), col("m.b").as(s"n$t"))
    val nodes = e.select(col("a").as("n0")).distinct()
    (1 to WalkSteps).foldLeft(nodes) { (acc, t) =>
      acc.join(nxt(t),
        acc(s"n${t - 1}") === col(s"c$t")).drop(s"c$t")
    }
      .select(col("n0"), col("n1"), col("n2"), col("n3"), col("n4"))
      .orderBy(col("n0"))
  }

  private val qRandomWalksSql = {
    def hash(t: Int) =
      s"CAST(('0x' || substring(md5('t$t|' || a || '|' || b), 1, 12)) " +
        "AS BIGINT)"
    val nxts = (1 to WalkSteps).map { t =>
      s"""nx$t AS MATERIALIZED (
         |  SELECT a, b FROM (
         |    SELECT a, b, row_number() OVER (PARTITION BY a
         |      ORDER BY ${hash(t)}, b) AS rn
         |    FROM e)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o
       |  WHERE x.p < y.p GROUP BY 1, 2
       |  HAVING COUNT(*) >= $WalkSupport),
       |e AS MATERIALIZED (
       |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
       |$nxts
       |SELECT n.a AS n0, nx1.b AS n1, nx2.b AS n2, nx3.b AS n3,
       |  nx4.b AS n4
       |FROM (SELECT DISTINCT a FROM e) n
       |JOIN nx1 ON nx1.a = n.a
       |JOIN nx2 ON nx2.a = nx1.b
       |JOIN nx3 ON nx3.a = nx2.b
       |JOIN nx4 ON nx4.a = nx3.b
       |ORDER BY n0""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q287_hilbert_range_scan" -> QueryDef(qHilbertRangeScan,
      Some(qHilbertRangeScanSql),
      "Hilbert range-scan pruning: rectangle predicate answered from " +
        "only the files whose zone-map box intersects it; pruned == " +
        "full match count (soundness) gated beside the files-scanned " +
        "win"),
    "q288_random_walks" -> QueryDef(qRandomWalks,
      Some(qRandomWalksSql),
      "deterministic random walks (DeepWalk input): 4-step walk from " +
        "every co-purchase node, step = stated-hash argmin neighbor, " +
        "computed once per (step, node) and joined - never a " +
        "per-walk loop"))
}
