package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Thirty-seventh wave (round 9): the two data-contract audits a
  * platform runs on every drop, closing out the governance family —
  *
  *  - q267: REFERENTIAL-INTEGRITY audit. For every declared FK edge of
  *    the star schema, the orphan count (child keys with no parent),
  *    orphan ppm, and the smallest orphan key as a repair exemplar.
  *    Each edge is one distinct-child projection + one LEFT ANTI join
  *    (shuffle-hash on the key, the plan Spark picks for
  *    anti-join-at-scale) + a one-row aggregate; the report unions
  *    five bounded rows. On conforming TPC-H-shaped data every orphan
  *    count is zero — the spec twin injects orphans to pin the
  *    nonzero path.
  *  - q268: PROFILE DRIFT between two snapshots (pre/post-1996 order
  *    halves — q254's split): per column, row counts, exact distinct
  *    counts, and the deterministic-mode top value with its share —
  *    the drift report that catches a silent upstream distribution
  *    change. One melt (`stack`) per half; mode ties break on the
  *    value itself (q177's device) so the report is hash-stable.
  *
  * Scale shapes: q267 is five key-projected anti-joins (no fact-table
  * payload moves); q268 is two melt scans into alphabet-sized
  * aggregates. */
object Wave37 {

  // ------------------------------------------------------------- q267

  private def qRiAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      // NULL FK is conventionally not an RI violation, and NULL parent
      // keys never satisfy a reference — filter both sides explicitly
      // so anti-join (Spark) and NOT IN (oracle) agree on dirty data.
      val orphans = child.select(col(ck).as("k"))
        .filter(col("k").isNotNull).distinct()
        .join(parent.select(col(pk).as("k")).filter(col("k").isNotNull),
          Seq("k"), "left_anti")
      val stats = child.agg(count(lit(1)).as("n_child"),
        countDistinct(col(ck)).as("n_child_keys"))
      val os = orphans.agg(
        coalesce(count(lit(1)), lit(0L)).as("n_orphan_keys"),
        min(col("k")).as("first_orphan"))
      stats.crossJoin(broadcast(os)) // two one-row frames
        .select(lit(name).as("fk_edge"), col("n_child"),
          col("n_child_keys"), col("n_orphan_keys"),
          expr("n_orphan_keys * 1000000 div n_child_keys")
            .as("orphan_key_ppm"),
          coalesce(col("first_orphan").cast("long"), lit(-1L))
            .as("first_orphan"))
    }
    val li = load(s, dir, "lineitem")
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val p = load(s, dir, "part")
    val su = load(s, dir, "supplier")
    val n = load(s, dir, "nation")
    edge("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
        p, "p_partkey"))
      .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
        su, "s_suppkey"))
      .unionByName(edge("orders.custkey->customer", o, "o_custkey",
        c, "c_custkey"))
      .unionByName(edge("customer.nationkey->nation", c, "c_nationkey",
        n, "n_nationkey"))
      .orderBy(col("fk_edge"))
  }

  private val qRiAuditSql = {
    def edge(name: String, child: String, ck: String, parent: String,
        pk: String) =
      s"""SELECT '$name' AS fk_edge,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_child,
         |  (SELECT CAST(COUNT(DISTINCT $ck) AS BIGINT) FROM $child)
         |    AS n_child_keys,
         |  CAST(COUNT(*) AS BIGINT) AS n_orphan_keys,
         |  CAST(COUNT(*) * 1000000 // (SELECT COUNT(DISTINCT $ck)
         |    FROM $child) AS BIGINT) AS orphan_key_ppm,
         |  CAST(COALESCE(MIN(k), -1) AS BIGINT) AS first_orphan
         |FROM (SELECT DISTINCT $ck AS k FROM $child
         |      WHERE $ck IS NOT NULL AND $ck NOT IN
         |        (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)) t""".stripMargin
    Seq(
      edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      edge("lineitem.partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      edge("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      edge("orders.custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      edge("customer.nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }

  // ------------------------------------------------------------- q268

  /** Deterministic mode of v within (half, col): max count, ties to
    * the smallest value (q177's device). */
  private def qProfileDrift(s: SparkSession, dir: String): DataFrame = {
    val melted = load(s, dir, "orders").selectExpr(
      "CASE WHEN year(o_orderdate) >= 1996 THEN 'post' ELSE 'pre' END " +
        "AS half",
      """stack(3,
        |  'o_orderpriority', CAST(o_orderpriority AS STRING),
        |  'o_orderstatus',   CAST(o_orderstatus AS STRING),
        |  'o_shipyear',      CAST(year(o_orderdate) AS STRING)
        |) AS (col_name, v)""".stripMargin)
    val counts = melted.groupBy(col("half"), col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy(col("half"), col("col_name"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("ndv"))
    // mode tie rule: max count, tie → smallest value (q177's device)
    val top = counts.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("half"), col("col_name"))
          .orderBy(col("cnt").desc, col("v"))))
      .filter(col("rk") === 1)
      .select(col("half"), col("col_name"), col("v").as("top_v"),
        col("cnt").as("top_cnt"))
    val h = tot.join(top, Seq("half", "col_name"))
      .select(col("half"), col("col_name"), col("n"), col("ndv"),
        col("top_v"), expr("top_cnt * 1000000 div n").as("top_share_ppm"))
    val pre = h.filter(col("half") === "pre")
      .select(col("col_name"), col("n").as("n_pre"),
        col("ndv").as("ndv_pre"), col("top_v").as("top_v_pre"),
        col("top_share_ppm").as("top_share_pre_ppm"))
    val post = h.filter(col("half") === "post")
      .select(col("col_name"), col("n").as("n_post"),
        col("ndv").as("ndv_post"), col("top_v").as("top_v_post"),
        col("top_share_ppm").as("top_share_post_ppm"))
    pre.join(post, "col_name")
      .select(col("col_name"), col("n_pre"), col("n_post"),
        col("ndv_pre"), col("ndv_post"),
        (col("ndv_post") - col("ndv_pre")).as("ndv_delta"),
        col("top_v_pre"), col("top_share_pre_ppm"),
        col("top_v_post"), col("top_share_post_ppm"),
        (col("top_share_post_ppm") - col("top_share_pre_ppm"))
          .as("share_drift_ppm"))
      .orderBy(col("col_name"))
  }

  private val qProfileDriftSql =
    """WITH melted AS (
      |  SELECT CASE WHEN year(o_orderdate) >= 1996 THEN 'post'
      |    ELSE 'pre' END AS half, col_name, v FROM (
      |    SELECT o_orderdate, 'o_orderpriority' AS col_name,
      |      CAST(o_orderpriority AS VARCHAR) AS v FROM orders
      |    UNION ALL SELECT o_orderdate, 'o_orderstatus',
      |      CAST(o_orderstatus AS VARCHAR) FROM orders
      |    UNION ALL SELECT o_orderdate, 'o_shipyear',
      |      CAST(year(o_orderdate) AS VARCHAR) FROM orders)),
      |counts AS (
      |  SELECT half, col_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM melted GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT half, col_name,
      |    CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS ndv
      |  FROM counts GROUP BY 1, 2),
      |top AS (
      |  SELECT half, col_name, v AS top_v, cnt AS top_cnt FROM (
      |    SELECT *, row_number() OVER (PARTITION BY half, col_name
      |      ORDER BY cnt DESC, v) AS rk FROM counts) r
      |  WHERE rk = 1),
      |h AS (
      |  SELECT t.half, t.col_name, t.n, t.ndv, p.top_v,
      |    p.top_cnt * 1000000 // t.n AS top_share_ppm
      |  FROM tot t JOIN top p
      |    ON p.half = t.half AND p.col_name = t.col_name)
      |SELECT p.col_name, p.n AS n_pre, q.n AS n_post,
      |  p.ndv AS ndv_pre, q.ndv AS ndv_post,
      |  q.ndv - p.ndv AS ndv_delta,
      |  p.top_v AS top_v_pre, p.top_share_ppm AS top_share_pre_ppm,
      |  q.top_v AS top_v_post, q.top_share_ppm AS top_share_post_ppm,
      |  q.top_share_ppm - p.top_share_ppm AS share_drift_ppm
      |FROM h p JOIN h q ON p.col_name = q.col_name
      |WHERE p.half = 'pre' AND q.half = 'post'
      |ORDER BY p.col_name""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q267_ri_audit" -> QueryDef(qRiAudit, Some(qRiAuditSql),
      "referential-integrity audit over the star schema's five FK " +
        "edges: orphan counts, ppm, repair exemplars"),
    "q268_profile_drift" -> QueryDef(qProfileDrift, Some(qProfileDriftSql),
      "two-snapshot column-profile drift: counts, exact NDV, " +
        "deterministic-mode top value and share shift"))
}
