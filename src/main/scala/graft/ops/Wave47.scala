package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Forty-seventh wave (round 10): the entity-resolution pipeline
  * COMPLETED —
  *
  *  - q291: GOLDEN-RECORD SELECTION (MDM survivorship). q280 finds
  *    likely-duplicate customer pairs; this query finishes the job a
  *    master-data system runs: collapse to (nation, name) group nodes
  *    (node id = the group's min custkey — collision-free by
  *    construction), connect fuzzy-matched names with the shared
  *    [[Components]] star-contraction device, fold exact-duplicate
  *    groups and isolated nodes in (a singleton name node with 2+
  *    customers IS a duplicate cluster), and elect one canonical
  *    record per multi-member cluster by the stated survivorship
  *    rule: most orders, tie → lowest key. The DuckDB oracle states
  *    reachability declaratively (recursive CTE over the same
  *    name-node graph — the q52 third-formulation pattern), so Spark
  *    label propagation and SQL transitive closure must agree on
  *    every cluster id, member count, and elected record.
  *
  * Scale shape: the match stage is q280's vocab-sized distinct-name
  * blocking; the cluster stage runs on NAME-GROUP nodes (≤ |distinct
  * names|, not |customers|); survivorship is one keyed window over
  * cluster members. Measured structure at sf0.01: 1 500 name nodes,
  * 795 components, max component 17 — the name graph stays sparse at
  * every SF because nation blocks it. */
object Wave47 {

  // ------------------------------------------------------------- q291

  private def qGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    val c = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    // one node per (nation, name) group; id = the group's min custkey
    val nodes = graft.util.Pin(
      c.groupBy(col("c_nationkey"), col("c_name"))
        .agg(min(col("c_custkey")).as("nid")))
    def nk(tag: String): DataFrame =
      nodes.select(col("c_nationkey"), col("c_name").as(s"name$tag"),
        col("nid").as(s"nid$tag"))
    val edges = Wave42.fuzzyNamePairs(s, dir)
      .filter(col("name1") < col("name2"))
      .join(nk("1"), Seq("c_nationkey", "name1"))
      .join(nk("2"), Seq("c_nationkey", "name2"))
      .select(col("nid1").as("a"), col("nid2").as("b"))
    // the edit-distance name graph is chain-prone by construction
    // (name_k ~ name_k+1 chains) — go straight to star contraction
    val comp = Components.connectedComponents(edges, preferStar = true)
    // isolated name nodes keep their own id as the cluster id
    val labeled = nodes
      .join(comp.select(col("id").as("nid"), col("component")),
        Seq("nid"), "left")
      .select(col("c_nationkey"), col("c_name"),
        coalesce(col("component"), col("nid")).as("cluster_id"))
    val ordc = load(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val members = c.join(labeled, Seq("c_nationkey", "c_name"))
      .join(ordc, col("c_custkey") === col("o_custkey"), "left")
      .select(col("cluster_id"), col("c_nationkey"), col("c_custkey"),
        col("c_name"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    val sizes = members.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    // survivorship: most orders, tie -> lowest key (keyed window)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("n_orders").desc, col("c_custkey").asc)
    members.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(sizes, Seq("cluster_id"))
      .filter(col("n_members") >= 2)
      .select(col("cluster_id"),
        col("c_nationkey").cast(LongType).as("nation"),
        col("n_members"),
        col("c_custkey").as("canonical_key"),
        col("c_name").as("canonical_name"),
        col("n_orders").as("canonical_orders"))
      .orderBy(col("cluster_id"))
  }

  private val qGoldenRecordSql =
    """WITH RECURSIVE g AS (
      |  SELECT c_nationkey AS nat, c_name AS nm, MIN(c_custkey) AS nid
      |  FROM customer GROUP BY 1, 2),
      |p AS (
      |  SELECT a.nid AS a, b.nid AS b FROM g a JOIN g b
      |  ON a.nat = b.nat AND a.nm < b.nm
      |  WHERE levenshtein(a.nm, b.nm) <= 1),
      |e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
      |reach AS (
      |  SELECT nid AS node, nid AS r FROM g
      |  UNION
      |  SELECT re.node, e.b AS r FROM reach re JOIN e ON e.a = re.r),
      |comp AS (SELECT node, MIN(r) AS cluster_id FROM reach
      |         GROUP BY node),
      |ordc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      |         FROM orders GROUP BY 1),
      |mem AS (
      |  SELECT comp.cluster_id, c.c_nationkey, c.c_custkey, c.c_name,
      |    COALESCE(ordc.n_orders, 0) AS n_orders
      |  FROM customer c
      |  JOIN g ON g.nat = c.c_nationkey AND g.nm = c.c_name
      |  JOIN comp ON comp.node = g.nid
      |  LEFT JOIN ordc ON ordc.o_custkey = c.c_custkey),
      |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
      |       FROM mem GROUP BY 1),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY cluster_id
      |    ORDER BY n_orders DESC, c_custkey) AS rk
      |  FROM mem)
      |SELECT m.cluster_id, CAST(m.c_nationkey AS BIGINT) AS nation,
      |  sz.n_members, m.c_custkey AS canonical_key,
      |  m.c_name AS canonical_name,
      |  CAST(m.n_orders AS BIGINT) AS canonical_orders
      |FROM rk m JOIN sz USING (cluster_id)
      |WHERE m.rk = 1 AND sz.n_members >= 2
      |ORDER BY cluster_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q291_golden_record" -> QueryDef(qGoldenRecord,
      Some(qGoldenRecordSql),
      "MDM golden-record selection: fuzzy-matched name groups " +
        "clustered via star-contraction components (name-node graph, " +
        "vocab-sized), exact-dup groups folded in, one canonical " +
        "record per multi-member cluster by most-orders/lowest-key " +
        "survivorship"))
}
