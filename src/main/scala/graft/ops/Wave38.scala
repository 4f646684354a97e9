package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Thirty-eighth wave (round 9): anti-entropy support for the CDC
  * replication domain —
  *
  *  - q269: MERKLE RANGE-DIGEST TREE over the fact table. The sync
  *    primitive two replicas exchange to find divergent key ranges
  *    without shipping data (the Dynamo/Cassandra repair device, here
  *    over the orderkey space): 64 contiguous leaf ranges, 8 mid
  *    nodes, 1 root — each node carries its row count and an
  *    ORDER-INDEPENDENT content digest (exact DECIMAL(38,0) sum of
  *    per-row md5-prefix integers, the q166 fingerprint device made
  *    hierarchical). The WHOLE tree is ONE scan + ONE ROLLUP
  *    aggregate — levels fall out of the grouping sets, so comparing
  *    trees costs a 73-row exchange and a divergence drills down
  *    left-to-right. Digests ship as digit strings (atomic-schema
  *    contract; DuckDB HUGEINT and Spark DECIMAL(38,0) render
  *    identically).
  *
  * Scale shape: the range bound comes from one max() scalar
  * (broadcast, q70 shape); the rollup partial-aggregates map-side to
  * ≤73 rows per partition. At 100 TB this is the cheapest possible
  * replica-comparison pass: one read, no shuffle wider than the node
  * count. */
object Wave38 {

  private val Leaves = 64L
  private val Fanout = 8L

  private def qMerkleDigest(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val mx = li.agg(max(col("l_orderkey")).as("mx"))
    val rows = li.crossJoin(broadcast(mx)) // 1-row range-bound scalar
      .select(
        expr(s"l_orderkey * $Leaves div (mx + 1)").as("leaf"),
        // row digest: md5 prefix of the canonical row rendering,
        // 12 hex chars -> 48-bit int (the q166/q263 device)
        expr("CAST(conv(substring(md5(concat_ws('|', " +
          "CAST(l_orderkey AS STRING), CAST(l_partkey AS STRING), " +
          "CAST(l_suppkey AS STRING), " +
          "CAST(CAST(floor(l_quantity) AS BIGINT) AS STRING))), " +
          "1, 12), 16, 10) AS DECIMAL(38,0))").as("h"))
      .withColumn("mid", expr(s"leaf div $Fanout"))
    rows.rollup(col("mid"), col("leaf"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("digest"))
      .select(
        // level 2 = leaves, 1 = mid nodes, 0 = root
        when(col("leaf").isNotNull, lit(2L))
          .when(col("mid").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("level"),
        coalesce(col("leaf"), col("mid"), lit(0L)).as("node"),
        col("n_rows"),
        col("digest").cast("string").as("digest_s"))
      .orderBy(col("level"), col("node"))
  }

  private val qMerkleDigestSql =
    s"""WITH rows_ AS (
       |  SELECT l_orderkey * $Leaves
       |      // ((SELECT MAX(l_orderkey) FROM lineitem) + 1) AS leaf,
       |    CAST(CAST(('0x' || substring(md5(
       |      CAST(l_orderkey AS VARCHAR) || '|' ||
       |      CAST(l_partkey AS VARCHAR) || '|' ||
       |      CAST(l_suppkey AS VARCHAR) || '|' ||
       |      CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)),
       |      1, 12)) AS BIGINT) AS HUGEINT) AS h
       |  FROM lineitem),
       |r2 AS (SELECT leaf, leaf // $Fanout AS mid, h FROM rows_)
       |SELECT
       |  CAST(CASE WHEN GROUPING(leaf) = 0 THEN 2
       |    WHEN GROUPING(mid) = 0 THEN 1 ELSE 0 END AS BIGINT) AS level,
       |  CAST(COALESCE(leaf, mid, 0) AS BIGINT) AS node,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(h) AS VARCHAR) AS digest_s
       |FROM r2 GROUP BY ROLLUP (mid, leaf)
       |ORDER BY level, node""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q269_merkle_digest" -> QueryDef(qMerkleDigest, Some(qMerkleDigestSql),
      "Merkle range-digest tree (64 leaves / 8 mids / root) in one " +
        "rollup pass — the replica anti-entropy comparison primitive"))
}
