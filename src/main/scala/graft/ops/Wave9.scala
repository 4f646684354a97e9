package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Ninth-wave battery (round 7): dedup-health and corpus-governance
  * reports that COMPOSE the earlier machinery — the cluster graph
  * (q52), the hash split (q54), the count-histogram rank device
  * (q154/q168) — into the summaries an operator actually reads before
  * shipping a corpus. House rules as ever: integer-exact with
  * DECIMAL(38,0)/HUGEINT routing past 2^63, heavy work map-side
  * combinable, rank logic only on bounded histogram tables. */
object Wave9 {

  // ------------------------------------------------------------- q196

  /** q196: LABEL-BALANCE AUDIT (Gini impurity) — per source, how
    * skewed is the language mix: gini_ppm = 10^6 − Σ_k c_k²·10^6 div
    * n², majority share alongside. Zero means single-language, higher
    * means balanced; the report that drives per-source language
    * rebalancing (q62) rather than corpus-wide.
    *
    * Scale shape: one map-side-combinable groupBy(source, lang); the
    * impurity arithmetic runs on the ≤(sources×langs) count table,
    * products in DECIMAL(38,0). */
  private def qGiniBalance(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        max(col("c")).as("majority"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sq"))
      .withColumn("majority_ppm", expr("majority * 1000000 div n_docs"))
      .withColumn("gini_ppm", expr(
        "CAST(1000000 - sq * 1000000 div " +
          "(CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("majority_ppm"), col("gini_ppm"))
      .orderBy(col("source"))

  private val qGiniBalanceSql =
    """WITH cm AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_langs,
      |  CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS majority_ppm,
      |  CAST(1000000 - SUM(CAST(c AS HUGEINT) * c) * 1000000
      |    // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT) AS gini_ppm
      |FROM cm GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------- q197

  /** q197: DEDUP-CLUSTER SIZE HISTOGRAM — the shape of the near-dup
    * graph as an operator reads it: how many clusters of each size,
    * how many documents they hold, and how many a keep-the-min-id
    * dedup pass would drop (size − 1 per cluster). Size 1 counts the
    * documents in NO verified pair. The q52 component machinery is
    * reused verbatim, so this report is consistent with the cluster
    * listing by construction.
    *
    * Scale shape: components via the q52 label propagation
    * (large/small-star, O(log² n) rounds); everything after is
    * aggregation on the component table; the histogram is bounded by
    * the largest cluster size. */
  private def qClusterHistogram(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val comp = graft.ops.Components.connectedComponents(pairs)
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    val hist = sizes.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val totalDocs = load(s, dir, "documents")
      .agg(count(lit(1)).as("total"))
    val inGraph = comp.agg(count(lit(1)).as("in_graph"))
    val singletons = totalDocs.crossJoin(broadcast(inGraph))
      .select(lit(1L).as("cluster_size"),
        (col("total") - col("in_graph")).as("n_clusters"))
    hist.unionByName(singletons)
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
      .withColumn("docs_dropped",
        (col("cluster_size") - 1) * col("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  private val qClusterHistogramSql =
    s"""WITH RECURSIVE ${Dedup.clustersCte},
       |sizes AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY 1),
       |hist AS (
       |  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
       |  FROM sizes GROUP BY 1
       |  UNION ALL
       |  SELECT 1, (SELECT COUNT(*) FROM documents)
       |           - (SELECT COUNT(*) FROM comp))
       |SELECT cluster_size, n_clusters,
       |  cluster_size * n_clusters AS n_docs,
       |  (cluster_size - 1) * n_clusters AS docs_dropped
       |FROM hist ORDER BY cluster_size""".stripMargin

  // ------------------------------------------------------------- q198

  /** q198: TOP-1% USER CONCENTRATION — what share of all events the
    * heaviest percentile of users generates: the abuse/bot screen and
    * the sampling-bias check before user-keyed training data ships.
    * k = ⌈U/100⌉ top users by event count; because every user at the
    * threshold count contributes the same count, the share is a pure
    * function of the COUNT-OF-COUNTS histogram — no per-user ranking:
    * threshold c* = smallest c with ≥ k users at count ≥ c, then
    * top_events = Σ_{c>c*} c·m_c + (k − |{c>c*}|)·c*.
    *
    * Scale shape: groupBy(user) then groupBy(count) — both map-side
    * combinable; the rank scan runs on the count histogram (bounded by
    * the max per-user count, same device as q154/q168/q185), products
    * DECIMAL-routed. */
  private def qConcentration(s: SparkSession, dir: String): DataFrame = {
    val perUser = load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val hist = perUser.groupBy(col("c")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("users_ge", sum(col("m")).over(w))
      .withColumn("events_gt",
        sum(expr("CAST(c AS DECIMAL(38,0)) * m")).over(w)
          - expr("CAST(c AS DECIMAL(38,0)) * m"))
      .withColumn("n_users", sum(col("m")).over(wAll))
      .withColumn("total_events",
        sum(expr("CAST(c AS DECIMAL(38,0)) * m")).over(wAll))
      .withColumn("k", expr("(n_users + 99) div 100"))
      .filter(col("users_ge") >= col("k"))
      .withColumn("rnk", row_number().over(Window.orderBy(col("c").desc)))
      .filter(col("rnk") === 1)
      .withColumn("top_events", expr(
        "events_gt + (k - (users_ge - m)) * CAST(c AS DECIMAL(38,0))"))
      .select(col("n_users"), col("k"), col("c").as("threshold_count"),
        expr("CAST(top_events AS BIGINT)").as("top_events"),
        expr("CAST(total_events AS BIGINT)").as("total_events"),
        expr("CAST(top_events * 1000000 div total_events AS BIGINT)")
          .as("share_ppm"))
  }

  private val qConcentrationSql =
    """WITH pu AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |hist AS (
      |  SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM pu GROUP BY 1),
      |sc AS (
      |  SELECT c, m,
      |    SUM(m) OVER (ORDER BY c DESC) AS users_ge,
      |    SUM(CAST(c AS HUGEINT) * m) OVER (ORDER BY c DESC)
      |      - CAST(c AS HUGEINT) * m AS events_gt,
      |    SUM(m) OVER () AS n_users,
      |    SUM(CAST(c AS HUGEINT) * m) OVER () AS total_events
      |  FROM hist),
      |att AS (
      |  SELECT *, (n_users + 99) // 100 AS k,
      |    ROW_NUMBER() OVER (ORDER BY c DESC) AS rnk_all
      |  FROM sc),
      |thr AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY c DESC) AS rnk
      |  FROM att WHERE users_ge >= k)
      |SELECT CAST(n_users AS BIGINT) AS n_users, CAST(k AS BIGINT) AS k,
      |  c AS threshold_count,
      |  CAST(events_gt + (k - (users_ge - m)) * CAST(c AS HUGEINT)
      |    AS BIGINT) AS top_events,
      |  CAST(total_events AS BIGINT) AS total_events,
      |  CAST((events_gt + (k - (users_ge - m)) * CAST(c AS HUGEINT))
      |    * 1000000 // total_events AS BIGINT) AS share_ppm
      |FROM thr WHERE rnk = 1""".stripMargin

  // ------------------------------------------------------------- q199

  /** q199: TRAIN/TEST NEAR-DUP LEAKAGE AUDIT — verified near-dup pairs
    * (the q35→q37 chain) that CROSS the q54 hash-split boundary: each
    * such pair is an eval document whose near-copy sits in train, the
    * leak the split-then-dedup ordering mistake ships. Reuses the
    * production split assignment ([[Curation.splitCol]]) and pair
    * graph verbatim, so the audit is consistent with both gates by
    * construction. One row per (split_a, split_b) with the leak flag.
    *
    * Scale shape: the pair graph is band-bucketed (never corpus²); the
    * split is a pure projection joined on doc_id; the report is a
    * ≤9-row aggregate. */
  private def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val split = load(s, dir, "documents")
      .select(col("doc_id"), Curation.splitCol.as("split"))
    Dedup.jaccardPairs(s, dir)
      .join(split.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", col("split_a") =!= col("split_b"))
      .orderBy(col("split_a"), col("split_b"))
  }

  private val qSplitLeakageSql =
    s"""WITH ${Dedup.verifiedPairsCte},
       |sp AS (
       |  SELECT doc_id, ${Curation.splitCaseSql.linesIterator.mkString(" ")}
       |    AS split
       |  FROM documents)
       |SELECT a.split AS split_a, b.split AS split_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  a.split <> b.split AS is_leak
       |FROM pairs p
       |JOIN sp a ON a.doc_id = p.doc_a
       |JOIN sp b ON b.doc_id = p.doc_b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q196_gini_balance" -> QueryDef(qGiniBalance, Some(qGiniBalanceSql),
      "per-source label-balance Gini impurity, DECIMAL-routed integer ppm"),
    "q197_cluster_histogram" -> QueryDef(qClusterHistogram,
      Some(qClusterHistogramSql),
      "near-dup cluster size histogram + drop counts over the q52 component graph"),
    "q198_concentration" -> QueryDef(qConcentration, Some(qConcentrationSql),
      "top-1% user event concentration from the count-of-counts histogram"),
    "q199_split_leakage" -> QueryDef(qSplitLeakage, Some(qSplitLeakageSql),
      "near-dup pairs crossing the q54 train/val/test split boundary"))
}
