package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Fourteenth wave (round 7): series, privacy and stability — exact
  * integer autocorrelation of the hourly event series, t-closeness
  * (the distributional member of the k-anonymity/l-diversity family,
  * via 1-D earth-mover distance on ordinal categories), single-source
  * BFS distances on the strong co-purchase graph (the iterative
  * frontier pattern with a recursive-CTE oracle), and top-k ranking
  * churn between serving windows (set + rank stability of a leaderboard).
  *
  * House rules: integer ppm, DECIMAL(38,0)/HUGEINT routing, bounded
  * spines/frontiers, no per-row ranking over raw fact tables. */
object Wave14 {

  // ------------------------------------------------------------- q215

  /** q215: AUTOCORRELATION of the hourly event-count series per type,
    * at lags {1, 2, 3, 6, 12, 24} — the seasonality detector behind
    * the q182 decomposition: r_k scaled by n² so everything stays
    * integer: r_k = Σ(n·c_t − S)(n·c_{t+k} − S) / Σ(n·c_t − S)², the
    * textbook estimator with full-series mean and variance
    * denominator. Missing hours are real zeros: the series is
    * completed against an explicit hour spine before anything is
    * computed (an ACF over a gappy series is a different statistic).
    *
    * Scale shape: one groupBy(type, hour) over events; the spine,
    * lag join and moment sums all run on the ≤(types × 720)-row
    * series table. */
  private def qAutocorrelation(s: SparkSession, dir: String): DataFrame = {
    val cnt = load(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000")
          .as("hr"))
      .agg(count(lit(1)).as("c"))
    val bounds = cnt.groupBy(col("event_type"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    val series = bounds
      .withColumn("hr", explode(expr("sequence(lo, hi)")))
      .join(cnt, Seq("event_type", "hr"), "left")
      .select(col("event_type"), (col("hr") - col("lo")).as("t"),
        coalesce(col("c"), lit(0L)).as("c"))
    val stats = series.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("cc"))
    val centered = series.join(stats, "event_type")
      .withColumn("e", expr("CAST(n AS DECIMAL(38,0)) * c - s"))
    val lags = centered.as("a")
      .withColumn("k", explode(expr("array(1L, 2L, 3L, 6L, 12L, 24L)")))
      .join(centered.select(col("event_type"),
        col("t").as("t2"), col("e").as("e2")).as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("t2") === col("t") + col("k"))
      .groupBy(col("a.event_type").as("event_type"), col("k"))
      .agg(sum(expr("e * e2")).as("num"), max(col("n")).as("n"),
        max(col("s")).as("s"), max(col("cc")).as("cc"))
      .withColumn("den", expr(
        "CAST(n AS DECIMAL(38,0)) * cc - CAST(s AS DECIMAL(38,0)) * s"))
      .withColumn("acf_ppm", expr(
        // Σ_t e_t² over the FULL series = n·den (e carries a factor n)
        "CASE WHEN den = 0 THEN 0L ELSE CAST(" +
          "CASE WHEN num < 0 THEN -1 ELSE 1 END" +
          " * (abs(num) * 1000000 div (CAST(n AS DECIMAL(38,0)) * den))" +
          " AS BIGINT) END"))
    lags.select(col("event_type"), col("k").as("lag"), col("n"),
        col("acf_ppm"))
      .orderBy(col("event_type"), col("lag"))
  }

  private val qAutocorrelationSql =
    """WITH cnt AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi
      |  FROM cnt GROUP BY 1),
      |series AS (
      |  SELECT b.event_type, CAST(u.hr - b.lo AS BIGINT) AS t,
      |    COALESCE(c.c, 0) AS c
      |  FROM bounds b
      |  CROSS JOIN unnest(generate_series(b.lo, b.hi)) AS u(hr)
      |  LEFT JOIN cnt c ON c.event_type = b.event_type AND c.hr = u.hr),
      |stats AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS s,
      |    SUM(CAST(c AS HUGEINT) * c) AS cc
      |  FROM series GROUP BY 1),
      |centered AS (
      |  SELECT series.event_type, t,
      |    CAST(n AS HUGEINT) * c - s AS e, n, s, cc
      |  FROM series JOIN stats USING (event_type)),
      |lagged AS (
      |  SELECT a.event_type, CAST(u.k AS BIGINT) AS lag,
      |    CAST(MAX(a.n) AS BIGINT) AS n,
      |    SUM(a.e * b.e) AS num,
      |    MAX(CAST(a.n AS HUGEINT) * a.cc
      |      - CAST(a.s AS HUGEINT) * a.s) AS den
      |  FROM centered a
      |  CROSS JOIN unnest([1, 2, 3, 6, 12, 24]) AS u(k)
      |  JOIN centered b ON b.event_type = a.event_type
      |    AND b.t = a.t + u.k
      |  GROUP BY 1, 2)
      |SELECT event_type, lag, n,
      |  CAST(CASE WHEN den = 0 THEN 0 ELSE
      |    CASE WHEN num < 0 THEN -1 ELSE 1 END
      |    * (abs(num) * 1000000 // (CAST(n AS HUGEINT) * den))
      |    END AS BIGINT) AS acf_ppm
      |FROM lagged ORDER BY event_type, lag""".stripMargin

  // ------------------------------------------------------------- q216

  /** q216: T-CLOSENESS AUDIT — the distributional upgrade of q146's
    * k-anonymity/l-diversity: per quasi-identifier group (market
    * segment × nation) the earth-mover distance between the group's
    * order-priority distribution and the global one. Priorities are
    * ordinal with unit spacing, so 1-D EMD = Σ_k |cumP_k − cumQ_k| in
    * exact ppm; the audit flags groups with EMD > 0.2 (the classic
    * t = 0.2 bar) — groups whose sensitive-attribute shape leaks.
    *
    * Scale shape: one fact groupBy(group, priority); cumulative
    * algebra runs on the ≤(groups × 5) table against a 5-row global
    * broadcast. */
  private def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    val ords = load(s, dir, "orders")
      .join(load(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"),
          col("c_nationkey")), "o_custkey")
      .select(col("c_mktsegment"), col("c_nationkey"),
        col("o_orderpriority"))
    val cells = ords.groupBy(col("c_mktsegment"), col("c_nationkey"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_grp", sum(col("c")).over(Window.partitionBy(
        col("c_mktsegment"), col("c_nationkey"))))
    val global = ords.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("gc"))
      .withColumn("n_all", sum(col("gc")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    // complete each group against the 5-priority alphabet so absent
    // priorities contribute their full global mass to the EMD
    val spine = cells.select(col("c_mktsegment"), col("c_nationkey"),
        col("n_grp")).distinct()
      .crossJoin(broadcast(global))
    val wCum = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
      .orderBy(col("o_orderpriority"))
    spine.join(cells, Seq("c_mktsegment", "c_nationkey",
        "o_orderpriority", "n_grp"), "left")
      .withColumn("p_ppm", expr(
        "coalesce(c, 0L) * 1000000 div n_grp"))
      .withColumn("q_ppm", expr("gc * 1000000 div n_all"))
      .withColumn("cum_gap",
        abs(sum(col("p_ppm") - col("q_ppm")).over(wCum)))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(max(col("n_grp")).as("n_orders"),
        sum(col("cum_gap")).as("emd_ppm"))
      .withColumn("t_ok", (col("emd_ppm") <= 200000L).cast("int"))
      .select(col("c_mktsegment"), col("c_nationkey"), col("n_orders"),
        col("emd_ppm"), col("t_ok"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"))
  }

  private val qTClosenessSql =
    """WITH ords AS (
      |  SELECT c_mktsegment, c_nationkey, o_orderpriority
      |  FROM orders JOIN customer ON c_custkey = o_custkey),
      |cells AS (
      |  SELECT c_mktsegment, c_nationkey, o_orderpriority,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM ords GROUP BY 1, 2, 3),
      |grp AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(SUM(c) AS BIGINT) AS n_grp
      |  FROM cells GROUP BY 1, 2),
      |global AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS gc,
      |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_all
      |  FROM ords GROUP BY 1),
      |full_cells AS (
      |  SELECT g.c_mktsegment, g.c_nationkey, g.n_grp,
      |    gl.o_orderpriority,
      |    COALESCE(c.c, 0) * 1000000 // g.n_grp AS p_ppm,
      |    gl.gc * 1000000 // gl.n_all AS q_ppm
      |  FROM grp g CROSS JOIN global gl
      |  LEFT JOIN cells c ON c.c_mktsegment = g.c_mktsegment
      |    AND c.c_nationkey = g.c_nationkey
      |    AND c.o_orderpriority = gl.o_orderpriority),
      |cum AS (
      |  SELECT c_mktsegment, c_nationkey, n_grp,
      |    abs(SUM(p_ppm - q_ppm) OVER (
      |      PARTITION BY c_mktsegment, c_nationkey
      |      ORDER BY o_orderpriority)) AS cum_gap
      |  FROM full_cells)
      |SELECT c_mktsegment, c_nationkey,
      |  CAST(MAX(n_grp) AS BIGINT) AS n_orders,
      |  CAST(SUM(cum_gap) AS BIGINT) AS emd_ppm,
      |  CAST(CASE WHEN SUM(cum_gap) <= 200000 THEN 1 ELSE 0 END AS INT)
      |    AS t_ok
      |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q217

  /** q217: SINGLE-SOURCE BFS DISTANCES on the strong co-purchase
    * graph (q206's sparsified edges), from the smallest part key in
    * the graph, depth-capped at 8 — the iterative frontier pattern
    * every graph traversal at scale reduces to: each round is ONE
    * frontier⋈edges equi-join plus a min-distance dedup, lineage cut
    * per round (the q137/q52 checkpoint device). Reports the distance
    * histogram plus the unreachable count — connectivity shape at a
    * glance.
    *
    * The oracle is a recursive CTE over the same edges — the one query
    * family where DuckDB natively expresses iteration, which makes the
    * loop itself gateable, not just one unrolling. */
  private def qBfsDistances(s: SparkSession, dir: String): DataFrame = {
    // battery-shared pinned edge device (q206/q217/q243 — one build per
    // session+dir); the symmetric closure is re-pinned here because the
    // loop consumes it once per round
    val edges = Graphs.strongEdges(s, dir)
    val sym = graft.util.Pin(Graphs.symmetricEdges(edges))
    val nodes = graft.util.Pin(sym.select(col("a").as("node")).distinct())
    val src = nodes.agg(min(col("node")).as("node"))
    var dist = graft.util.Pin(src.withColumn("d", lit(0L)))
    var frontier = dist
    var round = 0
    var grew = true
    while (grew && round < 8) {
      round += 1
      val next = frontier.join(sym, col("node") === col("a"))
        .select(col("b").as("node"), lit(round.toLong).as("d"))
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .distinct()
      val pinned = graft.util.Pin(next)
      grew = pinned.limit(1).count() > 0
      if (grew) {
        dist = graft.util.Pin(dist.unionByName(pinned))
        frontier = pinned
      }
    }
    val reach = dist.groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
    val unreachable = nodes
      .join(dist.select(col("node")), Seq("node"), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_nodes"))
      .select(lit(-1L).as("d"), col("n_nodes"))
    reach.unionByName(unreachable).filter(col("n_nodes") > 0)
      .orderBy(col("d"))
  }

  private val qBfsDistancesSql =
    """WITH RECURSIVE op AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |pk AS (
      |  SELECT x.p * 4294967296 + y.p AS k
      |  FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
      |ek AS (SELECT k FROM pk GROUP BY k HAVING COUNT(*) >= 2),
      |edges AS MATERIALIZED (
      |  SELECT k // 4294967296 AS a, k % 4294967296 AS b FROM ek),
      |sym AS MATERIALIZED (
      |  SELECT a, b FROM edges
      |  UNION ALL SELECT b AS a, a AS b FROM edges),
      |src AS (SELECT MIN(a) AS node FROM sym),
      |walk(node, d) AS (
      |  SELECT node, CAST(0 AS BIGINT) FROM src
      |  UNION
      |  SELECT sym.b, walk.d + 1
      |  FROM walk JOIN sym ON sym.a = walk.node
      |  WHERE walk.d < 8),
      |dist AS (SELECT node, MIN(d) AS d FROM walk GROUP BY 1),
      |reach AS (
      |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_nodes
      |  FROM dist GROUP BY 1),
      |unreach AS (
      |  SELECT CAST(-1 AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT)
      |    AS n_nodes
      |  FROM (SELECT DISTINCT a AS node FROM sym) n
      |  WHERE NOT EXISTS (SELECT 1 FROM dist WHERE dist.node = n.node))
      |SELECT d, n_nodes FROM reach WHERE n_nodes > 0
      |UNION ALL
      |SELECT d, n_nodes FROM unreach WHERE n_nodes > 0
      |ORDER BY d""".stripMargin

  // ------------------------------------------------------------- q218

  /** q218: TOP-K LEADERBOARD CHURN between serving windows — how
    * stable is "the top-20 parts by order volume" from the first
    * half-month to the second: set overlap (Jaccard), newcomers/
    * dropouts, and Spearman's footrule Σ|rank_a − rank_b| over the
    * common items — the report that decides whether a cached
    * leaderboard needs a refresh SLA.
    *
    * Scale shape: two map-side-combinable groupBys (one per window
    * inside one pass), two 20-row TakeOrdereds; ranks come from a
    * window over the 20-row tables only. */
  private def qTopkChurn(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .join(load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        "l_orderkey")
      .select(col("l_partkey"),
        when(col("o_orderdate") < to_timestamp(lit("1998-04-01")), "w1")
          .otherwise("w2").as("w"))
    def top20(w: String) = {
      val t = li.filter(col("w") === w)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(20)
      t.withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("l_partkey"))))
        .select(col("l_partkey"), col("rank"))
    }
    val a = top20("w1").withColumnRenamed("rank", "rank_a")
    val b = top20("w2").withColumnRenamed("rank", "rank_b")
    a.join(b, Seq("l_partkey"), "full_outer")
      .agg(
        sum(when(col("rank_a").isNotNull && col("rank_b").isNotNull, 1L)
          .otherwise(0L)).as("n_common"),
        sum(when(col("rank_a").isNull, 1L).otherwise(0L)).as("newcomers"),
        sum(when(col("rank_b").isNull, 1L).otherwise(0L)).as("dropouts"),
        coalesce(sum(when(
          col("rank_a").isNotNull && col("rank_b").isNotNull,
          abs(col("rank_a") - col("rank_b")))), lit(0L)).as("footrule"))
      .withColumn("jaccard_ppm", expr(
        "n_common * 1000000 div (40 - n_common)"))
      .select(col("n_common"), col("newcomers"), col("dropouts"),
        col("footrule"), col("jaccard_ppm"))
  }

  private val qTopkChurnSql =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-04-01' THEN 'w1'
      |      ELSE 'w2' END AS w
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
      |ta AS (
      |  SELECT l_partkey, row_number() OVER (ORDER BY cnt DESC,
      |    l_partkey) AS rank_a
      |  FROM (SELECT l_partkey, COUNT(*) AS cnt FROM li WHERE w = 'w1'
      |        GROUP BY 1 ORDER BY cnt DESC, l_partkey LIMIT 20) t),
      |tb AS (
      |  SELECT l_partkey, row_number() OVER (ORDER BY cnt DESC,
      |    l_partkey) AS rank_b
      |  FROM (SELECT l_partkey, COUNT(*) AS cnt FROM li WHERE w = 'w2'
      |        GROUP BY 1 ORDER BY cnt DESC, l_partkey LIMIT 20) t),
      |j AS (SELECT * FROM ta FULL OUTER JOIN tb USING (l_partkey))
      |SELECT
      |  CAST(SUM(CASE WHEN rank_a IS NOT NULL AND rank_b IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |  CAST(SUM(CASE WHEN rank_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS newcomers,
      |  CAST(SUM(CASE WHEN rank_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS dropouts,
      |  CAST(COALESCE(SUM(CASE WHEN rank_a IS NOT NULL
      |    AND rank_b IS NOT NULL THEN abs(rank_a - rank_b) END), 0)
      |    AS BIGINT) AS footrule,
      |  CAST(SUM(CASE WHEN rank_a IS NOT NULL AND rank_b IS NOT NULL
      |      THEN 1 ELSE 0 END) * 1000000
      |    // (40 - SUM(CASE WHEN rank_a IS NOT NULL AND rank_b IS NOT
      |      NULL THEN 1 ELSE 0 END)) AS BIGINT) AS jaccard_ppm
      |FROM j""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q215_autocorrelation" -> QueryDef(qAutocorrelation,
      Some(qAutocorrelationSql),
      "integer-exact hourly-series autocorrelation at 6 lags per event type, zero-filled spine"),
    "q216_t_closeness" -> QueryDef(qTCloseness, Some(qTClosenessSql),
      "t-closeness audit: 1-D EMD between group and global ordinal distributions, alphabet-completed"),
    "q217_bfs_distances" -> QueryDef(qBfsDistances,
      Some(qBfsDistancesSql),
      "single-source BFS distance histogram on the strong co-purchase graph, depth-capped frontier loop vs recursive-CTE oracle"),
    "q218_topk_churn" -> QueryDef(qTopkChurn, Some(qTopkChurnSql),
      "top-20 leaderboard churn between windows: Jaccard, newcomers/dropouts, Spearman footrule"))
}
