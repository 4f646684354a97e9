package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.load

/** Graph-authority and privacy-release operators over the star schema.
  *
  * q137: PageRank over the customer–supplier interaction graph — the
  * link-authority quality signal large-scale curation pipelines compute
  * over their crawl/host graph (cf. Common Crawl host-level ranks used
  * as a quality prior). The graph here is the bipartite
  * customer→supplier edge set induced by orders (edge weight = number
  * of lineitems), made symmetric so every node has out-degree and the
  * chain is irreducible without a dangling-mass term.
  *
  * q138: differentially-private histogram release via the TRUNCATED
  * GEOMETRIC mechanism (Ghosh–Roughgarden–Sundararajan's discrete
  * counterpart of Laplace, truncated at ±[[Graphs.DpTrunc]]) — the
  * privacy-preserving aggregate-release step a data platform runs
  * before exporting usage statistics.
  */
object Graphs {

  // ------------------------------------- shared co-purchase edge device

  /** Cache of pinned strong-edge tables keyed by (session, directory,
    * support floor): q206 (link prediction), q217 (BFS), and q243
    * (k-core) all consume the SAME sparsified co-purchase graph, and
    * its construction — the order-key pair self-join + support-floor
    * aggregate — is the battery's widest repeated shuffle (110 s of
    * q243's sf10 time was spent rebuilding what q206 had already
    * built). The pinned result is thousands of rows at any SF (the
    * support floor is what makes the graph usable at all), so holding
    * it for the session costs KBs while saving the third and fourth
    * rebuild of a ~10⁸-row pair stream. Keyed reuse also avoids the
    * round-7 persist leak: repeated invocations share ONE pinned
    * table instead of accumulating new ones.
    *
    * ASSUMPTION: the keyed directory is immutable for the lifetime of
    * the session (true for the driver's read-only sf dirs). A spec
    * that rewrites parquet under a reused tmp dir must call
    * [[invalidateStrongEdges]] first, or it will read the stale pin.
    * Entries also retain localCheckpoint blocks and the SparkSession
    * reference until invalidated or the JVM exits. */
  private val strongEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long),
      DataFrame]()

  /** Test/lifecycle hook: drop every cached strong-edge pin (all
    * sessions, all dirs) and unpersist their blocks. Use when a spec
    * rewrites data under a directory it already queried, or to release
    * checkpoint storage in a long-lived session. */
  def invalidateStrongEdges(): Unit = {
    val it = strongEdgeCache.values().iterator()
    while (it.hasNext) {
      try graft.util.Pin.release(it.next())
      catch { case _: Throwable => () } // session may already be closed
    }
    strongEdgeCache.clear()
  }

  /** Strong co-purchase edges (a < b): part pairs co-ordered in
    * ≥ `minSupport` distinct orders. Pair generation is an order-key
    * self-join (fan-out ≤ order width², never corpus²); the support
    * floor (q164's measured-stable 2) sparsifies BEFORE anything
    * quadratic downstream. Pinned once per (session, dir, support)
    * and shared across the graph battery. */
  def strongEdges(s: SparkSession, dir: String,
      minSupport: Long = 2L): DataFrame =
    strongEdgeCache.computeIfAbsent((s, dir, minSupport), _ => {
      val op = load(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      graft.util.Pin(op.as("x").join(op.as("y"), Seq("o"))
        .filter(col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("a"), col("y.p").as("b"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= minSupport)
        .select(col("a"), col("b")))
    })

  /** Symmetric closure of a directed (a < b) edge table. */
  def symmetricEdges(edges: DataFrame): DataFrame =
    edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))

  // ------------------------------------------------------------- q137

  /** PageRank with INTEGER-EXACT arithmetic so the fixpoint is
    * hash-gateable across engines: float PageRank is unusable in a
    * cross-engine gate (a shuffled double sum has no summation order),
    * so ranks live on a 10^-12 grid as BIGINTs. Per-edge contribution
    * `((pr·85) div 100)·w div wtot` routes through DECIMAL(38,0)/
    * HUGEINT so the product cannot overflow at any corpus size, and
    * integer floor-division is deterministic everywhere — the same
    * device as q69's gridded k-means and q110's ppm lift.
    *
    * Scale shape per iteration: one equi-join of the rank table with
    * the edge table on src (both shuffle on the node key — the edge
    * table's partitioning is reused every round) and one map-side-
    * partial sum by dst. Nothing is broadcast: ranks and edges both
    * grow with the graph. The edge table (with out-weights) is
    * materialized once via localCheckpoint — it feeds all
    * [[PrIters]] rounds, and recomputing the lineitem⋈orders group-by
    * per round would triple the scan work (the q67 shared-frontier
    * lesson).
    */
  private val PrScale = 1000000000000L // 10^12 rank grid
  private val PrIters = 3

  private def edgesSql: String =
    s"""w AS (SELECT o.o_custkey AS c, l.l_suppkey AS s,
       |        CAST(COUNT(*) AS BIGINT) AS w
       |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |      GROUP BY 1, 2),
       |edges AS (
       |  SELECT c * 2 AS src, s * 2 + 1 AS dst, w FROM w
       |  UNION ALL
       |  SELECT s * 2 + 1 AS src, c * 2 AS dst, w FROM w),
       |deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wtot
       |        FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)""".stripMargin

  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    // Pin the weighted pair aggregate BEFORE fanning it out: it feeds
    // the union twice AND deg AND the deg join — without the pin the
    // lineitem⋈orders shuffle+aggregate subtree is evaluated 4× inside
    // the one job that materializes `edges` (union arms and join sides
    // are independent subtrees to Catalyst; no cross-branch CSE).
    val w = graft.util.Pin(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("w")))
    val edges0 = w.select((col("c") * 2).as("src"), (col("s") * 2 + 1).as("dst"), col("w"))
      .unionAll(w.select((col("s") * 2 + 1).as("src"), (col("c") * 2).as("dst"), col("w")))
    val deg = edges0.groupBy(col("src")).agg(sum(col("w")).as("wtot"))
    // one materialization feeds every iteration's join
    val edges = edges0.join(deg, "src").transform(graft.util.Pin.apply)
    graft.util.Pin.release(w) // superseded by the pinned edge table
    val nodes = edges.select(col("src").as("node")).distinct()
      .transform(graft.util.Pin.apply)
    val n = nodes.count()
    val base = (PrScale * 15 / 100) / n // deterministic: all integer
    var pr = nodes.withColumn("pr", lit(PrScale / n))
    for (_ <- 1 to PrIters) {
      val contribs = edges.join(pr, col("src") === col("node"))
        .select(col("dst"), expr(
          s"CAST(CAST(CAST(pr AS DECIMAL(38,0)) * 85 div 100 AS DECIMAL(38,0)) * w div wtot AS BIGINT)")
          .as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_mass"))
      pr = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (coalesce(col("in_mass"), lit(0L)) + lit(base)).as("pr"))
    }
    pr.select(col("node"),
        when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
          .as("kind"),
        col("pr"))
      .orderBy(col("pr").desc, col("node"))
      .limit(100)
  }

  private val qPageRankSql = {
    val iters = (1 to PrIters).map { t =>
      s"""c$t AS (SELECT e.dst,
         |  CAST(SUM((CAST(p.pr AS HUGEINT) * 85 // 100) * e.w // e.wtot)
         |    AS BIGINT) AS in_mass
         |  FROM ew e JOIN pr${t - 1} p ON e.src = p.node GROUP BY e.dst),
         |pr$t AS (SELECT nodes.node,
         |  COALESCE(c$t.in_mass, 0) + (($PrScale * 15 // 100) // nn.n) AS pr
         |  FROM nodes CROSS JOIN nn
         |  LEFT JOIN c$t ON c$t.dst = nodes.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesSql,
       |ew AS (SELECT e.src, e.dst, e.w, d.wtot
       |       FROM edges e JOIN deg d ON d.src = e.src),
       |pr0 AS (SELECT node, $PrScale // nn.n AS pr FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT node,
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  CAST(pr AS BIGINT) AS pr
       |FROM pr$PrIters ORDER BY pr DESC, node LIMIT 100""".stripMargin
  }

  // ------------------------------------------------------------- q138

  /** ε = ln 2 truncated geometric mechanism. The inverse CDF is
    * precomputed HERE, once, with exact BigInt rationals, and embedded
    * as 16-hex-digit literals in BOTH plans — so the per-group noise
    * draw is a lexicographic CASE chain over the md5-derived uniform
    * (lowercase-hex compare == numeric compare, the q68 device), with
    * zero cross-engine float arithmetic anywhere.
    *
    * With α = e^-ε = 1/2 the two-sided geometric has
    * P(Z ≤ -m) = α^m/(1+α) = 2^(1-m)/3 and
    * P(Z ≤ k)  = 1 − 2^-k/3 (k ≥ 0); both are exact rationals, so the
    * 2^64-grid thresholds below are floor-exact, not float-rounded.
    * Truncation at ±[[DpTrunc]] is part of the released mechanism
    * (the truncated-geometric variant), not an approximation knob.
    *
    * Scale shape: one hash aggregate over (event_type, day); the noise
    * is a map-side scalar on the group key. Nothing else moves. */
  private val DpTrunc = 16

  /** Thresholds T(k)·2^64 for k = -DpTrunc .. DpTrunc-1 as hex; the
    * draw is the smallest k with u16 < T(k), else +DpTrunc. */
  private def dpThresholds: Seq[(Int, String)] = {
    val two64 = BigInt(1) << 64
    def thr(k: Int): BigInt =
      if (k < 0) (BigInt(1) << (65 + k)) / 3 // 2^(1-m)/3 · 2^64, m = -k
      else two64 - (two64 >> k) / 3 - (if (((two64 >> k) % 3) != 0) BigInt(1) else BigInt(0))
    (-DpTrunc until DpTrunc).map(k => k -> f"${thr(k)}%016x")
  }

  private def qDpHistogram(s: SparkSession, dir: String): DataFrame = {
    val noise = dpThresholds.foldRight(lit(DpTrunc)) { case ((k, t), el) =>
      when(col("u16") < lit(t), lit(k)).otherwise(el)
    }
    load(s, dir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("u16",
        substring(md5(concat(lit("dp:"), col("event_type"), lit("|"), col("day"))), 1, 16))
      .withColumn("noisy_count",
        greatest(lit(0L), col("true_n") + noise.cast("long")))
      .select(col("event_type"), col("day"), col("noisy_count"))
      .orderBy(col("event_type"), col("day"))
  }

  private val qDpHistogramSql = {
    val cases = dpThresholds
      .map { case (k, t) => s"WHEN u16 < '$t' THEN $k" }
      .mkString("\n    ")
    s"""WITH g AS (
       |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       |    CAST(COUNT(*) AS BIGINT) AS true_n
       |  FROM events GROUP BY 1, 2),
       |u AS (SELECT event_type, day, true_n,
       |        substring(md5('dp:' || event_type || '|' || day), 1, 16) AS u16
       |      FROM g),
       |z AS (SELECT event_type, day, true_n, CAST(CASE
       |    $cases
       |    ELSE $DpTrunc END AS BIGINT) AS noise FROM u)
       |SELECT event_type, day,
       |  GREATEST(CAST(0 AS BIGINT), true_n + noise) AS noisy_count
       |FROM z ORDER BY event_type, day""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q137_pagerank" -> QueryDef(qPageRank, Some(qPageRankSql),
      "integer-exact PageRank over the customer-supplier graph " +
        "(link-authority quality prior)"),
    "q138_dp_histogram" -> QueryDef(qDpHistogram, Some(qDpHistogramSql),
      "DP histogram release: truncated geometric mechanism, " +
        "exact-rational inverse-CDF thresholds"))
}
