package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType, StructType}
import Tables.load

/** Sixth-wave battery: governance, retrieval and incremental-compute
  * operators a production 100-TB data platform runs next to the core
  * curation pipeline.
  *
  *  - q145: the built-in `dropDuplicatesWithinWatermark` surface (the
  *    third streaming-dedup formulation after q63's FSM and q72's LSH
  *    index), gated row-identical to batch distinct.
  *  - q146: k-anonymity / l-diversity audit — the privacy-governance
  *    check run before any user-grained release (companion to q138's
  *    DP mechanism: q138 releases safely, q146 measures why you must).
  *  - q147: local clustering coefficient on the LSH candidate graph
  *    (per-node closure of q122's global triangle count — separates
  *    template-clique dup clusters from drift chains per node).
  *  - q148: boolean inverted-index retrieval (AND/AND/NOT) via
  *    posting-list semi/anti joins — the exact-match retrieval twin of
  *    the ANN battery (q38/q39/q45).
  *  - q149: higher-order-function array analytics over the embedding
  *    column — transform/filter/aggregate/zip_with/reverse all inside
  *    whole-stage codegen, zero UDFs, integer-exact via the power-of-2
  *    grid (multiplying a float by 1024 is an exponent shift, so both
  *    engines floor the same exact value).
  *  - q150: CUSUM change-point detection on hourly event rates. The
  *    recursion S_t = max(0, S_{t-1} + x_t - k) is rewritten in closed
  *    form S_t = C_t - min(0, min_{j<=t} C_j) (C = running sum), so it
  *    is two window functions over one time-ordered shuffle instead of
  *    an unparallelizable sequential fold.
  *  - q151: incremental view maintenance for a join-aggregate view —
  *    the delta rule for distributive aggregates (merge partial
  *    DECIMAL sums of base and delta) gated bit-identical against the
  *    full recompute, which is what lets a 100-TB nightly view absorb
  *    a 0.1% delta without re-reading the 100 TB.
  */
object Advanced {
  /** Unique suffix source for in-memory sink names (q172): collision-free
    * unlike abs(hashCode), safe for concurrent runs in one session. */
  private[ops] val sinkNameCounter =
    new java.util.concurrent.atomic.AtomicLong(0)


  /** Shared document projection for the ranking queries (q155/q161):
    * token-type-ratio in exact ppm over the corpus-wide space-split
    * convention. ONE definition in each engine — the ranking key of
    * two gated queries must not be able to drift. */
  private val TtrPpmExpr =
    "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000" +
      " div size(split(text, ' '))"

  private def docsWithTtr(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents").select(col("doc_id"), col("lang"),
      col("n_chars"), expr(TtrPpmExpr).as("ttr_ppm"))

  /** DuckDB twin of [[docsWithTtr]] as a CTE body. */
  private val DocsTtrCte =
    """d AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |      * 1000000 // len(string_split(text, ' ')) AS ttr_ppm
      |  FROM documents)""".stripMargin

  // ------------------------------------------------------------- q145

  /** q145: STREAMING DEDUP via the built-in `dropDuplicatesWithinWatermark`
    * — Spark's engine-native bounded-state dedup (state for a key is
    * evicted once the watermark passes its event time + delay, so state
    * is O(keys-per-delay-window), never O(stream lifetime)). The gate
    * stages the event log as 16 time-ordered slices and injects an
    * EXACT duplicate copy of every 7th event one slice LATER than its
    * original (arrival skew across a micro-batch boundary), so the
    * dedup state must survive the batch boundary to drop it; the
    * watermark delay is derived from the data span (3 slice widths) so
    * the construction holds at every SF. Result == batch DISTINCT,
    * which (event ids being unique) is the event log itself. */
  private def qStreamDedupWm(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("us", LongType)
    graft.streaming.StreamConfs.withHdfsStateStore(s) {
      val result = graft.streaming.StreamScratch.withScratch("graft_ddw_") { tmp =>
        val ev = load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        // bounded collect: one min/max scalar pair for slice sizing
        val Array(mm) = ev.agg(min(col("us")), max(col("us"))).collect()
        val (lo, step) = (mm.getLong(0), (mm.getLong(1) - mm.getLong(0)) / 16 + 1)
        // originals sliced by event time; duplicates of every 7th event
        // staged one slice later (cap 15) — same bytes, later arrival
        val orig = ev
          .withColumn("slice", ((col("us") - lo) / step).cast(LongType))
        val dup = orig.filter(col("event_id") % 7 === 0)
          .withColumn("slice", least(col("slice") + 1, lit(15L)))
        val in = graft.streaming.SliceReplay.stage(tmp,
          orig.unionAll(dup)
            .select(to_json(struct(col("event_id"), col("user_id"),
              col("event_type"), col("us"))).as("value"), col("slice")), 16)
        // delay = 3 slice widths: a dup one slice late is always inside
        // the watermark, an original is never late (slices are ordered)
        val delaySec = (3L * step) / 1000000L + 1L
        // sink lands OUTSIDE scratch (GateOut): the deduped stream —
        // O(dataset) — must never transit the driver on return
        val out = graft.streaming.GateOut.dir()
        val q = s.readStream
          .option("maxFilesPerTrigger", 1)
          .text(in)
          .select(from_json(col("value"), schema).as("d"))
          .select(col("d.event_id").as("event_id"),
            col("d.user_id").as("user_id"),
            col("d.event_type").as("event_type"), col("d.us").as("us"))
          .withColumn("ts", expr("timestamp_micros(us)"))
          .withWatermark("ts", s"$delaySec seconds")
          .dropDuplicatesWithinWatermark("event_id")
          .drop("ts")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/chk")
          .format("parquet").option("path", out)
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      }
      result.orderBy(col("event_id"))
    }
  }

  private val qStreamDedupWmSql =
    """SELECT event_id, user_id, event_type,
      |  CAST(epoch_us(ts) AS BIGINT) AS us
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------- q146

  /** q146: K-ANONYMITY / L-DIVERSITY AUDIT. Quasi-identifier =
    * (mktsegment, nation, account-balance band); sensitive attribute =
    * the customer's order priorities. A QI group is k-anonymous when it
    * hides each member among >= 5 look-alikes, l-diverse when the
    * sensitive values seen in the group take >= 3 distinct values
    * (Sweeney 2002; Machanavajjhala et al. 2007). Balance bands are
    * exact integer cents (DECIMAL(18,2) -> cents, +10^7 offset so the
    * truncating integer division is floor for every real balance) —
    * zero float bucketing.
    *
    * Scale shape: one distinct on (custkey, priority) bounds the order
    * fan-out to <=5 rows per customer, one equi-join on custkey, one
    * hash aggregate on the QI key. Nothing broadcasts or collects. */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val qi = load(s, dir, "customer").select(
      col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
      expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) " +
        "+ 10000000) div 100000").as("bal_bucket"))
    val op = load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderpriority")).distinct()
    qi.join(op, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_bucket"))
      .agg(
        countDistinct(col("c_custkey")).as("n_members"),
        countDistinct(col("o_orderpriority")).as("l_distinct"))
      .withColumn("k_ok", (col("n_members") >= 5).cast("int"))
      .withColumn("l_ok", (col("l_distinct") >= 3).cast("int"))
      .orderBy(col("c_mktsegment"), col("c_nationkey"), col("bal_bucket"))
  }

  private val qKAnonymitySql =
    """WITH qi AS (
      |  SELECT c_custkey, c_mktsegment, c_nationkey,
      |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |     + 10000000) // 100000 AS bal_bucket
      |  FROM customer),
      |op AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
      |SELECT c_mktsegment, c_nationkey, bal_bucket,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_members,
      |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
      |  CAST(CASE WHEN COUNT(DISTINCT c_custkey) >= 5 THEN 1 ELSE 0 END
      |       AS INT) AS k_ok,
      |  CAST(CASE WHEN COUNT(DISTINCT o_orderpriority) >= 3 THEN 1 ELSE 0
      |       END AS INT) AS l_ok
      |FROM qi LEFT JOIN op ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------- q147

  /** q147: LOCAL CLUSTERING COEFFICIENT per node of the MinHash-LSH
    * candidate graph — lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) on a
    * ppm integer grid (floor division, hash-gateable). Triangles come
    * from q122's canonical a<b<c node-iterator (each triangle credits
    * its three corners once); degrees from one union-all + hash agg.
    * Every join is equi-keyed on a node or edge key; the graph is
    * LSH-sparse so the middle self-join is candidate-scoped, exactly
    * like q122. */
  private def qClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val e = Dedup.minhashCandidates(s, dir)
    val viaB = e.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .join(e.select(col("doc_a").as("b"), col("doc_b").as("c")), "b")
    val tri = viaB
      .join(e.select(col("doc_a").as("a"), col("doc_b").as("c")), Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    val deg = e.select(col("doc_a").as("node"))
      .unionAll(e.select(col("doc_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg.join(tri, Seq("node"), "left")
      .na.fill(0L, Seq("tri"))
      .withColumn("lcc_ppm",
        when(col("deg") >= 2,
          expr("(2 * tri * 1000000) div (deg * (deg - 1))"))
          .otherwise(0L))
      .select(col("node"), col("deg"), col("tri"), col("lcc_ppm"))
      .orderBy(col("node"))
  }

  private val qClusteringCoeffSql =
    s"""WITH ${Dedup.candidatesCte},
       |tri0 AS (
       |  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
       |  FROM cand e1
       |  JOIN cand e2 ON e2.doc_a = e1.doc_b
       |  JOIN cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       |tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
       |         SELECT a AS node FROM tri0
       |         UNION ALL SELECT b FROM tri0
       |         UNION ALL SELECT c FROM tri0) GROUP BY 1),
       |dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |         SELECT doc_a AS node FROM cand
       |         UNION ALL SELECT doc_b FROM cand) GROUP BY 1)
       |SELECT dg.node AS node, deg, COALESCE(tri, CAST(0 AS BIGINT)) AS tri,
       |  CAST(CASE WHEN deg >= 2 THEN
       |      (2 * COALESCE(tri, 0) * 1000000) // (deg * (deg - 1))
       |    ELSE 0 END AS BIGINT) AS lcc_ppm
       |FROM dg LEFT JOIN tn ON tn.node = dg.node
       |ORDER BY dg.node""".stripMargin

  // ------------------------------------------------------------- q148

  /** q148: BOOLEAN INVERTED-INDEX RETRIEVAL — `vector AND hash AND NOT
    * slow` evaluated as posting-list algebra: the conjunction is a
    * per-doc distinct-hit count over the two needle terms (one filtered
    * explode, no per-term join chain), the negation a left-anti join
    * against the excluded term's postings. The term filter lands
    * BEFORE the aggregate, so at 100 TB only rows for the 3 query
    * terms ever shuffle — cost tracks result size, not corpus size
    * (same device as q67's df-capped posting lists). */
  private def qBoolSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val post = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val hits = post.filter(col("term").isin("vector", "hash"))
      .groupBy(col("doc_id")).agg(countDistinct(col("term")).as("nhit"))
      .filter(col("nhit") === 2)
    hits.join(post.filter(col("term") === "slow"), Seq("doc_id"), "left_anti")
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  private val qBoolSearchSql =
    """WITH post AS (
      |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
      |  FROM documents)
      |SELECT d.doc_id, d.lang, d.source FROM documents d
      |WHERE d.doc_id IN (SELECT doc_id FROM post WHERE term = 'vector')
      |  AND d.doc_id IN (SELECT doc_id FROM post WHERE term = 'hash')
      |  AND d.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'slow')
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q149

  /** q149: HIGHER-ORDER-FUNCTION ARRAY ANALYTICS over the embedding
    * column — `transform` (quantize to the 2^10 grid: multiplying a
    * float by 1024 only shifts the exponent, so floor sees the exact
    * value in both engines), `aggregate` (component sum), array
    * min/max, `filter` (count of saturated components), and
    * `zip_with`+`reverse` (dot product with the reversed self — the
    * palindromic autocorrelation probe). All five lambdas stay inside
    * whole-stage codegen; the whole query is one narrow map over the
    * vector scan, embarrassingly parallel at any scale. */
  private def qHofArrayStats(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> floor(cast(x AS double) * 1024))")
          .as("q"))
      .select(col("vec_id"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("qsum"),
        expr("array_min(q)").as("qmin"),
        expr("array_max(q)").as("qmax"),
        expr("cast(size(filter(q, x -> x >= 512 OR x < -512)) AS bigint)")
          .as("n_large"),
        expr("aggregate(zip_with(q, reverse(q), (a, b) -> a * b), " +
          "0L, (acc, x) -> acc + x)").as("dot_rev"))
      .orderBy(col("vec_id"))

  private val qHofArrayStatsSql =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(list_sum(q) AS BIGINT) AS qsum,
      |  CAST(list_min(q) AS BIGINT) AS qmin,
      |  CAST(list_max(q) AS BIGINT) AS qmax,
      |  CAST(len(list_filter(q, x -> x >= 512 OR x < -512)) AS BIGINT)
      |    AS n_large,
      |  CAST(list_sum(list_transform(generate_series(1, len(q)),
      |    i -> q[i] * q[len(q) - i + 1])) AS BIGINT) AS dot_rev
      |FROM q ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------- q150

  /** q150: CUSUM CHANGE-POINT DETECTION on hourly event rates (Page
    * 1954). The textbook recursion S_t = max(0, S_{t-1} + (x_t - k))
    * is inherently sequential; it parallelizes via the prefix identity
    * S_t = C_t - min(0, min_{j<=t} C_j) with C the running sum of
    * (x_t - k) — so the whole detector is ONE shuffle on event_type
    * and two window functions over the same time-ordered frame.
    * Reference value k = the per-type integer-floor mean rate; alarm
    * threshold h = 3k. Pure BIGINT arithmetic end to end.
    *
    * Scale: the shuffle key is the series key — a 100-TB event log
    * with millions of series partitions perfectly; there is no global
    * window anywhere. */
  private def qCusum(s: SparkSession, dir: String): DataFrame = {
    val hourly = load(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val k = hourly.groupBy(col("event_type"))
      .agg(expr("sum(n) div count(1)").as("k"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    hourly.join(k, "event_type")
      .withColumn("c", sum(col("n") - col("k")).over(w))
      .withColumn("s",
        col("c") - least(lit(0L), min(col("c")).over(w)))
      .withColumn("alarm", (col("s") > col("k") * 3).cast("int"))
      .select(col("event_type"), col("hr"), col("n"), col("s"), col("alarm"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val qCusumSql =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |k AS (SELECT event_type,
      |        CAST(SUM(n) AS BIGINT) // COUNT(*) AS k FROM h GROUP BY 1),
      |c AS (SELECT h.event_type, hr, n, k.k,
      |        SUM(n - k.k) OVER (PARTITION BY h.event_type ORDER BY hr) AS c
      |      FROM h JOIN k ON k.event_type = h.event_type),
      |s AS (SELECT event_type, hr, n, k,
      |        c - LEAST(CAST(0 AS BIGINT),
      |              MIN(c) OVER (PARTITION BY event_type ORDER BY hr)) AS s
      |      FROM c)
      |SELECT event_type, hr, n, CAST(s AS BIGINT) AS s,
      |  CAST(CASE WHEN s > 3 * k THEN 1 ELSE 0 END AS INT) AS alarm
      |FROM s ORDER BY event_type, hr""".stripMargin

  // ------------------------------------------------------------- q151

  /** q151: INCREMENTAL VIEW MAINTENANCE of a join-aggregate view
    * (revenue + item count per customer over orders ⋈ lineitem). The
    * delta rule for distributive aggregates: V(base ∪ Δ) = merge of
    * the PARTIAL aggregates of base and Δ — partials stay exact
    * DECIMAL(18,6) sums until the single final cast, so the maintained
    * view is bit-identical to the full recompute (the oracle), not
    * approximately equal. Here "base" is 90% of lineitem and Δ the
    * `l_orderkey % 10 = 0` tranche; in production the base partial is
    * a materialized table and only Δ is scanned — the property this
    * gate proves is exactly what lets a 100-TB nightly view absorb a
    * small delta without re-reading the base. */
  private def qIvmJoinView(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    def partial(rows: DataFrame): DataFrame =
      rows.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 6))).as("rev"),
          count(lit(1)).as("n"))
    val base = partial(li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0))
    val delta = partial(li.filter(pmod(col("l_orderkey"), lit(10)) === 0))
    base.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).cast(DoubleType).as("revenue"),
        sum(col("n")).as("n_items"))
      .orderBy(col("o_custkey"))
  }

  private val qIvmJoinViewSql =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------- q152

  /** q152: STREAMING incremental maintenance of q151's join-aggregate
    * view — the delta stream (lineitem tranches replayed one file per
    * micro-batch) folds into a versioned per-customer partial state
    * via [[graft.streaming.VersionedMaintenance]]: each batch joins
    * only ITS OWN rows against the dimension and merges partial
    * DECIMAL sums into the previous state version. State and result
    * stay exact decimals until the single final cast, so the
    * continuously-maintained view is bit-identical to q151's full
    * recompute (they share one oracle). This is the "materialized view
    * that absorbs a trickle" operator: per-trigger work is
    * O(|batch| + |touched keys|), never O(view).
    *
    * Scale note: the per-batch join shuffles batch rows against the
    * orders dimension on the order key (no broadcast — orders grows
    * with SF); the state merge groups on the customer key. Both are
    * the keys the production table would already be bucketed by. */
  private def qStreamIvm(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    val spKey = "spark.sql.shuffle.partitions"
    val spSaved = s.conf.get(spKey)
    s.conf.set(spKey, "8")
    try {
      val result = graft.streaming.StreamScratch.withScratch("graft_sivm_") { tmp =>
        val li = load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val ord = load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val schema = new StructType()
          .add("l_orderkey", LongType)
          .add("l_extendedprice", org.apache.spark.sql.types.DoubleType)
          .add("l_discount", org.apache.spark.sql.types.DoubleType)
        val jsonRows = li.select(to_json(struct(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount"))).as("value"))
        // final state version lives in scratch — one distributed
        // re-write into GateOut, never a driver collect
        graft.streaming.GateOut.persist(
          graft.streaming.VersionedMaintenance.run(tmp, jsonRows, schema) {
            (prev, batch) =>
              val partial = batch
                .join(ord, col("l_orderkey") === col("o_orderkey"))
                .groupBy(col("o_custkey"))
                .agg(
                  sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                    .cast(DecimalType(18, 6))).cast(DecimalType(38, 6)).as("rev"),
                  count(lit(1)).as("n"))
              prev.fold(partial)(p => p.unionByName(partial)
                .groupBy(col("o_custkey"))
                .agg(sum(col("rev")).cast(DecimalType(38, 6)).as("rev"),
                  sum(col("n")).as("n")))
          })
      }
      result
        .select(col("o_custkey"), col("rev").cast(DoubleType).as("revenue"),
          col("n").as("n_items"))
        .orderBy(col("o_custkey"))
    } finally s.conf.set(spKey, spSaved)
  }

  // ------------------------------------------------------------- q153

  /** q153: LINEAR INTERPOLATION of gaps in an hourly value series —
    * q120 zero-fills counts; this fills VALUE gaps the way a feature
    * pipeline does, by interpolating between the nearest observed
    * neighbors. Integer-exact: hourly sums are micro-quantized
    * BIGINTs, hour positions are epoch-hour indices, and the
    * interpolated value pv + (nv-pv)*(h-ph) div (nh-ph) uses only
    * integer multiply/divide (both engines truncate toward zero).
    * The neighbor search is two IGNORE-NULLS window walks (last
    * observation backward, first observation forward) over one
    * series-key shuffle — no self-join, no spine×data blowup; rows
    * before the first / after the last observation are tagged 'edge'
    * and left null.
    *
    * The series under repair is a CONSTANT-SIZE deterministic sample
    * (the 2000 md5-smallest events — physically a TakeOrdered, i.e.
    * per-partition top-k then a driver merge of 2000-row heads, no
    * global sort): a fixed-rate subsample would stop having gaps as
    * soon as the corpus grows past one-event-per-hour, and the gate
    * would silently stop exercising the interpolation path (exactly
    * what happened at sf0.1 with a plain type filter). */
  private def qInterpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val sample = ev
      .withColumn("hk", md5(concat(lit("interp:"), col("event_id"))))
      .orderBy(col("hk")).limit(2000)
    val hourly = sample
      .filter(col("event_type").isin("view", "purchase")) // sparse series
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
        .as("v"))
    val spine = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    val types = hourly.select(col("event_type")).distinct()
    val grid = spine.crossJoin(broadcast(types))
      .join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("h", expr("unix_micros(hour) div 3600000000"))
      .withColumn("obs_h", when(col("v").isNotNull, col("h")))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("ph", last(col("obs_h"), ignoreNulls = true).over(wb))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("nh", first(col("obs_h"), ignoreNulls = true).over(wf))
      .withColumn("v_filled",
        when(col("v").isNotNull, col("v"))
          .when(col("ph").isNotNull && col("nh").isNotNull,
            expr("pv + ((nv - pv) * (h - ph)) div (nh - ph)")))
      .withColumn("src",
        when(col("v").isNotNull, lit("obs"))
          .when(col("v_filled").isNotNull, lit("interp"))
          .otherwise(lit("edge")))
      .select(col("event_type"), col("hour"), col("v_filled"), col("src"))
      .orderBy(col("event_type"), col("hour"))
  }

  private val qInterpolateSql =
    """WITH sample AS (
      |  SELECT * FROM events
      |  ORDER BY md5('interp:' || event_id) LIMIT 2000),
      |hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS v
      |  FROM sample WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1, 2),
      |bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
      |             date_trunc('hour', MAX(ts)) AS hi FROM events),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
      |            AS hour FROM bounds),
      |grid AS (
      |  SELECT t.event_type, s.hour, h.v,
      |    epoch_us(s.hour) // 3600000000 AS h,
      |    CASE WHEN h.v IS NOT NULL
      |      THEN epoch_us(s.hour) // 3600000000 END AS obs_h
      |  FROM spine s
      |  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
      |  LEFT JOIN hourly h ON h.event_type = t.event_type
      |    AND h.hour = s.hour),
      |n AS (
      |  SELECT event_type, hour, v, h,
      |    LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
      |    LAST_VALUE(obs_h IGNORE NULLS) OVER wb AS ph,
      |    FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
      |    FIRST_VALUE(obs_h IGNORE NULLS) OVER wf AS nh
      |  FROM grid
      |  WINDOW wb AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wf AS (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, hour,
      |  CAST(CASE WHEN v IS NOT NULL THEN v
      |    WHEN ph IS NOT NULL AND nh IS NOT NULL
      |      THEN pv + ((nv - pv) * (h - ph)) // (nh - ph)
      |    END AS BIGINT) AS v_filled,
      |  CASE WHEN v IS NOT NULL THEN 'obs'
      |    WHEN ph IS NOT NULL AND nh IS NOT NULL THEN 'interp'
      |    ELSE 'edge' END AS src
      |FROM n ORDER BY event_type, hour""".stripMargin

  // ------------------------------------------------------------- q154

  /** q154: WINSORIZED ROBUST MEAN per series — the outlier treatment a
    * metrics pipeline applies before averaging: clamp each value to
    * the [p5, p95] band and average the clamped series. Fully integer:
    * values are micro-quantized, the percentile is NEAREST-RANK
    * (cutoff = value at rank ceil(p·n) — no interpolation, no
    * doubles), and the means are floor divisions.
    *
    * Scale shape (round-7 rewrite): the former per-type
    * `row_number()` window sorted each type's FULL row set in one
    * task (5-value alphabet ⇒ one task owns 20M rows at 100×;
    * measured exponent 1.13). The value-at-rank map is tie-break
    * independent, so the query now runs on the VALUE HISTOGRAM:
    * one map-side-combinable groupBy(type, v) — the only big-data op
    * — then running counts, cutoffs, and BOTH means (Σ cnt·clamp(v))
    * entirely on the histogram, whose size is the distinct
    * micro-value set (saturates far below row count; truly
    * continuous domains would first quantize or t-digest, same
    * shape). Measured 4.9 s → sub-second at the 100× directory. */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    val hist = load(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"))
      .groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("lo_rank", expr("(n * 5 + 99) div 100"))
      .withColumn("hi_rank", expr("(n * 95 + 99) div 100"))
    val cuts = cum.groupBy(col("event_type"))
      .agg(min(when(col("cum") >= col("lo_rank"), col("v"))).as("lo_v"),
        min(when(col("cum") >= col("hi_rank"), col("v"))).as("hi_v"))
    hist.join(cuts, "event_type")
      .withColumn("cv", least(greatest(col("v"), col("lo_v")), col("hi_v")))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
        max(col("lo_v")).as("lo_v"), max(col("hi_v")).as("hi_v"),
        expr("sum(v * cnt) div sum(cnt)").as("raw_mean_micro"),
        expr("sum(cv * cnt) div sum(cnt)").as("robust_mean_micro"))
      .orderBy(col("event_type"))
  }

  private val qWinsorizeSql =
    """WITH v AS (
      |  SELECT event_type, event_id,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
      |  FROM events),
      |r AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM v),
      |cuts AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) AS lo_v,
      |    MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) AS hi_v
      |  FROM r GROUP BY 1)
      |SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  MAX(lo_v) AS lo_v, MAX(hi_v) AS hi_v,
      |  CAST(SUM(v) AS BIGINT) // COUNT(*) AS raw_mean_micro,
      |  CAST(SUM(LEAST(GREATEST(v, lo_v), hi_v)) AS BIGINT) // COUNT(*)
      |    AS robust_mean_micro
      |FROM v JOIN cuts ON cuts.event_type = v.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q155

  /** q155: RECIPROCAL-RANK FUSION — the hybrid-retrieval merge step
    * (Cormack et al. 2009): two independent per-language document
    * rankings (by length, and by lexical diversity = distinct-token
    * ppm — stand-ins for the dense and lexical retrieval legs) fuse as
    * score = Σ 10^9 div (60 + rank_i), all integer, and the fused
    * top-10 per language is emitted. Each ranking is one window over
    * the same language-key shuffle; the fusion is a projection, the
    * cut one more rank window — no join between the rankings because
    * both are computed in place on the same row.
    *
    * Scale: everything partitions on the group key; with per-query
    * candidate lists (the production case) the key is query_id and
    * the lists are top-k-bounded before fusion. */
  private def qRankFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = docsWithTtr(s, dir)
    val byLen = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val byTtr = Window.partitionBy(col("lang"))
      .orderBy(col("ttr_ppm").desc, col("doc_id"))
    val fused = docs
      .withColumn("r_len", row_number().over(byLen))
      .withColumn("r_ttr", row_number().over(byTtr))
      .withColumn("rrf_ppb",
        expr("1000000000 div (60 + r_len) + 1000000000 div (60 + r_ttr)"))
    val byScore = Window.partitionBy(col("lang"))
      .orderBy(col("rrf_ppb").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("doc_id"),
        col("r_len"), col("r_ttr"), col("rrf_ppb"))
      .orderBy(col("lang"), col("rank"))
  }

  private val qRankFusionSql =
    s"""WITH $DocsTtrCte,
      |r AS (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id) AS r_len,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY ttr_ppm DESC, doc_id) AS r_ttr
      |  FROM d),
      |f AS (
      |  SELECT lang, doc_id, r_len, r_ttr,
      |    1000000000 // (60 + r_len) + 1000000000 // (60 + r_ttr)
      |      AS rrf_ppb
      |  FROM r)
      |SELECT lang, rank, doc_id, CAST(r_len AS BIGINT) AS r_len,
      |  CAST(r_ttr AS BIGINT) AS r_ttr, CAST(rrf_ppb AS BIGINT) AS rrf_ppb
      |FROM (SELECT *, row_number() OVER (PARTITION BY lang
      |        ORDER BY rrf_ppb DESC, doc_id) AS rank FROM f) t
      |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin

  // ------------------------------------------------------------- q156

  /** q156: MARKOV NEXT-EVENT PREDICTION + in-sample accuracy — the
    * simplest behavioral model a product-analytics stack ships: the
    * global first-order transition matrix (q84's per-user `lead`
    * pairs), an argmax predictor per current state (tie → smallest
    * next type, so the model is deterministic), and its in-sample
    * hit-rate per state in integer ppm. The argmax is one rank window
    * over the (states × states)-bounded transition table; scoring is
    * an equi-join of the transition pairs against the size-|states|
    * predictor table. */
  private def qMarkovAccuracy(s: SparkSession, dir: String): DataFrame = {
    val pairs = load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("cur"), col("next_type").as("nxt"))
    val trans = pairs.groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("cnt"))
    val pred = trans
      .withColumn("rk", row_number().over(Window.partitionBy(col("cur"))
        .orderBy(col("cnt").desc, col("nxt"))))
      .filter(col("rk") === 1)
      .select(col("cur"), col("nxt").as("predicted"))
    pairs.join(pred, "cur")
      .groupBy(col("cur"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("nxt") === col("predicted"), 1L).otherwise(0L))
          .as("hits"),
        max(col("predicted")).as("predicted"))
      .withColumn("acc_ppm", expr("hits * 1000000 div n"))
      .select(col("cur"), col("predicted"), col("n"), col("hits"),
        col("acc_ppm"))
      .orderBy(col("cur"))
  }

  private val qMarkovAccuracySql =
    """WITH p AS (
      |  SELECT event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |pairs AS (SELECT cur, nxt FROM p WHERE nxt IS NOT NULL),
      |trans AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
      |          FROM pairs GROUP BY 1, 2),
      |pred AS (
      |  SELECT cur, nxt AS predicted FROM (
      |    SELECT cur, nxt, row_number() OVER (PARTITION BY cur
      |      ORDER BY cnt DESC, nxt) AS rk FROM trans) t
      |  WHERE rk = 1)
      |SELECT pairs.cur AS cur, MAX(predicted) AS predicted,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT)
      |    AS hits,
      |  CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // COUNT(*) AS acc_ppm
      |FROM pairs JOIN pred ON pred.cur = pairs.cur
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q157

  /** q157: BENFORD'S-LAW SCREEN on money amounts — the classic
    * forensic-accounting / data-quality check: the first significant
    * digit of organic multiplicative quantities follows
    * P(d) = log10(1 + 1/d). Digits come from the STRING form of exact
    * integer cents (integer-to-decimal-string is identical in every
    * engine — no log10/pow float path, whose rounding at exact powers
    * of ten is not portable); expected ppm are compile-time literals
    * of floor(log10(1+1/d)·10^6). One narrow scan + one 9-group
    * aggregate; the deviation column makes the screen actionable. */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  private def qBenford(s: SparkSession, dir: String): DataFrame = {
    val expected = BenfordPpm.foldLeft(lit(0L)) { case (el, (d, p)) =>
      when(col("digit") === d.toString, lit(p)).otherwise(el)
    }
    load(s, dir, "lineitem")
      .select(expr("substring(CAST(CAST(CAST(l_extendedprice AS " +
        "DECIMAL(18,2)) * 100 AS BIGINT) AS STRING), 1, 1)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("obs_ppm", expr("n * 1000000 div total"))
      .withColumn("exp_ppm", expected)
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      .select(col("digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        col("dev_ppm"))
      .orderBy(col("digit"))
  }

  private val qBenfordSql = {
    val cases = BenfordPpm
      .map { case (d, p) => s"WHEN digit = '$d' THEN $p" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT substring(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       |    * 100 AS BIGINT) AS VARCHAR), 1, 1) AS digit
       |  FROM lineitem),
       |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
       |t AS (SELECT digit, n, SUM(n) OVER () AS total FROM g),
       |o AS (SELECT digit, n, CAST(n * 1000000 // total AS BIGINT)
       |        AS obs_ppm,
       |        CAST(CASE $cases ELSE 0 END AS BIGINT) AS exp_ppm
       |      FROM t)
       |SELECT digit, n, obs_ppm, exp_ppm,
       |  abs(obs_ppm - exp_ppm) AS dev_ppm
       |FROM o ORDER BY digit""".stripMargin
  }

  // ------------------------------------------------------------- q158

  /** q158: STREAM-STREAM **LEFT OUTER** interval join — the other half
    * of q130's inner join, and the harder streaming surface: an
    * unmatched view must be emitted WITH NULLS, which the engine can
    * only do once the watermark proves no matching purchase can still
    * arrive. The gate's device for completeness: a far-future SENTINEL
    * row is staged as the last slice and flows through the watermark
    * operator BEFORE being filtered out of the join inputs — it drags
    * the watermark past every real row's eviction time, so all pending
    * outer results flush and the stream equals the batch LEFT JOIN
    * (the oracle). Without the sentinel the trailing delay-window of
    * views would never emit — the classic production pitfall this gate
    * encodes.
    *
    * Scale shape = q130: state hash-partitioned on user_id, bounded by
    * watermark delay × per-key rate, evicted continuously. */
  private def qStreamOuterJoin(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    import s.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val schema = new StructType()
      .add("user_id", LongType).add("event_id", LongType)
      .add("event_type", StringType).add("us", LongType)
    graft.streaming.StreamConfs.withHdfsStateStore(s) {
      val result = graft.streaming.StreamScratch.withScratch("graft_soj_") { tmp =>
        val ev = load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .filter(col("event_type").isin("view", "purchase"))
        // bounded collect: one min/max scalar pair for slice sizing
        val Array(mm) = ev.agg(min(col("us")), max(col("us"))).collect()
        val (lo, step) = (mm.getLong(0), (mm.getLong(1) - mm.getLong(0)) / 8 + 1)
        // TWO sentinel slices far past hi + delay + join window. The
        // sentinels carry REAL event types on impossible (negative)
        // user ids: a typed-out marker row would be removed by the
        // event_type filter, which Catalyst pushes BELOW the watermark
        // operator (PushDownPredicates walks through EventTimeWatermark)
        // — measured: such a sentinel never advances the watermark.
        // Typed-in rows pass both side filters, advance both side
        // watermarks, equi-match nothing (negative ids, view -1 vs
        // purchase -2), and are dropped on read-back. Two slices
        // because a watermark computed from batch b's data only takes
        // effect in batch b+1: sentinel-1 advances it, the batch
        // processing sentinel-2 runs under it and flushes the last
        // pending outer rows.
        val sentinels = (0 until 2).map { j =>
          val sentinelUs = mm.getLong(1) + (24L + j) * 3600000000L
          s"""{"user_id":-1,"event_id":${-1 - j},""" +
            s""""event_type":"view","us":$sentinelUs}""" + "\n" +
            s"""{"user_id":-2,"event_id":${-3 - j},""" +
            s""""event_type":"purchase","us":$sentinelUs}"""
        }
        val in = graft.streaming.SliceReplay.stage(tmp,
          ev.withColumn("slice", ((col("us") - lo) / step).cast(LongType))
            .select(to_json(struct(col("user_id"), col("event_id"),
              col("event_type"), col("us"))).as("value"), col("slice")),
          8, sentinels)
        def side(t: String, pfx: String) = s.readStream
          .option("maxFilesPerTrigger", 1)
          .text(in)
          .select(from_json(col("value"), schema).as("d"))
          .select(col("d.user_id").as(s"${pfx}_user"),
            col("d.event_id").as(s"${pfx}_id"),
            col("d.event_type").as(s"${pfx}_t"),
            expr("timestamp_micros(d.us)").as(s"${pfx}_ts"))
          .withWatermark(s"${pfx}_ts", "2 hours")
          .filter(col(s"${pfx}_t") === t) // after the watermark operator
        // sink lands OUTSIDE scratch (GateOut): O(pairs) result, lazy return
        val out = graft.streaming.GateOut.dir()
        val q = side("view", "v")
          .join(side("purchase", "p"),
            expr("""v_user = p_user AND p_ts >= v_ts
                   |AND p_ts <= v_ts + interval 1 hour""".stripMargin),
            "leftOuter")
          .select(col("v_user").as("user_id"), col("v_id").as("view_id"),
            col("p_id").as("purchase_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/chk")
          .format("parquet").option("path", out)
          .start()
        q.awaitTermination()
        s.read.parquet(out)
      }
      // NULLS FIRST made explicit on both sides: Spark's asc default is
      // nulls-first, DuckDB's is nulls-last — an implicit sort order
      // would shuffle the unmatched rows to different positions
      result
        .filter(col("user_id") >= 0) // drop any flushed sentinel rows
        .orderBy(col("user_id"), col("view_id"),
          col("purchase_id").asc_nulls_first)
    }
  }

  private val qStreamOuterJoinSql =
    """WITH v AS (SELECT user_id, event_id, ts FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, ts FROM events
      |      WHERE event_type = 'purchase')
      |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      |  CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
      |FROM v LEFT JOIN p ON v.user_id = p.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY v.user_id, view_id, purchase_id NULLS FIRST""".stripMargin

  // ------------------------------------------------------------- q159

  /** q159: ROLLING NEAREST-RANK MEDIAN over a trailing 24-hour frame —
    * the robust rolling baseline (median absolute level) a monitoring
    * stack prefers over q120's moving mean when the series has spikes.
    * No engine ships a windowed exact quantile, so the frame's values
    * ride a windowed collect/sort/index: exact nearest-rank lower
    * median at position (n+1) div 2 of the sorted frame, all BIGINT.
    * The frame is ROWS-bounded (24 rows of an hourly series), so the
    * per-row list is constant-size — the collect is O(frame), not
    * O(partition), and the whole query is one series-key shuffle. */
  private def qRollingMedian(s: SparkSession, dir: String): DataFrame = {
    val hourly = load(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-23, Window.currentRow)
    hourly
      .withColumn("win", collect_list(col("n")).over(frame))
      .withColumn("med", expr(
        "element_at(sort_array(win), CAST((size(win) + 1) div 2 AS INT))"))
      .withColumn("dev", col("n") - col("med"))
      .select(col("event_type"), col("hr"), col("n"), col("med"), col("dev"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val qRollingMedianSql =
    """WITH h AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, hr, n,
      |    list_sort(list(n) OVER f) AS win
      |  FROM h
      |  WINDOW f AS (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT event_type, hr, n,
      |  win[CAST((len(win) + 1) // 2 AS INT)] AS med,
      |  n - win[CAST((len(win) + 1) // 2 AS INT)] AS dev
      |FROM w ORDER BY event_type, hr""".stripMargin

  // ------------------------------------------------------------- q160

  /** q160: CHI-SQUARE CONTINGENCY AUDIT (event_type × day-of-week) —
    * the association screen behind "is usage shape independent of
    * weekday?". Exact arithmetic end to end: with cell count c, row
    * total r, column total k, grand total N, each cell contributes
    * (c·N − r·k)²·10^6 / (r·k·N) — numerator up to ~10^32, so the
    * product runs in DECIMAL(38,0) (HUGEINT in the oracle) and the
    * single floor division lands back in BIGINT micro units. One
    * narrow scan, one cells aggregate, two bounded marginal joins
    * (row/column tables are alphabet-sized). */
  private def qChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = load(s, dir, "events")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("c"))
    val rowT = cells.groupBy(col("event_type")).agg(sum(col("c")).as("r"))
    val colT = cells.groupBy(col("dow")).agg(sum(col("c")).as("k"))
    val tot = cells.agg(sum(col("c")).as("n"))
    cells.join(rowT, "event_type").join(colT, "dow").crossJoin(broadcast(tot))
      .withColumn("chi_micro", expr(
        """CAST((CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * k)
          |  * (CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * k)
          |  * 1000000 div (CAST(r AS DECIMAL(38,0)) * k * n)
          |  AS BIGINT)""".stripMargin))
      .select(col("event_type"), col("dow"), col("c"), col("r"), col("k"),
        col("chi_micro"))
      .orderBy(col("event_type"), col("dow"))
  }

  private val qChiSquareSql =
    """WITH cells AS (
      |  SELECT event_type, dayofweek(ts) + 1 AS dow,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS r
      |       FROM cells GROUP BY 1),
      |ct AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS k FROM cells GROUP BY 1),
      |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
      |SELECT cells.event_type, cells.dow, c, r, k,
      |  CAST((CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * k)
      |    * (CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * k)
      |    * 1000000 // (CAST(r AS HUGEINT) * k * n) AS BIGINT) AS chi_micro
      |FROM cells
      |JOIN rt ON rt.event_type = cells.event_type
      |JOIN ct ON ct.dow = cells.dow
      |CROSS JOIN t
      |ORDER BY cells.event_type, cells.dow""".stripMargin

  // ------------------------------------------------------------- q161

  /** q161: PARETO FRONTIER per language — multi-objective document
    * selection (maximize length AND lexical diversity): a doc is kept
    * iff no STRICTLY LONGER doc has ttr ≥ its own. Window form: the
    * per-distinct-length max-ttr table (bounded by the length alphabet,
    * not the corpus), a running max over lengths descending shifted by
    * one ROW (= strictly longer), and a join back on (lang, length) —
    * no point-vs-point dominance join anywhere, so the frontier costs
    * two bounded windows instead of O(n²). */
  private def qParetoFrontier(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithTtr(s, dir)
    val lens = d.groupBy(col("lang"), col("n_chars"))
      .agg(max(col("ttr_ppm")).as("mt"))
    val wl = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = lens.withColumn("best_longer", max(col("mt")).over(wl))
      .select(col("lang"), col("n_chars"), col("best_longer"))
    d.join(run, Seq("lang", "n_chars"))
      .filter(col("best_longer").isNull || col("ttr_ppm") > col("best_longer"))
      .select(col("lang"), col("doc_id"), col("n_chars"), col("ttr_ppm"))
      .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))
  }

  private val qParetoFrontierSql =
    s"""WITH $DocsTtrCte,
      |lens AS (SELECT lang, n_chars, MAX(ttr_ppm) AS mt
      |         FROM d GROUP BY 1, 2),
      |run AS (
      |  SELECT lang, n_chars,
      |    MAX(mt) OVER (PARTITION BY lang ORDER BY n_chars DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS best_longer
      |  FROM lens)
      |SELECT d.lang, doc_id, d.n_chars, ttr_ppm
      |FROM d JOIN run ON run.lang = d.lang AND run.n_chars = d.n_chars
      |WHERE best_longer IS NULL OR ttr_ppm > best_longer
      |ORDER BY d.lang, d.n_chars DESC, doc_id""".stripMargin

  // ------------------------------------------------------------- q162

  /** q162: INTEGER-EXACT Z-SCORES via the native [[graft.functions.IntegerSqrt]]
    * codegen expression — the missing piece that kept standard
    * deviations out of the hash-gateable integer style (q85/q112 use
    * exact DECIMAL moments but must end in an IEEE division; here even
    * the stddev is an integer). Per event type over daily counts:
    * mean_milli = Σx·1000 div D; var_milli² = (D·Σx² − (Σx)²)·10^6
    * div D² routed through DECIMAL(38) so the cross-term cannot
    * overflow; sd_milli = isqrt(var) — the oracle spells the same
    * corrected-floor-sqrt device in plain SQL, so both engines agree
    * bit-for-bit (IEEE sqrt is correctly rounded → ±1 → two
    * conditional fixes land exactly). One narrow scan, one daily
    * aggregate, one alphabet-bounded stats join. */
  private def qIntegerZscore(s: SparkSession, dir: String): DataFrame = {
    val daily = load(s, dir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("x"))
    // x·x and its sum ride DECIMAL(38) from the start: a BIGINT
    // accumulator would silently wrap in Spark (non-ANSI) while the
    // oracle throws — the silent-vs-crash divergence only 100-TB-scale
    // counts could reach, so it must be impossible by construction
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("x")).as("sx"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"))
      .withColumn("mean_milli", expr("sx * 1000 div d"))
      .withColumn("var_milli2", expr(
        """CAST((CAST(d AS DECIMAL(38,0)) * sxx
          |  - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000
          |  div (CAST(d AS DECIMAL(38,0)) * d) AS BIGINT)""".stripMargin))
      .withColumn("sd_milli",
        graft.functions.IntegerSqrt(col("var_milli2")))
      .select(col("event_type"), col("mean_milli"), col("sd_milli"))
    daily.join(stats, "event_type")
      .withColumn("z_milli", expr(
        "(x * 1000 - mean_milli) * 1000 div greatest(sd_milli, 1L)"))
      .select(col("event_type"), col("day"), col("x"), col("mean_milli"),
        col("sd_milli"), col("z_milli"))
      .orderBy(col("event_type"), col("day"))
  }

  private val qIntegerZscoreSql =
    """WITH daily AS (
      |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |    CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM daily GROUP BY 1),
      |v AS (
      |  SELECT event_type, sx * 1000 // d AS mean_milli,
      |    CAST((CAST(d AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |      * 1000000 // (CAST(d AS HUGEINT) * d) AS BIGINT) AS var2
      |  FROM m),
      |s0 AS (SELECT event_type, mean_milli, var2,
      |         CAST(floor(sqrt(CAST(var2 AS DOUBLE))) AS BIGINT) AS s
      |       FROM v),
      |s1 AS (SELECT event_type, mean_milli, var2,
      |         s - CASE WHEN s > 0 AND s * s > var2 THEN 1 ELSE 0 END AS s
      |       FROM s0),
      |sd AS (SELECT event_type, mean_milli,
      |         s + CASE WHEN s < 3037000499 AND (s + 1) * (s + 1) <= var2
      |                  THEN 1 ELSE 0 END
      |           AS sd_milli
      |       FROM s1)
      |SELECT daily.event_type, day, x, mean_milli, sd_milli,
      |  (x * 1000 - mean_milli) * 1000 // GREATEST(sd_milli, 1) AS z_milli
      |FROM daily JOIN sd ON sd.event_type = daily.event_type
      |ORDER BY daily.event_type, day""".stripMargin

  // ------------------------------------------------------------- q163

  /** q163: DISTRIBUTION-DRIFT AUDIT between two corpus halves — the
    * KS-style check an ML-ops stack runs between yesterday's and
    * today's ingest (here: a deterministic md5 split of the corpus).
    * Per half: the ten nearest-rank deciles of document length (value
    * at row_number ceil(n·d/10), pure integers); the report joins the
    * decile vectors and emits per-decile absolute gaps — max |gap| is
    * the drift statistic. The ranked windows run per half over one
    * shuffle; the decile target table is 10 rows per half (bounded). */
  private def qDecileDrift(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      .withColumn("half",
        when(substring(md5(concat(lit("drift:"), col("doc_id"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
    val w = Window.partitionBy(col("half"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = d
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("half"))))
    val deciles = ranked
      .withColumn("dec", explode(expr("sequence(1, 10)")))
      .filter(col("rn") === expr("(n * dec + 9) div 10"))
      .groupBy(col("dec"))
      .agg(max(when(col("half") === "A", col("n_chars"))).as("a_val"),
        max(when(col("half") === "B", col("n_chars"))).as("b_val"))
    deciles
      .withColumn("gap", abs(col("a_val") - col("b_val")))
      .orderBy(col("dec"))
  }

  private val qDecileDriftSql =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN substring(md5('drift:' || doc_id), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
      |      AS half
      |  FROM documents),
      |r AS (
      |  SELECT half, n_chars,
      |    row_number() OVER (PARTITION BY half ORDER BY n_chars, doc_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY half) AS n
      |  FROM d),
      |t AS (
      |  SELECT CAST(dec AS INT) AS dec, half, n_chars
      |  FROM r CROSS JOIN unnest(generate_series(1, 10)) AS u(dec)
      |  WHERE rn = (n * dec + 9) // 10),
      |p AS (
      |  SELECT dec,
      |    MAX(CASE WHEN half = 'A' THEN n_chars END) AS a_val,
      |    MAX(CASE WHEN half = 'B' THEN n_chars END) AS b_val
      |  FROM t GROUP BY 1)
      |SELECT dec, a_val, b_val, abs(a_val - b_val) AS gap
      |FROM p ORDER BY dec""".stripMargin

  // ------------------------------------------------------------- q164

  /** q164: CO-PURCHASE ITEM NEIGHBORS — the classic item-item
    * collaborative-filtering table ("customers who bought A also
    * bought B"): parts co-occurring in an order, association strength
    * as LIFT in exact ppm (co·N·10^6 div (cnt_a·cnt_b), DECIMAL(38)
    * against overflow), support-pruned (co ≥ 2 — measured stable at
    * 2–4k pairs across three SFs where co ≥ 3 collapses to single
    * digits as the catalog outgrows the order count), top-5 neighbors
    * per anchor part. The pair generator is a self-equi-join on the order
    * key — fan-out bounded by order width (≤ 7 lineitems at any TPC-H
    * SF), never corpus²; counts join back on part keys; the grand
    * total is a 1-row broadcast. */
  private def qCoPurchase(s: SparkSession, dir: String): DataFrame = {
    val op = load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val cnt = op.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
    val n = op.select(col("o")).distinct().agg(count(lit(1)).as("n"))
    val pairs = op.as("x").join(op.as("y"), Seq("o"))
      .filter(col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    val scored = pairs
      .join(cnt.select(col("p").as("pa"), col("cnt").as("ca")), "pa")
      .join(cnt.select(col("p").as("pb"), col("cnt").as("cb")), "pb")
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm", expr(
        """CAST(CAST(co AS DECIMAL(38,0)) * n * 1000000
          |  div (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)""".stripMargin))
    // each canonical pair recommends in both directions
    val sym = scored.select(col("pa").as("item"), col("pb").as("rec"),
        col("co"), col("lift_ppm"))
      .unionAll(scored.select(col("pb").as("item"), col("pa").as("rec"),
        col("co"), col("lift_ppm")))
    val wr = Window.partitionBy(col("item"))
      .orderBy(col("lift_ppm").desc, col("rec"))
    sym.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 5)
      .select(col("item"), col("rank"), col("rec"), col("co"),
        col("lift_ppm"))
      .orderBy(col("item"), col("rank"))
  }

  private val qCoPurchaseSql =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |            FROM lineitem),
      |cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt FROM op GROUP BY 1),
      |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM op),
      |pairs AS (
      |  SELECT x.p AS pa, y.p AS pb, CAST(COUNT(*) AS BIGINT) AS co
      |  FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |scored AS (
      |  SELECT pa, pb, co,
      |    CAST(CAST(co AS HUGEINT) * n.n * 1000000
      |      // (CAST(ca.cnt AS HUGEINT) * cb.cnt) AS BIGINT) AS lift_ppm
      |  FROM pairs
      |  JOIN cnt ca ON ca.p = pairs.pa
      |  JOIN cnt cb ON cb.p = pairs.pb
      |  CROSS JOIN n),
      |sym AS (
      |  SELECT pa AS item, pb AS rec, co, lift_ppm FROM scored
      |  UNION ALL
      |  SELECT pb AS item, pa AS rec, co, lift_ppm FROM scored)
      |SELECT item, rank, rec, co, lift_ppm FROM (
      |  SELECT *, row_number() OVER (PARTITION BY item
      |    ORDER BY lift_ppm DESC, rec) AS rank FROM sym) t
      |WHERE rank <= 5 ORDER BY item, rank""".stripMargin

  // ------------------------------------------------------------- q165

  /** q165: KEY-SKEW GINI REPORT — the quantitative companion to q125's
    * salted join: how unevenly is per-user activity distributed, per
    * event type? The textbook Gini needs a GLOBAL sort of per-key
    * sizes — an anti-pattern this repo polices — so it is restated
    * over the bounded SIZE HISTOGRAM: a tie-block of m keys of size s
    * starting after C smaller keys contributes s·m·(2C + m − n) to
    * the numerator (the arithmetic-series closed form of
    * Σ(2i−n−1)·x₍ᵢ₎ within the block), and the windows run over the
    * size ALPHABET (≤ max-events-per-user distinct sizes), never over
    * the key population. Gini lands in exact ppm via DECIMAL(38)
    * division. Zero global sorts, two bounded windows, one key-sized
    * hash aggregate — works unchanged when "keys" are 10^9 users. */
  private def qKeySkewGini(s: SparkSession, dir: String): DataFrame = {
    val sizes = load(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy(col("event_type"), col("sz"))
      .agg(count(lit(1)).as("m"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("sz"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wt = Window.partitionBy(col("event_type"))
    hist
      .withColumn("c", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("n", sum(col("m")).over(wt))
      .withColumn("t", sum(col("sz") * col("m")).over(wt))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_keys"), max(col("t")).as("total"),
        expr("""CAST(sum(CAST(sz AS DECIMAL(38,0)) * m * (2 * c + m - n))
               |  * 1000000 div (max(n) * CAST(max(t) AS DECIMAL(38,0)))
               |  AS BIGINT)""".stripMargin).as("gini_ppm"))
      .orderBy(col("event_type"))
  }

  private val qKeySkewGiniSql =
    """WITH sizes AS (
      |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS sz
      |  FROM events GROUP BY 1, 2),
      |hist AS (
      |  SELECT event_type, sz, CAST(COUNT(*) AS BIGINT) AS m
      |  FROM sizes GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type, sz, m,
      |    COALESCE(SUM(m) OVER (PARTITION BY event_type ORDER BY sz
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      CAST(0 AS BIGINT)) AS c,
      |    SUM(m) OVER (PARTITION BY event_type) AS n,
      |    SUM(sz * m) OVER (PARTITION BY event_type) AS t
      |  FROM hist)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_keys,
      |  CAST(MAX(t) AS BIGINT) AS total,
      |  CAST(SUM(CAST(sz AS HUGEINT) * m * (2 * c + m - n)) * 1000000
      |    // (CAST(MAX(n) AS HUGEINT) * MAX(t)) AS BIGINT) AS gini_ppm
      |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q166

  /** q166: ADDITIVE TABLE FINGERPRINT — the reconciliation primitive
    * behind "is the replica byte-equal to the source?" at 100 TB: per
    * partition key, a row count plus a COMMUTATIVE checksum (sum of
    * each row's md5-prefix as a 60-bit integer) — addition is
    * order-independent, so the fingerprint needs no sort and two
    * engines/two copies can compute it shuffle-order-free. The sum
    * accumulates in DECIMAL(38)/HUGEINT and is released mod the
    * largest sub-2^63 prime — 10^8 60-bit terms overflow a BIGINT
    * accumulator, which ANSI Spark correctly refuses to wrap. Rows
    * serialize through EXACT types only (keys as integers, money as
    * DECIMAL(18,2) strings) — float-to-string is the one formatting
    * both engines may disagree on, so it is banned from fingerprints.
    * The gate's verdict column proves order-independence internally:
    * the checksum of a repartition-shuffled self equals the scan-order
    * checksum. */
  private def qTableFingerprint(s: SparkSession, dir: String): DataFrame = {
    def fp(rows: DataFrame): DataFrame = rows
      .select(col("l_returnflag"),
        expr("""CAST(conv(substring(md5(concat_ws('|',
          |  CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
          |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS STRING))),
          |  1, 15), 16, 10) AS BIGINT)""".stripMargin).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 9223372036854775783" +
          " AS BIGINT)").as("checksum"))
    val li = load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val a = fp(li)
    val b = fp(li.repartition(13, col("l_linenumber"))) // scrambled order
      .withColumnRenamed("n", "n2").withColumnRenamed("checksum", "c2")
    a.join(b, "l_returnflag")
      .withColumn("order_independent",
        (col("n") === col("n2") && col("checksum") === col("c2")).cast("int"))
      .select(col("l_returnflag"), col("n"), col("checksum"),
        col("order_independent"))
      .orderBy(col("l_returnflag"))
  }

  private val qTableFingerprintSql =
    """WITH h AS (
      |  SELECT l_returnflag,
      |    CAST(('0x' || substring(md5(
      |      CAST(l_orderkey AS VARCHAR) || '|' ||
      |      CAST(l_linenumber AS VARCHAR) || '|' ||
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS h
      |  FROM lineitem)
      |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(h AS HUGEINT)) % 9223372036854775783 AS BIGINT)
      |    AS checksum,
      |  CAST(1 AS INT) AS order_independent
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q167

  /** q167: MALFORMED-RECORD ROUTING (the DLQ error channel of SURVEY
    * F/K8, restated as a relational gate): a deterministic tenth of
    * the `props` JSON payloads is truncated mid-object; the parse
    * stage must route bad rows to counts (never drop, never throw)
    * while good rows keep aggregating. Spark: `from_json` yields null
    * on malformed input (PERMISSIVE); DuckDB: `json_valid` guards
    * `json_extract`. Reports per event type: totals, malformed count,
    * bad-rate ppm, and the k-sum over the GOOD rows only. */
  private def qMalformedRouting(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    load(s, dir, "events")
      .withColumn("raw",
        when(col("event_id") % 11 === 0,
          expr("substring(props, 1, length(props) - 1)")) // truncated JSON
          .otherwise(col("props")))
      .withColumn("k",
        from_json(col("raw"),
          StructType(Seq(StructField("k", LongType)))).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum(coalesce(col("k"), lit(0L))).as("k_sum"))
      .withColumn("bad_ppm", expr("n_bad * 1000000 div n"))
      .orderBy(col("event_type"))
  }

  private val qMalformedRoutingSql =
    """WITH r AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 11 = 0
      |      THEN substring(props, 1, length(props) - 1)
      |      ELSE props END AS raw
      |  FROM events),
      |p AS (
      |  SELECT event_type,
      |    CASE WHEN json_valid(raw)
      |      THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
      |  FROM r)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bad,
      |  CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS k_sum,
      |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // COUNT(*) AS bad_ppm
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q168

  /** q168: INTERPOLATED QUANTILES WITHOUT FLOATS — q55 gates Spark's
    * `percentile` against DuckDB's `quantile_cont` and works because
    * the inputs are small integers whose double interpolation happens
    * to agree; this is the formulation that CANNOT disagree: position
    * p·(n−1) as an exact rational over denominator 100, the lower/
    * upper order statistics fetched by running count, and the
    * interpolation v_lo·10^6 + (v_hi−v_lo)·frac·10^6 div 100 in pure
    * BIGINT micro units.
    *
    * Scale shape (round-7 rewrite): the former per-flag `row_number()`
    * window sorted each flag's FULL row set in one task (3-value
    * alphabet ⇒ one task owns a third of lineitem; measured 75 s and
    * exponent 1.02 at the 100× directory). The value-at-rank map is
    * tie-break independent, so the order statistics now come from the
    * VALUE HISTOGRAM: one map-side-combinable groupBy(flag, quantity)
    * — 3×50 rows at any SF — then running counts and the two
    * conditional-min lookups on that tiny table. Sub-second at 100×. */
  private def qIntegerQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = load(s, dir, "lineitem")
      .select(col("l_returnflag").as("rf"),
        col("l_quantity").cast(LongType).as("q"))
      .groupBy(col("rf"), col("q"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("rf")).orderBy(col("q"))))
    val stats = cum.groupBy(col("rf"))
      .agg(max(col("cum")).as("n"))
      .withColumn("p", explode(expr("array(25L, 50L, 75L)")))
      .withColumn("pos_num", expr("p * (n - 1)"))
      .withColumn("idx_lo", expr("pos_num div 100"))
      .withColumn("frac_num", expr("pos_num % 100"))
      .withColumn("rank_lo", col("idx_lo") + 1)
      .withColumn("rank_hi", least(col("idx_lo") + 2, col("n")))
    stats.join(cum, "rf") // tiny × tiny (9 × histogram rows)
      .groupBy(col("rf"), col("p"), col("n"), col("frac_num"))
      .agg(min(when(col("cum") >= col("rank_lo"), col("q"))).as("v_lo"),
        min(when(col("cum") >= col("rank_hi"), col("q"))).as("v_hi"))
      .withColumn("q_micro", expr(
        "v_lo * 1000000 + (v_hi - v_lo) * frac_num * 1000000 div 100"))
      .select(col("rf").as("l_returnflag"), col("p"), col("n"),
        col("q_micro"))
      .orderBy(col("l_returnflag"), col("p"))
  }

  private val qIntegerQuantilesSql =
    """WITH v AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |r AS (
      |  SELECT l_returnflag, q,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY q, l_orderkey, l_linenumber) AS rn
      |  FROM v),
      |s AS (
      |  SELECT l_returnflag, CAST(MAX(rn) AS BIGINT) AS n
      |  FROM r GROUP BY 1),
      |t AS (
      |  SELECT l_returnflag, n, CAST(p AS BIGINT) AS p,
      |    CAST(p AS BIGINT) * (n - 1) AS pos_num
      |  FROM s CROSS JOIN unnest([25, 50, 75]) AS u(p)),
      |x AS (
      |  SELECT l_returnflag, n, p,
      |    pos_num // 100 AS idx_lo, pos_num % 100 AS frac_num
      |  FROM t)
      |SELECT x.l_returnflag, p, n,
      |  lo.q * 1000000 + (hi.q - lo.q) * frac_num * 1000000 // 100
      |    AS q_micro
      |FROM x
      |JOIN r lo ON lo.l_returnflag = x.l_returnflag
      |  AND lo.rn = idx_lo + 1
      |JOIN r hi ON hi.l_returnflag = x.l_returnflag
      |  AND hi.rn = LEAST(idx_lo + 2, n)
      |ORDER BY x.l_returnflag, p""".stripMargin

  // ------------------------------------------------------------- q169

  /** q169: BITMAP-INDEX SET INTERSECTION — the roaring-bitmap
    * technique as relational algebra: per (event type, word) a 32-bit
    * user-presence word is built with one `bit_or` aggregate, and
    * "users who did BOTH types" is a word-index equi-join + popcount
    * of the AND — exact distinct-intersection counts with NO distinct
    * shuffle and no per-user join: the join cardinality is
    * |users|/32 per type, a 32× compression of the set-intersection
    * problem. 32-bit words inside BIGINTs because DuckDB (correctly)
    * refuses a shift into the sign bit that Spark would wrap
    * silently — the same class of engine divergence q166 bans.
    * Output: the full type×type intersection matrix (alphabet²,
    * bounded) with exact user counts. */
  private def qBitmapIntersect(s: SparkSession, dir: String): DataFrame = {
    val words = load(s, dir, "events")
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"),
        expr("user_id div 32").as("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pmod(user_id, 32) AS INT)))")
        .as("bits"))
    val a = words.select(col("event_type").as("type_a"), col("w"),
      col("bits").as("ba"))
    val b = words.select(col("event_type").as("type_b"), col("w"),
      col("bits").as("bb"))
    a.join(b, "w")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(expr("CAST(bit_count(ba & bb) AS BIGINT)")).as("n_both"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private val qBitmapIntersectSql =
    """WITH words AS (
      |  SELECT event_type, user_id // 32 AS w,
      |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
      |  FROM events GROUP BY 1, 2)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS n_both
      |FROM words a
      |JOIN words b ON a.w = b.w AND a.event_type < b.event_type
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q170

  /** q170: QUANTILE NORMALIZATION via the bounded value-alphabet
    * histogram — map every document's length to its corpus-wide
    * mid-rank quantile in ppm WITHOUT a global sort (the q165 device
    * applied to feature calibration): per distinct value, the tie
    * block's doubled average rank is 2C + m + 1, so q_ppm =
    * (2C + m − 1)·10^6 div (2(n−1)) — exact integers, windows over
    * the length alphabet only, then an alphabet equi-join back to the
    * rows. The report aggregates per source: a source whose mean
    * quantile drifts from 500 000 ppm is systematically long/short —
    * the calibration check feature stores run per feature per
    * source. */
  private def qQuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents").select(col("doc_id"), col("source"),
      col("n_chars"))
    val hist = d.groupBy(col("n_chars")).agg(count(lit(1)).as("m"))
    val w = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wt = Window.partitionBy()
    val q = hist
      .withColumn("c", coalesce(sum(col("m")).over(w), lit(0L)))
      .withColumn("n", sum(col("m")).over(wt))
      .withColumn("q_ppm",
        expr("(2 * c + m - 1) * 1000000 div (2 * (n - 1))"))
      .select(col("n_chars"), col("q_ppm"))
    d.join(q, "n_chars")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(q_ppm) div count(1)").as("mean_q_ppm"),
        min(col("q_ppm")).as("min_q_ppm"),
        max(col("q_ppm")).as("max_q_ppm"))
      .orderBy(col("source"))
  }

  private val qQuantileNormalizeSql =
    """WITH hist AS (
      |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS m
      |  FROM documents GROUP BY 1),
      |q AS (
      |  SELECT n_chars,
      |    CAST((2 * COALESCE(SUM(m) OVER (ORDER BY n_chars
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |       CAST(0 AS BIGINT)) + m - 1) * 1000000
      |      // (2 * (SUM(m) OVER () - 1)) AS BIGINT) AS q_ppm
      |  FROM hist)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(q_ppm) AS BIGINT) // COUNT(*) AS mean_q_ppm,
      |  CAST(MIN(q_ppm) AS BIGINT) AS min_q_ppm,
      |  CAST(MAX(q_ppm) AS BIGINT) AS max_q_ppm
      |FROM documents JOIN q USING (n_chars)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q171

  /** q171: ORDER-FULFILLMENT SLA REPORT — per order priority: how many
    * orders shipped COMPLETELY (every lineitem) within 60 days of
    * order date, as exact ppm. The all-items predicate is a `bool_and`
    * aggregate over the order join — one shuffle on the order key,
    * one alphabet aggregate; lateness is pure integer day arithmetic
    * on epoch micros (both tables are midnight-aligned timestamps, so
    * the floor division is the calendar day difference in both
    * engines). */
  private def qSlaFillRate(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    val ord = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val perOrder = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days", expr(
        "(unix_micros(l_shipdate) - unix_micros(o_orderdate))" +
          " div 86400000000"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(expr("bool_and(lag_days <= 60)").as("on_time"),
        count(lit(1)).as("n_items"))
    perOrder.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("on_time"), 1L).otherwise(0L)).as("n_on_time"))
      .withColumn("on_time_ppm", expr("n_on_time * 1000000 div n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  private val qSlaFillRateSql =
    """WITH per_order AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    bool_and((epoch_us(l_shipdate) - epoch_us(o_orderdate))
      |      // 86400000000 <= 60) AS on_time
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CASE WHEN on_time THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_on_time,
      |  CAST(SUM(CASE WHEN on_time THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // COUNT(*) AS on_time_ppm
      |FROM per_order GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q172

  /** q172: COMPLETE-OUTPUT-MODE streaming aggregate — the third output
    * mode, closing the matrix (Append: q130/q139/q145/q158; Update:
    * q134; Complete: here). The whole aggregate result re-emits every
    * trigger into the in-memory sink; after AvailableNow drains the
    * staged slices, the LAST complete emission must equal the batch
    * aggregate, which is the oracle. Exact DECIMAL revenue as
    * everywhere. Complete mode is the one whose state never evicts —
    * correct only because the grouping alphabet (return flags) is
    * bounded; the scaladoc point IS that choosing Complete for an
    * unbounded key space is the production mistake. */
  private def qStreamCompleteAgg(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import org.apache.spark.sql.types.{DoubleType, StructType}
    graft.streaming.StreamConfs.withHdfsStateStore(s) {
      graft.streaming.StreamScratch.withScratch("graft_cmpl_") { tmp =>
        val li = load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_discount"))
        li.select(to_json(struct(col("l_returnflag"),
            col("l_extendedprice"), col("l_discount"))).as("value"))
          .repartition(4)
          .write.mode("overwrite").text(s"$tmp/in")
        val schema = new StructType()
          .add("l_returnflag", org.apache.spark.sql.types.StringType)
          .add("l_extendedprice", DoubleType).add("l_discount", DoubleType)
        // collision-free sink name: abs(hashCode) is negative at
        // Int.MinValue and two dirs can collide — a counter cannot
        val name = "graft_complete_" +
          graft.ops.Advanced.sinkNameCounter.incrementAndGet()
        val q = s.readStream
          .option("maxFilesPerTrigger", 1)
          .text(s"$tmp/in")
          .select(from_json(col("value"), schema).as("d"))
          .groupBy(col("d.l_returnflag").as("l_returnflag"))
          .agg(
            sum((col("d.l_extendedprice") * (lit(1.0) - col("d.l_discount")))
              .cast(DecimalType(18, 6))).as("rev"),
            count(lit(1)).as("n_items"))
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/chk")
          .outputMode(OutputMode.Complete())
          .format("memory").queryName(name)
          .start()
        q.awaitTermination()
        // revenue released as exact integer CENTS, not a double: at 3
        // groups the sum carries 17 significant digits and the
        // DECIMAL->DOUBLE conversion rounds differently in the two
        // engines by 1 ulp (caught at sf1). floor() before the cast
        // because Spark truncates decimal->long where DuckDB rounds.
        // the memory sink is driver-resident by nature (bounded here:
        // the return-flag alphabet); one tiny distributed persist moves
        // the final emission to GateOut so the temp view can drop and
        // the gate still returns a lazy reader, never driver rows
        val result = graft.streaming.GateOut.persist(
          s.table(name)
            .select(col("l_returnflag"),
              expr("CAST(floor(rev * 100) AS BIGINT)").as("revenue_cents"),
              col("n_items")))
        s.catalog.dropTempView(name)
        result.orderBy(col("l_returnflag"))
      }
    }
  }

  private val qStreamCompleteAggSql =
    """SELECT l_returnflag,
      |  CAST(floor(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,6))) * 100) AS BIGINT) AS revenue_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q173

  /** q173: WEIGHTED MEDIAN — "the document length at which half the
    * TOKEN MASS sits" per language, the statistic curation actually
    * wants when documents differ 100× in size (the unweighted q168
    * median answers a different question). Nearest-rank weighted form:
    * first value whose doubled running weight reaches the total — one
    * per-group sort window for the running sum, one conditional-min
    * aggregate; all BIGINT. */
  private def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val d = load(s, dir, "documents").select(col("doc_id"), col("lang"),
      col("n_chars"),
      expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("tot",
        sum(col("n_tokens")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), max(col("tot")).as("total_tokens"),
        min(when(col("cum") * 2 >= col("tot"), col("n_chars")))
          .as("wmedian_chars"))
      .orderBy(col("lang"))
  }

  private val qWeightedMedianSql =
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT lang, n_chars, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(n_tokens) OVER (PARTITION BY lang) AS tot
      |  FROM d)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(MAX(tot) AS BIGINT) AS total_tokens,
      |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN n_chars END) AS BIGINT)
      |    AS wmedian_chars
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q174

  /** q174: EXACT SLIDING-WINDOW DISTINCT — trailing-24-hour distinct
    * users per hour, the metric every dashboard approximates with HLL
    * because exact sliding distinct "needs" re-scanning each window.
    * The bitmap-word device (q169) makes it exact AND linear: hourly
    * presence words contribute themselves to the 24 target hours they
    * are visible in (a row-local 24× explode — cost 24·|word-rows|,
    * no hour×word grid, no window rescans), then one bit_or per
    * (target hour, word) and a popcount sum. A row-frame window over
    * sparse hourly words would silently UNDERCOUNT (a word absent at
    * hour h contributes nothing at h even when its users were active
    * at h−1) — the explode-contribution form is the correct one. */
  private def qSlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val hourly = ev.select(
        expr("unix_micros(ts) div 3600000000").as("h"),
        expr("user_id div 32").as("w"),
        col("user_id"))
      .groupBy(col("h"), col("w"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pmod(user_id, 32) AS INT)))")
        .as("bits"))
    // bounded collect: one scalar (the series' last hour)
    val Array(hmax) = ev.agg(expr("max(unix_micros(ts) div 3600000000)"))
      .collect().map(_.getLong(0))
    hourly
      .withColumn("th", explode(expr("sequence(h, h + 23)")))
      .filter(col("th") <= hmax)
      .groupBy(col("th"), col("w"))
      .agg(expr("bit_or(bits)").as("wbits"))
      .groupBy(col("th"))
      .agg(sum(expr("CAST(bit_count(wbits) AS BIGINT)")).as("u24"))
      .select(expr("timestamp_micros(th * 3600000000)").as("hr"), col("u24"))
      .orderBy(col("hr"))
  }

  private val qSlidingDistinctSql =
    """WITH hourly AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h, user_id // 32 AS w,
      |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
      |  FROM events GROUP BY 1, 2),
      |hm AS (SELECT MAX(epoch_us(ts) // 3600000000) AS hmax FROM events),
      |contrib AS (
      |  SELECT CAST(u.th AS BIGINT) AS th, w, bits
      |  FROM hourly CROSS JOIN unnest(generate_series(h, h + 23)) AS u(th)
      |  CROSS JOIN hm WHERE u.th <= hm.hmax),
      |words AS (
      |  SELECT th, w, bit_or(bits) AS wbits FROM contrib GROUP BY 1, 2)
      |SELECT make_timestamp(th * 3600000000) AS hr,
      |  CAST(SUM(bit_count(wbits)) AS BIGINT) AS u24
      |FROM words GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q175

  /** q175: LARGEST-REMAINDER APPORTIONMENT — allocate a fixed sampling
    * budget of [[ApportionBudget]] slots across languages proportional
    * to token mass, exactly: floor allocations first, then the leftover
    * slots go to the largest fractional remainders (tie → lang order) —
    * the Hamilton method, the standard way a curation pipeline turns
    * "sample 10 000 docs proportionally" into per-group integer quotas
    * that provably sum to the budget. Pure integers: remainder =
    * share·B mod T; one alphabet-bounded rank window. */
  private val ApportionBudget = 10000L

  private def qApportion(s: SparkSession, dir: String): DataFrame = {
    val mass = load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(expr("CAST(sum(size(split(text, ' '))) AS BIGINT)").as("tok"))
    val t = mass.agg(sum(col("tok")).as("t"))
    val base = mass.crossJoin(broadcast(t))
      .withColumn("floor_q", expr(s"tok * $ApportionBudget div t"))
      .withColumn("rem", expr(s"(tok * $ApportionBudget) % t"))
    val short = base.agg(
      (lit(ApportionBudget) - sum(col("floor_q"))).as("short"))
    base.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"))))
      .withColumn("quota",
        col("floor_q") + when(col("rk") <= col("short"), 1L).otherwise(0L))
      .select(col("lang"), col("tok"), col("floor_q"), col("quota"))
      .orderBy(col("lang"))
  }

  private val qApportionSql =
    s"""WITH mass AS (
       |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       |    AS tok
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(SUM(tok) AS BIGINT) AS t FROM mass),
       |base AS (
       |  SELECT lang, tok, tok * $ApportionBudget // t AS floor_q,
       |    (tok * $ApportionBudget) % t AS rem
       |  FROM mass CROSS JOIN t),
       |sh AS (SELECT $ApportionBudget - CAST(SUM(floor_q) AS BIGINT)
       |         AS short FROM base)
       |SELECT lang, tok, CAST(floor_q AS BIGINT) AS floor_q,
       |  CAST(floor_q + CASE WHEN
       |    row_number() OVER (ORDER BY rem DESC, lang) <= short
       |    THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM base CROSS JOIN sh ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- q176

  /** q176: STRATIFIED-LIFT AUDIT (Simpson's-paradox guard) — the
    * experiment sanity check: an md5 A/B split of customers, outcome =
    * placed at least one URGENT order, strata = nation. Reports the
    * 2×2 table and conversion ppm per arm PER STRATUM plus the pooled
    * row (stratum −1), so an analyst can see when the pooled lift
    * direction contradicts the strata (confounded assignment). All
    * counts integers, rates floor-ppm; the pooled row is a second
    * aggregate over the same per-customer table, not a re-scan. */
  private def qStratifiedLift(s: SparkSession, dir: String): DataFrame = {
    val urgent = load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"), col("c_custkey"))), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
      .join(urgent.withColumn("conv", lit(1L)),
        col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_nationkey"), col("arm"),
        coalesce(col("conv"), lit(0L)).as("conv"))
    def table(rows: DataFrame, stratum: Column): DataFrame =
      rows.groupBy(stratum.as("stratum"))
        .agg(
          sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("conv_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("conv_b"))
    table(cust, col("c_nationkey").cast(LongType))
      .unionByName(table(cust, lit(-1L)))
      .withColumn("rate_a_ppm", expr("conv_a * 1000000 div n_a"))
      .withColumn("rate_b_ppm", expr("conv_b * 1000000 div n_b"))
      .withColumn("lift_ppm", col("rate_a_ppm") - col("rate_b_ppm"))
      .orderBy(col("stratum"))
  }

  private val qStratifiedLiftSql =
    """WITH urgent AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT'),
      |cust AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS stratum,
      |    CASE WHEN substring(md5('ab:' || c_custkey), 1, 1)
      |      IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END
      |      AS arm,
      |    CASE WHEN u.o_custkey IS NULL THEN 0 ELSE 1 END AS conv
      |  FROM customer LEFT JOIN urgent u ON u.o_custkey = c_custkey),
      |g AS (
      |  SELECT stratum, arm, conv FROM cust
      |  UNION ALL
      |  SELECT CAST(-1 AS BIGINT), arm, conv FROM cust),
      |tab AS (
      |  SELECT stratum,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_a,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
      |      AS conv_a,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_b,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
      |      AS conv_b
      |  FROM g GROUP BY 1)
      |SELECT stratum, n_a, conv_a, n_b, conv_b,
      |  conv_a * 1000000 // n_a AS rate_a_ppm,
      |  conv_b * 1000000 // n_b AS rate_b_ppm,
      |  conv_a * 1000000 // n_a - conv_b * 1000000 // n_b AS lift_ppm
      |FROM tab ORDER BY stratum""".stripMargin

  // ------------------------------------------------------------- q177

  /** q177: DETERMINISTIC GROUP-WISE MODE — both engines ship a native
    * `mode()` aggregate, and BOTH leave the tie-break implementation-
    * defined, which makes the built-in un-gateable and (worse)
    * non-reproducible run to run on a cluster. The portable form: one
    * (group, value) count aggregate + one rank window with the
    * explicit tie rule (max count, tie → smallest value). Reports the
    * mode return-flag per order priority with its support count and
    * ppm share — alphabet² intermediate, nothing data-sized after
    * the first aggregate. (This generator's lineitem has no ship-mode
    * column, so the mode is over the return-flag alphabet.) */
  private def qDeterministicMode(s: SparkSession, dir: String): DataFrame = {
    val counts = load(s, dir, "lineitem")
      .join(load(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy(col("o_orderpriority"))
      .agg(sum(col("cnt")).as("tot"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("cnt").desc, col("l_returnflag"))))
      .filter(col("rk") === 1)
      .join(tot, "o_orderpriority")
      .select(col("o_orderpriority"), col("l_returnflag").as("mode_flag"),
        col("cnt"), expr("cnt * 1000000 div tot").as("share_ppm"))
      .orderBy(col("o_orderpriority"))
  }

  private val qDeterministicModeSql =
    """WITH c AS (
      |  SELECT o_orderpriority, l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |t AS (SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS tot
      |      FROM c GROUP BY 1),
      |m AS (
      |  SELECT o_orderpriority, l_returnflag, cnt,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cnt DESC, l_returnflag) AS rk
      |  FROM c)
      |SELECT m.o_orderpriority, l_returnflag AS mode_flag, cnt,
      |  cnt * 1000000 // tot AS share_ppm
      |FROM m JOIN t ON t.o_orderpriority = m.o_orderpriority
      |WHERE rk = 1 ORDER BY m.o_orderpriority""".stripMargin

  // ------------------------------------------------------------- q178

  /** q178: GAPS-AND-ISLANDS — the canonical SQL pattern the battery
    * lacked, as user activity STREAKS: consecutive-day runs per user
    * found with the rn-difference device (day − row_number() is
    * constant inside an island), then a bounded histogram of longest
    * streaks. Per-user windows shuffle on the user key; the report
    * aggregates to the streak-length alphabet. */
  private def qStreaks(s: SparkSession, dir: String): DataFrame = {
    val days = load(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000")
          .as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val streaks = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(max(col("len")).as("longest"), count(lit(1)).as("n_streaks"))
      .groupBy(col("longest"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_streaks")).as("total_streaks"))
      .orderBy(col("longest"))
  }

  private val qStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day
      |  FROM events),
      |streaks AS (
      |  SELECT user_id, day - row_number() OVER (PARTITION BY user_id
      |      ORDER BY day) AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      |  FROM streaks GROUP BY 1, 2),
      |per_user AS (
      |  SELECT user_id, MAX(len) AS longest,
      |    CAST(COUNT(*) AS BIGINT) AS n_streaks
      |  FROM runs GROUP BY 1)
      |SELECT longest, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_streaks) AS BIGINT) AS total_streaks
      |FROM per_user GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q179

  /** q179: STRICT ORDERED FUNNEL — view → click → purchase, each step
    * strictly after the previous one PER USER (q82's ordered-funnel
    * device promoted to a three-stage report with conversion ppm).
    * Stage k is one conditional-min aggregate over an equi-join on
    * the user key against stage k−1's timestamps — no event×event
    * self-join, cost is one shuffle per stage on the same key. The
    * report is three bounded rows: users reaching each step +
    * conversion ppm against step 1. */
  private def qStrictFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    val (n1, n2, n3) = (t1.count(), t2.count(), t3.count())
    import s.implicits._
    // degenerate slice with zero stage-1 users: a zero funnel, not a
    // division crash — mirrored by CASE WHEN n1 = 0 in the oracle
    def ppm(n: Long): Long = if (n1 == 0) 0L else n * 1000000L / n1
    Seq((1L, "view", n1, if (n1 == 0) 0L else 1000000L),
      (2L, "view>click", n2, ppm(n2)),
      (3L, "view>click>purchase", n3, ppm(n3)))
      .toDF("step", "stage", "n_users", "conv_ppm")
      .orderBy(col("step"))
  }

  private val qStrictFunnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us
      |            FROM events),
      |t1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev
      |       JOIN t1 ON t1.user_id = ev.user_id
      |       WHERE event_type = 'click' AND us > t1 GROUP BY 1),
      |t3 AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev
      |       JOIN t2 ON t2.user_id = ev.user_id
      |       WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
      |n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n1,
      |        (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n2,
      |        (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n3)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, n1 AS n_users,
      |    CAST(CASE WHEN n1 = 0 THEN 0 ELSE 1000000 END AS BIGINT)
      |      AS conv_ppm FROM n
      |  UNION ALL
      |  SELECT 2, 'view>click', n2,
      |    CASE WHEN n1 = 0 THEN 0 ELSE n2 * 1000000 // n1 END FROM n
      |  UNION ALL
      |  SELECT 3, 'view>click>purchase', n3,
      |    CASE WHEN n1 = 0 THEN 0 ELSE n3 * 1000000 // n1 END FROM n)
      |ORDER BY step""".stripMargin

  // ------------------------------------------------------------- q180

  /** q180: COHORT LTV CURVES — cumulative micro-quantized value per
    * signup-week cohort by week offset, the growth-analytics table
    * behind every retention deck. Cohort = the user's first-event
    * week (one min aggregate); offset weeks are integer epoch-week
    * differences; the cumulative sum is a window over the bounded
    * (cohort × offset) grid, not over events. */
  private def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(col("user_id"),
      expr("unix_micros(ts) div 604800000000").as("wk"),
      expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val grid = ev.join(cohort, "user_id")
      .groupBy(col("cw"), (col("wk") - col("cw")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("v")).as("week_value_micro"))
    grid.withColumn("cum_ltv_micro",
        sum(col("week_value_micro")).over(
          Window.partitionBy(col("cw")).orderBy(col("offset_wk"))))
      .select(col("cw").as("cohort_week"), col("offset_wk"), col("n_active"),
        col("week_value_micro"), col("cum_ltv_micro"))
      .orderBy(col("cohort_week"), col("offset_wk"))
  }

  private val qCohortLtvSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
      |  FROM events),
      |cohort AS (SELECT user_id, MIN(wk) AS cw FROM ev GROUP BY 1),
      |grid AS (
      |  SELECT cw, wk - cw AS offset_wk,
      |    CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active,
      |    CAST(SUM(v) AS BIGINT) AS week_value_micro
      |  FROM ev JOIN cohort ON cohort.user_id = ev.user_id
      |  GROUP BY 1, 2)
      |SELECT cw AS cohort_week, offset_wk, n_active, week_value_micro,
      |  CAST(SUM(week_value_micro) OVER (PARTITION BY cw ORDER BY offset_wk)
      |    AS BIGINT) AS cum_ltv_micro
      |FROM grid ORDER BY cohort_week, offset_wk""".stripMargin

  // ------------------------------------------------------------- q181

  /** q181: RFM SEGMENTATION — the classic customer-analytics coding:
    * per user, Recency (last event time), Frequency (event count),
    * Monetary (micro-quantized value sum) each quartiled with
    * `ntile(4)` under a DETERMINISTIC total order (metric + user id —
    * ntile over a partial order is run-to-run unstable, the same
    * trap as q177's native mode), composed into a 3-digit segment
    * code. Report: users and value share per segment — 64 bounded
    * rows. Scale note (recoded round 8, oracle unchanged): a global
    * `ntile(4).over(Window.orderBy(...))` is a SINGLE-TASK sort of the
    * whole customer base, three times over. The exact same bucket
    * assignment — SQL ntile semantics under the declared unique total
    * order (metric desc, user_id) — is computed distributed with
    * [[graft.util.Ranks.globalRank]] (range-repartition parallel sort +
    * broadcast partition offsets) and [[graft.util.Ranks.ntileFromRank]]
    * (the closed-form ntile bucket from rank and N). Cost: three range
    * shuffles of the one-row-per-user table, each with full cluster
    * parallelism, versus three one-task sorts. */
  private def qRfmSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.util.Ranks
    val perUser = load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("r_us"),
        count(lit(1)).as("f"),
        sum(expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
          .as("m_micro"))
    val nUsers = perUser.agg(count(lit(1)).as("_nu"))
    val ranked = Ranks.globalRank(
      Ranks.globalRank(
        Ranks.globalRank(perUser,
          "_rr", col("r_us").desc, col("user_id")),
        "_rf", col("f").desc, col("user_id")),
      "_rm", col("m_micro").desc, col("user_id"))
    val coded = ranked
      .crossJoin(broadcast(nUsers)) // 1-row user-count scalar
      .withColumn("r_q", Ranks.ntileFromRank("_rr", "_nu", 4)) // 1 = most recent
      .withColumn("f_q", Ranks.ntileFromRank("_rf", "_nu", 4)) // 1 = most frequent
      .withColumn("m_q", Ranks.ntileFromRank("_rm", "_nu", 4)) // 1 = highest value
      .withColumn("segment",
        concat(col("r_q"), col("f_q"), col("m_q")))
    val tot = coded.agg(sum(col("m_micro")).as("t"))
    coded.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("m_micro")).as("value_micro"))
      .crossJoin(broadcast(tot))
      // DECIMAL-routed: value_micro * 10^6 exceeds long at sf10
      .withColumn("value_share_ppm", expr(
        "CAST(CAST(value_micro AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)"))
      .select(col("segment"), col("n_users"), col("value_micro"),
        col("value_share_ppm"))
      .orderBy(col("segment"))
  }

  private val qRfmSegmentsSql =
    """WITH per_user AS (
      |  SELECT user_id, MAX(epoch_us(ts)) AS r_us,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS m_micro
      |  FROM events GROUP BY 1),
      |coded AS (
      |  SELECT user_id, m_micro,
      |    CAST(ntile(4) OVER (ORDER BY r_us DESC, user_id) AS VARCHAR)
      |      || CAST(ntile(4) OVER (ORDER BY f DESC, user_id) AS VARCHAR)
      |      || CAST(ntile(4) OVER (ORDER BY m_micro DESC, user_id)
      |           AS VARCHAR) AS segment
      |  FROM per_user),
      |t AS (SELECT CAST(SUM(m_micro) AS BIGINT) AS t FROM coded)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(m_micro) AS BIGINT) AS value_micro,
      |  CAST(CAST(SUM(m_micro) AS HUGEINT) * 1000000 // MAX(t.t)
      |    AS BIGINT) AS value_share_ppm
      |FROM coded CROSS JOIN t GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q182

  /** q182: SEASONAL-BASELINE RESIDUALS — q85 z-scores each hour
    * against the global mean, which flags every Friday evening as an
    * anomaly; this deseasonalizes first: the baseline is the
    * (day-of-week × hour-of-day) profile mean (168 cells, integer
    * floor), and the residual is observed − baseline. Top 20 |residual|
    * hours with deterministic tie-breaks. The profile table is
    * alphabet-bounded (168 × types); everything else is one hourly
    * aggregate. Scale note (recoded round 8, oracle unchanged): the
    * top-20 runs as `orderBy(...).limit(20)` — Spark compiles that to
    * TakeOrderedAndProject (per-partition top-20 + driver merge of 20×P
    * rows), so the residual grid (linear in the time span) never funnels
    * through one window task; the rank label is then a window over the
    * 20 surviving rows only. */
  private def qSeasonalResiduals(s: SparkSession, dir: String): DataFrame = {
    val hourly = load(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("hr")))
      .withColumn("hod", hour(col("hr")))
    val profile = hourly.groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(expr("sum(n) div count(1)").as("base"))
    val ord = Seq(abs(col("resid")).desc, col("event_type").asc,
      col("hr").asc)
    hourly.join(profile, Seq("event_type", "dow", "hod"))
      .withColumn("resid", col("n") - col("base"))
      .orderBy(ord: _*)
      .limit(20)
      .withColumn("rk", row_number().over(Window.orderBy(ord: _*)))
      .select(col("rk"), col("event_type"), col("hr"), col("n"),
        col("base"), col("resid"))
      .orderBy(col("rk"))
  }

  private val qSeasonalResidualsSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |h2 AS (
      |  SELECT event_type, hr, n, dayofweek(hr) + 1 AS dow,
      |    hour(hr) AS hod
      |  FROM hourly),
      |profile AS (
      |  SELECT event_type, dow, hod,
      |    CAST(SUM(n) AS BIGINT) // COUNT(*) AS base
      |  FROM h2 GROUP BY 1, 2, 3),
      |r AS (
      |  SELECT h2.event_type, hr, n, base, n - base AS resid
      |  FROM h2 JOIN profile
      |    ON profile.event_type = h2.event_type
      |    AND profile.dow = h2.dow AND profile.hod = h2.hod)
      |SELECT rk, event_type, hr, n, base, resid FROM (
      |  SELECT *, CAST(row_number() OVER (ORDER BY abs(resid) DESC,
      |    event_type, hr) AS INT) AS rk FROM r) t
      |WHERE rk <= 20 ORDER BY rk""".stripMargin

  // ------------------------------------------------------------- q183

  /** q183: RAPID-REPEAT PURCHASE SCREEN — same user, two purchases
    * within 10 minutes: the double-charge / accidental-resubmit
    * review queue. The pairwise stage is a BANDED self-join: one side
    * explodes to its 10-minute bucket ±1 and joins on (user, bucket)
    * equality — a pair in range matches on EXACTLY one of the three
    * bucket values (the right side's bucket is fixed), so no distinct
    * pass is needed and nothing is quadratic: candidates are bounded
    * by per-(user, bucket) occupancy, the q35/q43 LSH-band shape
    * applied to time. Residual |Δt| ≤ 10 min + id order make each
    * unordered pair appear once; both amounts ride along micro-exact
    * for the reviewer. */
  private def qDuplicatePayments(s: SparkSession, dir: String): DataFrame = {
    val p = load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v_micro"))
      .withColumn("b", expr("us div 600000000"))
    val left = p.select(col("user_id"), col("event_id").as("id_a"),
        col("us").as("us_a"), col("v_micro").as("v_a"), col("b"))
      .withColumn("jb", explode(expr("array(b - 1, b, b + 1)")))
    val right = p.select(col("user_id"), col("event_id").as("id_b"),
      col("us").as("us_b"), col("v_micro").as("v_b"), col("b").as("jb"))
    left.join(right, Seq("user_id", "jb"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= 600000000L)
      .select(col("user_id"), col("id_a"), col("id_b"), col("v_a"),
        col("v_b"), abs(col("us_b") - col("us_a")).as("gap_us"))
      .orderBy(col("user_id"), col("id_a"), col("id_b"))
  }

  private val qDuplicatePaymentsSql =
    """WITH p AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
      |    epoch_us(ts) // 600000000 AS b
      |  FROM events WHERE event_type = 'purchase'),
      |l AS (
      |  SELECT user_id, event_id AS id_a, us AS us_a,
      |    v_micro AS v_a, CAST(u.jb AS BIGINT) AS jb
      |  FROM p CROSS JOIN unnest([b - 1, b, b + 1]) AS u(jb))
      |SELECT l.user_id, id_a, r.event_id AS id_b, v_a,
      |  r.v_micro AS v_b, abs(r.us - us_a) AS gap_us
      |FROM l JOIN p r ON r.user_id = l.user_id AND r.b = l.jb
      |WHERE id_a < r.event_id AND abs(r.us - us_a) <= 600000000
      |ORDER BY l.user_id, id_a, id_b""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q145_stream_dedup_wm" -> QueryDef(qStreamDedupWm, Some(qStreamDedupWmSql),
      "built-in dropDuplicatesWithinWatermark == batch distinct " +
        "(cross-batch arrival-skew duplicates dropped)"),
    "q146_k_anonymity" -> QueryDef(qKAnonymity, Some(qKAnonymitySql),
      "k-anonymity / l-diversity audit over QI groups, integer cents bands"),
    "q147_clustering_coeff" -> QueryDef(qClusteringCoeff,
      Some(qClusteringCoeffSql),
      "per-node local clustering coefficient on the LSH candidate graph"),
    "q148_bool_search" -> QueryDef(qBoolSearch, Some(qBoolSearchSql),
      "boolean inverted-index retrieval (AND/AND/NOT posting algebra)"),
    "q149_hof_array_stats" -> QueryDef(qHofArrayStats, Some(qHofArrayStatsSql),
      "higher-order-function array analytics, codegen lambdas, 2^10 grid"),
    "q150_cusum_changepoint" -> QueryDef(qCusum, Some(qCusumSql),
      "CUSUM change-point detection, prefix-min closed form, pure BIGINT"),
    "q151_ivm_join_view" -> QueryDef(qIvmJoinView, Some(qIvmJoinViewSql),
      "incremental join-view maintenance: partial-DECIMAL delta merge " +
        "== full recompute"),
    "q152_stream_ivm" -> QueryDef(qStreamIvm, Some(qIvmJoinViewSql),
      "streaming continuous join-view maintenance == batch q151 " +
        "(versioned partial-DECIMAL state folds)"),
    "q153_interpolate" -> QueryDef(qInterpolate, Some(qInterpolateSql),
      "linear gap interpolation via two IGNORE-NULLS window walks, " +
        "integer micro grid"),
    "q154_winsorize" -> QueryDef(qWinsorize, Some(qWinsorizeSql),
      "winsorized robust mean, nearest-rank integer percentiles"),
    "q155_rank_fusion" -> QueryDef(qRankFusion, Some(qRankFusionSql),
      "reciprocal-rank fusion of two per-group rankings, integer RRF"),
    "q156_markov_accuracy" -> QueryDef(qMarkovAccuracy,
      Some(qMarkovAccuracySql),
      "first-order Markov next-event predictor + in-sample ppm accuracy"),
    "q157_benford" -> QueryDef(qBenford, Some(qBenfordSql),
      "Benford's-law first-digit screen on exact cents, literal " +
        "expected ppm"),
    "q158_stream_outer_join" -> QueryDef(qStreamOuterJoin,
      Some(qStreamOuterJoinSql),
      "stream-stream LEFT OUTER interval join == batch left join " +
        "(sentinel-flushed watermark completeness)"),
    "q159_rolling_median" -> QueryDef(qRollingMedian,
      Some(qRollingMedianSql),
      "rolling 24-row nearest-rank median (windowed collect/sort/index)"),
    "q160_chi_square" -> QueryDef(qChiSquare, Some(qChiSquareSql),
      "chi-square contingency audit in exact DECIMAL(38)/HUGEINT micro"),
    "q161_pareto_frontier" -> QueryDef(qParetoFrontier,
      Some(qParetoFrontierSql),
      "Pareto frontier per group via bounded length-alphabet windows"),
    "q162_integer_zscore" -> QueryDef(qIntegerZscore, Some(qIntegerZscoreSql),
      "integer-exact z-scores via the graft_isqrt codegen expression"),
    "q163_decile_drift" -> QueryDef(qDecileDrift, Some(qDecileDriftSql),
      "KS-style decile drift audit between md5 corpus halves"),
    "q164_copurchase" -> QueryDef(qCoPurchase, Some(qCoPurchaseSql),
      "item-item co-purchase neighbors: support-pruned exact-ppm lift, " +
        "top-5 per anchor"),
    "q165_key_skew_gini" -> QueryDef(qKeySkewGini, Some(qKeySkewGiniSql),
      "Gini key-skew report from the bounded size histogram, exact ppm"),
    "q166_table_fingerprint" -> QueryDef(qTableFingerprint,
      Some(qTableFingerprintSql),
      "additive order-independent table fingerprint (reconciliation)"),
    "q167_malformed_routing" -> QueryDef(qMalformedRouting,
      Some(qMalformedRoutingSql),
      "malformed-JSON routing: PERMISSIVE parse, DLQ counts, good-row agg"),
    "q168_integer_quantiles" -> QueryDef(qIntegerQuantiles,
      Some(qIntegerQuantilesSql),
      "interpolated quantiles in pure BIGINT micro (float-free p*(n-1))"),
    "q169_bitmap_intersect" -> QueryDef(qBitmapIntersect,
      Some(qBitmapIntersectSql),
      "bitmap-word set intersection: bit_or words + popcount AND join, " +
        "exact distinct-both counts, 32x-compressed join"),
    "q170_quantile_normalize" -> QueryDef(qQuantileNormalize,
      Some(qQuantileNormalizeSql),
      "quantile normalization via bounded value-alphabet histogram " +
        "(global ranks, no global sort)"),
    "q171_sla_fill_rate" -> QueryDef(qSlaFillRate, Some(qSlaFillRateSql),
      "order-fulfillment SLA: bool_and all-items predicate, integer " +
        "day arithmetic, ppm"),
    "q172_stream_complete_agg" -> QueryDef(qStreamCompleteAgg,
      Some(qStreamCompleteAggSql),
      "Complete-output-mode streaming aggregate == batch (closes the " +
        "output-mode matrix)"),
    "q173_weighted_median" -> QueryDef(qWeightedMedian,
      Some(qWeightedMedianSql),
      "weighted median by token mass (running-weight window, BIGINT)"),
    "q174_sliding_distinct" -> QueryDef(qSlidingDistinct,
      Some(qSlidingDistinctSql),
      "exact trailing-24h distinct users via bitmap-word contribution " +
        "explode (no HLL, no window rescans)"),
    "q175_apportion" -> QueryDef(qApportion, Some(qApportionSql),
      "largest-remainder budget apportionment (Hamilton method, " +
        "quotas provably sum to the budget)"),
    "q176_stratified_lift" -> QueryDef(qStratifiedLift,
      Some(qStratifiedLiftSql),
      "A/B stratified-lift audit with pooled row (Simpson's-paradox " +
        "guard, exact ppm)"),
    "q177_deterministic_mode" -> QueryDef(qDeterministicMode,
      Some(qDeterministicModeSql),
      "deterministic group-wise mode (explicit tie rule — the native " +
        "mode() tie-break is engine-defined)"),
    "q178_streaks" -> QueryDef(qStreaks, Some(qStreaksSql),
      "gaps-and-islands: consecutive-day activity streaks via the " +
        "rn-difference device, bounded histogram"),
    "q179_strict_funnel" -> QueryDef(qStrictFunnel, Some(qStrictFunnelSql),
      "strict ordered 3-step funnel (stage-chained conditional mins, " +
        "no event-by-event self-join)"),
    "q180_cohort_ltv" -> QueryDef(qCohortLtv, Some(qCohortLtvSql),
      "cohort LTV curves: cumulative micro value per signup week by " +
        "offset (bounded grid window)"),
    "q181_rfm_segments" -> QueryDef(qRfmSegments, Some(qRfmSegmentsSql),
      "RFM segmentation: deterministic ntile quartile codes, value " +
        "share per segment"),
    "q182_seasonal_resid" -> QueryDef(qSeasonalResiduals,
      Some(qSeasonalResidualsSql),
      "seasonal-baseline residual anomalies (dow x hod profile, " +
        "deseasonalized top-20)"),
    "q183_duplicate_payments" -> QueryDef(qDuplicatePayments,
      Some(qDuplicatePaymentsSql),
      "rapid-repeat purchase screen: banded (user, 10-min bucket) " +
        "self-join, exactly-once pairs, micro-exact amounts"))
}
