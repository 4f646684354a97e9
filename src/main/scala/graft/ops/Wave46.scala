package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Forty-sixth wave (round 10): two optimizer/profiler-grade planning
  * operators —
  *
  *  - q289: JOIN-CARDINALITY ESTIMATION AUDIT — the question a planner
  *    (or the strongEdges device) asks BEFORE paying for a self-join:
  *    how many rows will `lineitem ⋈ lineitem ON l_orderkey` produce?
  *    Truth is the second frequency moment F₂ = Σ w(o)² (computable in
  *    one keyed pass — that is itself the full-stats planner answer).
  *    Audited against it: (a) the textbook UNIFORMITY estimate n²/d
  *    (what a catalog with only row/NDV stats gives), and (b) a
  *    KMV-SAMPLED estimate — the k smallest key hashes are a
  *    deterministic uniform sample of the DISTINCT keys, so
  *    d_est · mean(w² over sampled keys) estimates F₂ from a 64-key
  *    probe (the AMS-style sampled moment, exactly replayable in SQL
  *    because the sample is order-statistics, not random). Output:
  *    one row per method with signed error ppm — the measured case
  *    for carrying frequency sketches in table stats at 100 TB.
  *  - q290: FOREIGN-KEY DISCOVERY (inclusion dependencies) — the
  *    Metanome/SPIDER-class profiling pass: for each candidate
  *    child→parent column pair, distinct-value containment ppm,
  *    parent-side uniqueness, and parent coverage ppm. The stated
  *    candidate list includes a deliberate FALSE-POSITIVE control
  *    (l_suppkey → p_partkey: containment is total because small int
  *    domains nest, the classic inclusion-dependency trap) — the
  *    coverage column is what separates it from the real FKs, and the
  *    gate pins that separation cross-engine.
  *
  * Scale shapes: q289 is two keyed aggregates + a 64-row broadcast
  * probe; q290 is per-edge distinct aggregates + semi-join-shaped
  * distinct intersections — every join on a key column, nothing
  * pairwise. */
object Wave46 {

  // ------------------------------------------------------------- q289

  private val JcK = 64

  private def qJoinCardinality(s: SparkSession, dir: String): DataFrame = {
    val w = graft.util.Pin(load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("w"))
      .withColumn("h", expr(
        "((l_orderkey % 1000000007) * 2654435761) % 2147483648")))
    val stats = w.agg(
      sum(col("w")).as("n_rows"),
      count(lit(1)).as("d_keys"),
      sum((col("w") * col("w")).cast(DecimalType(38, 0)))
        .cast(LongType).as("f2_exact"))
    // deterministic 64-key sample: the k smallest key hashes (the KMV
    // order-statistics sample — uniform over DISTINCT keys)
    val sample = w.orderBy(col("h").asc, col("l_orderkey").asc)
      .limit(JcK)
      .agg(sum((col("w") * col("w")).cast(DecimalType(38, 0)))
          .cast(LongType).as("s_w2"),
        max(col("h")).as("h_k"))
    val est = stats.crossJoin(broadcast(sample)) // one-row probe stats
      .withColumn("d_est", expr(
        s"CAST((${JcK - 1} * 2147483648) div h_k AS BIGINT)"))
      .withColumn("est_uniform", expr(
        "CAST(CAST(n_rows AS DECIMAL(38,0)) * n_rows div d_keys AS BIGINT)"))
      .withColumn("est_kmv", expr(
        s"CAST(CAST(d_est AS DECIMAL(38,0)) * s_w2 div $JcK AS BIGINT)"))
    val methods = Seq(
      ("exact_f2", "f2_exact"),
      ("uniformity", "est_uniform"),
      ("kmv_sampled", "est_kmv"))
    methods.map { case (name, c) =>
      est.select(lit(name).as("method"), col(c).as("estimate"),
        col("f2_exact").as("actual"),
        expr(s"($c - f2_exact) * 1000000 div f2_exact").as("err_ppm"))
    }.reduce(_ unionByName _).orderBy(col("method"))
  }

  private val qJoinCardinalitySql =
    s"""WITH w AS MATERIALIZED (
       |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS w,
       |    ((l_orderkey % 1000000007) * 2654435761) % 2147483648 AS h
       |  FROM lineitem GROUP BY 1),
       |st AS (
       |  SELECT CAST(SUM(w) AS BIGINT) AS n_rows,
       |    CAST(COUNT(*) AS BIGINT) AS d_keys,
       |    CAST(SUM(CAST(w AS HUGEINT) * w) AS BIGINT) AS f2_exact
       |  FROM w),
       |sm AS (
       |  SELECT CAST(SUM(CAST(w AS HUGEINT) * w) AS BIGINT) AS s_w2,
       |    MAX(h) AS h_k
       |  FROM (SELECT * FROM w ORDER BY h, l_orderkey LIMIT $JcK)),
       |e AS (
       |  SELECT st.*, sm.*,
       |    CAST((${JcK - 1} * 2147483648) // h_k AS BIGINT) AS d_est,
       |    CAST(CAST(n_rows AS HUGEINT) * n_rows // d_keys AS BIGINT)
       |      AS est_uniform
       |  FROM st, sm),
       |e2 AS (
       |  SELECT *, CAST(CAST(d_est AS HUGEINT) * s_w2 // $JcK AS BIGINT)
       |    AS est_kmv FROM e)
       |SELECT method, estimate, actual,
       |  CAST((estimate - actual) * 1000000 // actual AS BIGINT)
       |    AS err_ppm
       |FROM (
       |  SELECT 'exact_f2' AS method, f2_exact AS estimate,
       |    f2_exact AS actual FROM e2
       |  UNION ALL SELECT 'uniformity', est_uniform, f2_exact FROM e2
       |  UNION ALL SELECT 'kmv_sampled', est_kmv, f2_exact FROM e2)
       |ORDER BY method""".stripMargin

  // ------------------------------------------------------------- q290

  /** (edge id, child table, child col, parent table, parent col).
    * The last row is the deliberate false-positive control. */
  private val FkCandidates = Seq(
    ("li_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("li_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("li_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_cust", "orders", "o_custkey", "customer", "c_custkey"),
    ("cust_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supp_as_part_CTRL", "lineitem", "l_suppkey", "part", "p_partkey"))

  private def qFkDiscovery(s: SparkSession, dir: String): DataFrame = {
    val edges = FkCandidates.map {
      case (id, ct, cc, pt, pc) =>
        val child = load(s, dir, ct)
          .select(col(cc).cast(LongType).as("v")).distinct()
        val parent = load(s, dir, pt)
          .select(col(pc).cast(LongType).as("v"))
        val pStats = parent.agg(count(lit(1)).as("p_rows"),
          countDistinct(col("v")).as("p_distinct"))
        val shared = child.join(parent.distinct(), Seq("v"), "left_semi")
          .agg(count(lit(1)).as("d_shared"))
        val dChild = child.agg(count(lit(1)).as("d_child"))
        dChild.crossJoin(broadcast(shared)) // one-row per-edge scalars
          .crossJoin(broadcast(pStats))
          .select(lit(id).as("edge"),
            col("d_child"), col("d_shared"),
            expr("d_shared * 1000000 div d_child").as("containment_ppm"),
            (col("p_rows") === col("p_distinct")).as("parent_unique"),
            expr("d_shared * 1000000 div p_distinct").as("coverage_ppm"))
          .withColumn("is_fk_candidate",
            col("containment_ppm") === 1000000L && col("parent_unique"))
    }
    edges.reduce(_ unionByName _).orderBy(col("edge"))
  }

  private val qFkDiscoverySql = {
    val rows = FkCandidates.map { case (id, ct, cc, pt, pc) =>
      s"""SELECT '$id' AS edge,
         |  (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $ct)
         |    AS d_child,
         |  (SELECT CAST(COUNT(DISTINCT c.$cc) AS BIGINT) FROM $ct c
         |     WHERE c.$cc IN (SELECT $pc FROM $pt)) AS d_shared,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $pt) AS p_rows,
         |  (SELECT CAST(COUNT(DISTINCT $pc) AS BIGINT) FROM $pt)
         |    AS p_distinct""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT edge, d_child, d_shared,
       |  CAST(d_shared * 1000000 // d_child AS BIGINT)
       |    AS containment_ppm,
       |  p_rows = p_distinct AS parent_unique,
       |  CAST(d_shared * 1000000 // p_distinct AS BIGINT)
       |    AS coverage_ppm,
       |  d_shared * 1000000 // d_child = 1000000
       |    AND p_rows = p_distinct AS is_fk_candidate
       |FROM ($rows)
       |ORDER BY edge""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q289_join_cardinality" -> QueryDef(qJoinCardinality,
      Some(qJoinCardinalitySql),
      "join-cardinality (F2) estimation audit: exact second moment vs " +
        "the uniformity estimate n^2/d vs a deterministic KMV-sampled " +
        "moment; signed error ppm per method"),
    "q290_fk_discovery" -> QueryDef(qFkDiscovery, Some(qFkDiscoverySql),
      "foreign-key discovery by inclusion dependency: containment ppm " +
        "+ parent uniqueness + parent coverage per candidate edge, " +
        "with a deliberate nested-domain false-positive control"))
}
