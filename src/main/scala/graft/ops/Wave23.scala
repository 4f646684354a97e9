package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-third wave (round 8): data-contract auditing and sketched set
  * arithmetic — three operators a training-data platform runs constantly:
  *
  *  - q239: FUNCTIONAL-DEPENDENCY VIOLATION audit. "Does l_partkey
  *    determine l_suppkey?" answered not as a boolean but as a repair
  *    plan: per violating key, how many rows disagree with the majority
  *    right-hand side (the minimum edits to restore the FD).
  *  - q240: STRATIFIED K-FOLD assignment. Deterministic arithmetic-hash
  *    folds (no RNG — re-runnable anywhere), audited per fold against
  *    the global language mix in exact ppm.
  *  - q241: KMV (k-minimum-values) DISTINCT-INTERSECTION sketch. The
  *    sketch estimate AND the exact answer side by side, with the same
  *    LCG hash emulated in the DuckDB oracle, so the estimator itself —
  *    not just its inputs — is oracle-gated. At 100 TB the exact branch
  *    is the one you delete; the sketch reads k=64 values per set.
  *
  * House rules: integer exactness (counts/ppm), deterministic orders,
  * DuckDB oracle per query, windows partitioned or provably bounded. */
object Wave23 {

  // ------------------------------------------------------------- q239

  /** q239: FD violation audit for the candidate dependency
    * l_partkey → l_suppkey. One map-side-combinable groupBy builds the
    * (lhs, rhs) contingency; a second groupBy folds it per key into
    * row count, distinct right-hand sides, and the majority-rhs row
    * count; `repair_rows = n_rows - majority_rows` is the classic
    * minimal-repair distance. Top-20 worst keys via TakeOrdered —
    * never a global sort. */
  private def qFdViolations(s: SparkSession, dir: String): DataFrame = {
    val pairs = load(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("supp"))
      .agg(count(lit(1)).as("cnt"))
    pairs.groupBy(col("partkey"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_suppliers"),
        max(col("cnt")).as("majority_rows"))
      .filter(col("n_suppliers") > 1)
      .select(col("partkey"), col("n_rows"), col("n_suppliers"),
        col("majority_rows"),
        (col("n_rows") - col("majority_rows")).as("repair_rows"))
      .orderBy(col("repair_rows").desc, col("n_suppliers").desc,
        col("partkey"))
      .limit(20)
  }

  private val qFdViolationsSql =
    """WITH pairs AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS supp,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |per_key AS (
      |  SELECT partkey, CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |    CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |    CAST(MAX(cnt) AS BIGINT) AS majority_rows
      |  FROM pairs GROUP BY 1)
      |SELECT partkey, n_rows, n_suppliers, majority_rows,
      |  n_rows - majority_rows AS repair_rows
      |FROM per_key WHERE n_suppliers > 1
      |ORDER BY repair_rows DESC, n_suppliers DESC, partkey
      |LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q240

  /** Deterministic fold hash: an LCG over the id folded into [0, 2^31),
    * with the id first reduced mod the prime 1,000,000,007 so the
    * multiply can never overflow a 64-bit long even on key-shifted
    * scale-ladder ids ((p−1)·1103515245 ≈ 1.1e18 < 2^63). The prime
    * exceeds every key cardinality through sf100, so the reduction is
    * collision-free at all specified scales. The fold takes the HIGH
    * three bits (div 2^28), not the low ones — LCG low bits cycle. */
  private val FoldK = 8L

  /** q240: STRATIFIED K-FOLD audit. Every doc gets a deterministic fold
    * in [0,8); the report compares each fold's language mix against the
    * global mix in exact ppm. Shapes: one groupBy to the (fold, lang)
    * grid (≤ 8×#langs rows), a fold-partitioned window for fold totals,
    * and a broadcast join of the #langs-row global shares. A skewed
    * dev_ppm column is the signal a fold split leaks distribution. */
  private def qStratifiedFolds(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .withColumn("fold",
        expr("((doc_id % 1000000007) * 1103515245 + 12345) % 2147483648 div 268435456"))
    val grid = docs.groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n"))
    val globalLang = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("gn"))
      // one row per language: alphabet-bounded (PlanAuditSpec allow-list)
      .withColumn("total", sum(col("gn")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("lang"), expr("gn * 1000000 div total")
        .as("global_share_ppm"))
    grid.withColumn("fold_n", sum(col("n")).over(
        Window.partitionBy(col("fold"))))
      .withColumn("fold_share_ppm", expr("n * 1000000 div fold_n"))
      .join(broadcast(globalLang), Seq("lang"))
      .select(col("fold"), col("lang"), col("n"), col("fold_n"),
        col("fold_share_ppm"), col("global_share_ppm"),
        (col("fold_share_ppm") - col("global_share_ppm")).as("dev_ppm"))
      .orderBy(col("fold"), col("lang"))
  }

  private val qStratifiedFoldsSql =
    """WITH d AS (
      |  SELECT lang,
      |    ((doc_id % 1000000007) * 1103515245 + 12345) % 2147483648
      |      // 268435456 AS fold
      |  FROM documents),
      |grid AS (
      |  SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM d GROUP BY 1, 2),
      |g AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS gn FROM d GROUP BY 1),
      |gs AS (
      |  SELECT lang, gn * 1000000 // (SELECT COUNT(*) FROM d)
      |    AS global_share_ppm FROM g)
      |SELECT fold, grid.lang, n,
      |  CAST(SUM(n) OVER (PARTITION BY fold) AS BIGINT) AS fold_n,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY fold) AS BIGINT)
      |    AS fold_share_ppm,
      |  global_share_ppm,
      |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY fold)
      |    - global_share_ppm AS BIGINT) AS dev_ppm
      |FROM grid JOIN gs ON gs.lang = grid.lang
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------- q241

  /** KMV parameters: k minimum values per set, hash range [0, 2^31). */
  private val KmvK = 64L
  private val KmvM = 2147483648L

  /** q241: KMV DISTINCT-INTERSECTION estimate, oracle-gated. Sets: the
    * distinct part keys shipped under returnflag 'R' vs 'A'. Each set's
    * sketch is its k=64 smallest distinct LCG hashes — `orderBy(h)
    * .limit(k)` compiles to distributed TakeOrdered, so building a
    * sketch reads the set once and moves 64 values. The two sketches
    * meet in a ≤128-row pool where θ (the k-th smallest), the matched
    * count, and the estimates are plain arithmetic; the exact
    * intersection runs beside it for the error column. The hash is an
    * overflow-safe LCG both engines compute identically, so the
    * ESTIMATOR is hash-compared against DuckDB, not just trusted. */
  private def qKmvIntersect(s: SparkSession, dir: String): DataFrame = {
    // One pass over lineitem to per-part membership flags: everything
    // downstream (both sketches AND the exact answer) derives from this
    // single #parts-row frame — the fact table is scanned exactly once.
    val flags = load(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .groupBy(col("l_partkey").as("x"))
      .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("fa"),
        max(when(col("l_returnflag") === "A", 1L).otherwise(0L))
          .as("fb"))
      .withColumn("h", expr("((x % 1000000007) * 2654435761) % 2147483648"))
    val pinned = graft.util.Pin(flags) // consumed 3×: two sketches + exact
    def sketchOf(flag: String, inA: Long) =
      pinned.filter(col(flag) === 1L).select(col("h")).distinct()
        .orderBy(col("h")).limit(KmvK.toInt)
        .withColumn("in_a", lit(inA)).withColumn("in_b", lit(1L - inA))
    val sA = sketchOf("fa", 1L)
    val sB = sketchOf("fb", 0L)
    // pool: ≤ 2k = 128 rows; the global window below is bounded by that.
    val pool = sA.unionByName(sB).groupBy(col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    // ≤128-row input: bounded global window (PlanAuditSpec allow-list)
    val ranked = pool.withColumn("rn",
      row_number().over(Window.orderBy(col("h"))))
    val sketch = ranked.agg(
      count(lit(1)).as("pool_n"),
      max(when(col("rn") <= KmvK, col("h"))).as("theta"),
      sum(when(col("rn") <= KmvK, lit(1L)).otherwise(lit(0L))).as("d_n"),
      sum(when(col("rn") <= KmvK, col("in_a") * col("in_b"))
        .otherwise(lit(0L))).as("common"))
    val exact = pinned.agg(
        coalesce(sum(col("fa")), lit(0L)).as("n_a"),
        coalesce(sum(col("fb")), lit(0L)).as("n_b"),
        coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_inter"))
      .select(col("n_a"), col("n_b"), col("exact_inter"),
        (col("n_a") + col("n_b") - col("exact_inter")).as("exact_union"))
    // d_n = 0 (both input sets empty) guards: ANSI div would throw.
    sketch.crossJoin(broadcast(exact)) // two one-row frames
      .select(
        lit(KmvK).as("k"), col("pool_n"), col("theta"), col("common"),
        expr(s"CASE WHEN pool_n >= $KmvK THEN (${KmvK - 1} * ${KmvM}L)" +
          s" div theta ELSE pool_n END").as("est_union"),
        col("exact_union"),
        expr(s"CASE WHEN d_n = 0 THEN 0 ELSE (common * (CASE WHEN " +
          s"pool_n >= $KmvK THEN (${KmvK - 1} * ${KmvM}L) div theta " +
          s"ELSE pool_n END)) div d_n END").as("est_inter"),
        col("exact_inter"),
        expr("CASE WHEN d_n = 0 THEN 0 ELSE common * 1000000 div d_n END")
          .as("jacc_est_ppm"),
        expr("CASE WHEN exact_union = 0 THEN 0 ELSE " +
          "exact_inter * 1000000 div exact_union END").as("jacc_exact_ppm"))
  }

  private val qKmvIntersectSql =
    s"""WITH a AS (
       |  SELECT DISTINCT ((l_partkey % 1000000007) * 2654435761)
       |    % 2147483648 AS h
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |b AS (
       |  SELECT DISTINCT ((l_partkey % 1000000007) * 2654435761)
       |    % 2147483648 AS h
       |  FROM lineitem WHERE l_returnflag = 'A'),
       |sa AS (SELECT h FROM a ORDER BY h LIMIT $KmvK),
       |sb AS (SELECT h FROM b ORDER BY h LIMIT $KmvK),
       |pool AS (
       |  SELECT h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
       |    SELECT h, 1 AS in_a, 0 AS in_b FROM sa
       |    UNION ALL SELECT h, 0, 1 FROM sb) u GROUP BY 1),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY h) AS rn FROM pool),
       |sk AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS pool_n,
       |    CAST(MAX(CASE WHEN rn <= $KmvK THEN h END) AS BIGINT) AS theta,
       |    CAST(SUM(CASE WHEN rn <= $KmvK THEN 1 ELSE 0 END) AS BIGINT)
       |      AS d_n,
       |    CAST(SUM(CASE WHEN rn <= $KmvK THEN in_a * in_b ELSE 0 END)
       |      AS BIGINT) AS common
       |  FROM ranked),
       |ex AS (
       |  SELECT
       |    CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
       |      WHERE l_returnflag = 'R') AS BIGINT) AS n_a,
       |    CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
       |      WHERE l_returnflag = 'A') AS BIGINT) AS n_b,
       |    CAST((SELECT COUNT(*) FROM (
       |      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag='R'
       |      INTERSECT
       |      SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag='A')
       |      ) AS BIGINT) AS exact_inter)
       |SELECT CAST($KmvK AS BIGINT) AS k, pool_n, theta, common,
       |  CASE WHEN pool_n >= $KmvK
       |    THEN (${KmvK - 1} * $KmvM) // theta ELSE pool_n END AS est_union,
       |  n_a + n_b - exact_inter AS exact_union,
       |  CASE WHEN d_n = 0 THEN 0 ELSE
       |    (common * (CASE WHEN pool_n >= $KmvK
       |      THEN (${KmvK - 1} * $KmvM) // theta ELSE pool_n END)) // d_n
       |    END AS est_inter,
       |  exact_inter,
       |  CASE WHEN d_n = 0 THEN 0
       |    ELSE common * 1000000 // d_n END AS jacc_est_ppm,
       |  CASE WHEN n_a + n_b - exact_inter = 0 THEN 0
       |    ELSE exact_inter * 1000000 // (n_a + n_b - exact_inter) END
       |    AS jacc_exact_ppm
       |FROM sk, ex""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q239_fd_violations" -> QueryDef(qFdViolations, Some(qFdViolationsSql),
      "functional-dependency violation audit with minimal-repair counts"),
    "q240_stratified_folds" -> QueryDef(qStratifiedFolds,
      Some(qStratifiedFoldsSql),
      "deterministic stratified k-fold assignment + per-fold mix audit"),
    "q241_kmv_intersect" -> QueryDef(qKmvIntersect, Some(qKmvIntersectSql),
      "KMV k-minimum-values distinct-intersection sketch vs exact"))
}
