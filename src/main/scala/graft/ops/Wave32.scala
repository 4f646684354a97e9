package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import Tables.load

/** Thirty-second wave (round 9): the native KMV sketch composed in a
  * JOIN — the follow-on the round-8 verdict asked for on top of q252's
  * single-table form.
  *
  *  - q258: per-year sketch-intersection Jaccard between two keyed
  *    corpora (parts shipped under returnflag 'R' vs 'A'), written in
  *    PURE SQL over the engine's `graft_kmv` aggregate: two GROUP BY
  *    branches build one ≤64-element sketch per (year, corpus) — the
  *    mergeable one-pass production shape — and the branches JOIN on
  *    the year key, where the pooled-minima estimator (θ = k-th
  *    smallest of the union pool, K_∩/k Jaccard) is plain SQL on the
  *    exploded sketch arrays. q241 proved this estimator
  *    compositionally on one global pair; q252 proved the native
  *    aggregate element-exact per group; this gates the two together
  *    through a join, per element: every pooled hash ships in
  *    `pool_str` ('|'-joined with membership flags — atomic-schema
  *    contract), so the DuckDB oracle (emulating the sketch as
  *    `(array_agg(DISTINCT h ORDER BY h))[1:k]`) re-derives the entire
  *    pool, not just the estimates. The exact per-year intersection
  *    runs beside for the error columns — at 100 TB that exact branch
  *    is the one you delete; the sketch side moves ≤64 values per
  *    (year, corpus) through the shuffle.
  *
  * Scale shape: windows PARTITION BY year over ≤128-row pools;
  * `collect_list` bounded by the same 128; the year⋈year joins are
  * alphabet-sized. Inner join keeps the years where BOTH corpora
  * exist (flags R/A die out after 1995 in TPC-H-shaped data —
  * deterministic either way). */
object Wave32 {

  private val K = 64
  private val M = 2147483648L

  private def qKmvJaccardJoin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.KmvSketch.register(s) // idempotent; host sessions too
    load(s, dir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_returnflag")
        .isin("R", "A"))
      .selectExpr(
        "CAST(year(l_shipdate) AS BIGINT) AS yr",
        "l_returnflag AS flag",
        "((l_partkey % 1000000007) * 2654435761) % 2147483648 AS h",
        "l_partkey")
      .createOrReplaceTempView("graft_q258_items")
    s.sql(s"""
      |WITH r AS (
      |  SELECT yr, graft_kmv(h, $K) AS sk,
      |    COUNT(DISTINCT l_partkey) AS n_exact
      |  FROM graft_q258_items WHERE flag = 'R' GROUP BY yr),
      |a AS (
      |  SELECT yr, graft_kmv(h, $K) AS sk,
      |    COUNT(DISTINCT l_partkey) AS n_exact
      |  FROM graft_q258_items WHERE flag = 'A' GROUP BY yr),
      |ex AS (
      |  SELECT yr, COUNT(*) AS exact_inter FROM (
      |    SELECT yr, l_partkey FROM graft_q258_items WHERE flag = 'R'
      |    INTERSECT
      |    SELECT yr, l_partkey FROM graft_q258_items WHERE flag = 'A')
      |  GROUP BY yr),
      |pool AS (
      |  SELECT yr, h, MAX(in_r) AS in_r, MAX(in_a) AS in_a FROM (
      |    SELECT yr, explode(sk) AS h, 1L AS in_r, 0L AS in_a FROM r
      |    UNION ALL
      |    SELECT yr, explode(sk) AS h, 0L AS in_r, 1L AS in_a FROM a) u
      |  GROUP BY yr, h),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY yr ORDER BY h) AS rn
      |  FROM pool),
      |sk AS (
      |  SELECT yr, COUNT(*) AS pool_n,
      |    MAX(CASE WHEN rn <= $K THEN h END) AS theta,
      |    SUM(CASE WHEN rn <= $K THEN 1L ELSE 0L END) AS d_n,
      |    SUM(CASE WHEN rn <= $K THEN in_r * in_a ELSE 0L END) AS common,
      |    array_join(array_sort(collect_list(
      |      concat(h, ':', in_r, ':', in_a))), '|') AS pool_str
      |  FROM ranked GROUP BY yr)
      |SELECT sk.yr AS yr, pool_n, theta, d_n, common,
      |  CASE WHEN pool_n >= $K THEN (${K - 1} * ${M}L) div theta
      |    ELSE pool_n END AS est_union,
      |  r.n_exact + a.n_exact - coalesce(ex.exact_inter, 0L) AS exact_union,
      |  CASE WHEN d_n = 0 THEN 0L ELSE (common * (CASE WHEN pool_n >= $K
      |    THEN (${K - 1} * ${M}L) div theta ELSE pool_n END)) div d_n
      |    END AS est_inter,
      |  coalesce(ex.exact_inter, 0L) AS exact_inter,
      |  CASE WHEN d_n = 0 THEN 0L ELSE common * 1000000 div d_n
      |    END AS jacc_est_ppm,
      |  CASE WHEN r.n_exact + a.n_exact - coalesce(ex.exact_inter, 0L) = 0
      |    THEN 0L ELSE coalesce(ex.exact_inter, 0L) * 1000000
      |    div (r.n_exact + a.n_exact - coalesce(ex.exact_inter, 0L))
      |    END AS jacc_exact_ppm,
      |  pool_str
      |FROM sk
      |JOIN r ON r.yr = sk.yr
      |JOIN a ON a.yr = sk.yr
      |LEFT JOIN ex ON ex.yr = sk.yr
      |ORDER BY yr""".stripMargin)
  }

  private val qKmvJaccardJoinSql =
    s"""WITH items AS (
       |  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
       |    l_returnflag AS flag,
       |    ((l_partkey % 1000000007) * 2654435761) % 2147483648 AS h,
       |    l_partkey
       |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
       |r AS (
       |  SELECT yr, (array_agg(DISTINCT h ORDER BY h))[1:$K] AS sk,
       |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
       |  FROM items WHERE flag = 'R' GROUP BY yr),
       |a AS (
       |  SELECT yr, (array_agg(DISTINCT h ORDER BY h))[1:$K] AS sk,
       |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact
       |  FROM items WHERE flag = 'A' GROUP BY yr),
       |ex AS (
       |  SELECT yr, CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
       |    SELECT yr, l_partkey FROM items WHERE flag = 'R'
       |    INTERSECT
       |    SELECT yr, l_partkey FROM items WHERE flag = 'A') i
       |  GROUP BY yr),
       |pu AS (
       |  SELECT yr, u.h AS h, 1 AS in_r, 0 AS in_a
       |  FROM r, unnest(sk) AS u(h)
       |  UNION ALL
       |  SELECT yr, u.h, 0, 1 FROM a, unnest(sk) AS u(h)),
       |pool AS (
       |  SELECT yr, h, MAX(in_r) AS in_r, MAX(in_a) AS in_a
       |  FROM pu GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY yr ORDER BY h) AS rn
       |  FROM pool),
       |sk2 AS (
       |  SELECT yr, CAST(COUNT(*) AS BIGINT) AS pool_n,
       |    CAST(MAX(CASE WHEN rn <= $K THEN h END) AS BIGINT) AS theta,
       |    CAST(SUM(CASE WHEN rn <= $K THEN 1 ELSE 0 END) AS BIGINT)
       |      AS d_n,
       |    CAST(SUM(CASE WHEN rn <= $K THEN in_r * in_a ELSE 0 END)
       |      AS BIGINT) AS common,
       |    string_agg(h || ':' || in_r || ':' || in_a, '|'
       |      ORDER BY h || ':' || in_r || ':' || in_a) AS pool_str
       |  FROM ranked GROUP BY yr)
       |SELECT sk2.yr AS yr, pool_n, theta, d_n, common,
       |  CAST(CASE WHEN pool_n >= $K THEN (${K - 1} * $M) // theta
       |    ELSE pool_n END AS BIGINT) AS est_union,
       |  r.n_exact + a.n_exact - coalesce(ex.exact_inter, 0)
       |    AS exact_union,
       |  CAST(CASE WHEN d_n = 0 THEN 0 ELSE (common * (CASE WHEN
       |    pool_n >= $K THEN (${K - 1} * $M) // theta ELSE pool_n END))
       |    // d_n END AS BIGINT) AS est_inter,
       |  coalesce(ex.exact_inter, 0) AS exact_inter,
       |  CAST(CASE WHEN d_n = 0 THEN 0 ELSE common * 1000000 // d_n
       |    END AS BIGINT) AS jacc_est_ppm,
       |  CAST(CASE WHEN r.n_exact + a.n_exact
       |      - coalesce(ex.exact_inter, 0) = 0 THEN 0
       |    ELSE coalesce(ex.exact_inter, 0) * 1000000
       |    // (r.n_exact + a.n_exact - coalesce(ex.exact_inter, 0))
       |    END AS BIGINT) AS jacc_exact_ppm,
       |  pool_str
       |FROM sk2
       |JOIN r ON r.yr = sk2.yr
       |JOIN a ON a.yr = sk2.yr
       |LEFT JOIN ex ON ex.yr = sk2.yr
       |ORDER BY yr""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q258_kmv_jaccard_join" -> QueryDef(qKmvJaccardJoin,
      Some(qKmvJaccardJoinSql),
      "per-year sketch-intersection Jaccard via graft_kmv in pure SQL, " +
        "every pooled element oracle-gated"))
}
