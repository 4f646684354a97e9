package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Fifty-fifth wave (round 13): the stats catalog drives MORE of the
  * plan space — the two decisions a 100-TB planner makes most often
  * after broadcast-vs-shuffle (q315), both oracle-gated end to end:
  *
  *  - q317: MCV-DRIVEN SKEW-SALTED JOIN. The q295 catalog's
  *    most-common-value tier picks the HOT join keys (frequency over
  *    `n/10` on one key); only those keys draw a spread salt on the
  *    probe side and replicate on the build side, every cold key
  *    rides salt 0 untouched ([[StatsPlanner.skewedJoinFromStats]]).
  *    The skew itself is the classic production shape: unattributed
  *    events defaulting to a sentinel account — here `error` events
  *    land on user 1, putting ~20% of the fact table on one key
  *    while every real user holds ~0.5%. The gate hash-matches the
  *    per-nation join aggregate (salting must be invisible), the
  *    detected hot-key set, AND its size — the oracle recomputes the
  *    same MCV top-K and the same `cnt > n // 10` threshold.
  *    SkewedJoinSpec pins the hot/cold plan split (hot probe rows
  *    spread over all salts, cold rows all on salt 0, build rows
  *    replicate only under hot keys, join keyed on (key, salt)).
  *
  *  - q318: CARDINALITY-DRIVEN JOIN ORDER. A 3-dim star join over
  *    lineitem is ordered by histogram-estimated dim-filter
  *    selectivity ([[StatsPlanner.orderedJoin]] — the Selinger
  *    smallest-intermediate-first rule): part `p_size > 45` (~10%)
  *    joins before supplier `s_acctbal > $4000` (~50%) before orders
  *    `o_totalprice > $80k` (~84%), so the fact stream shrinks as
  *    early as the stats allow. Spark executes joins in declaration
  *    order with CBO off (the default), so the chosen order IS the
  *    executed order — OrderedJoinSpec pins the physical join
  *    sequence and broadcast sides. The gate hash-matches each dim's
  *    estimate, ppm selectivity, POSITION, and physical-plan choice
  *    (absolute 5M-row broadcast cap, q315's) plus the joined
  *    aggregate itself.
  *
  * Scale shapes: q317's ANALYZE is one keyed aggregate + one range
  * shuffle with a B+K-row driver transfer, and the salted join is a
  * keyed equi-join whose build-side replication is bounded by
  * K·nSalts rows; q318 runs one bounded ANALYZE per dim (dims, not
  * the fact) and three keyed joins with pinned build sides. Neither
  * ever scans the fact table at plan time more than once. */
object Wave55 {

  // ------------------------------------------------------------- q317

  private val HotDiv = 10L // hot if one key holds > 10% of the table
  private val Salts = 8
  private val McvK = 4
  private val B = 16

  private def qSkewedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events").select(
      expr("CASE WHEN event_type = 'error' THEN 1 ELSE user_id END")
        .as("uid"),
      col("event_id"),
      expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("vc"))
    // the nightly-ANALYZE shape: export the catalog rows, then plan
    // from the catalog — zero plan-time scans of either join side
    val stats = StatsPlanner.exportStats(ev, "uid", B, McvK)
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val (joined, hot) = StatsPlanner.skewedJoinFromStats(
      ev, "uid", cust, "c_custkey", spread = col("event_id"),
      stats, "uid", HotDiv, Salts)
    joined
      .groupBy(col("c_nationkey").cast(LongType).as("nation"))
      .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_vc"))
      .withColumn("hot_keys", lit(hot.sorted.mkString("|")))
      .withColumn("n_hot", lit(hot.size.toLong))
      .orderBy(col("nation"))
  }

  private val qSkewedJoinSql =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE user_id END
       |      AS uid,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
       |  FROM events),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev),
       |bv AS MATERIALIZED (
       |  SELECT uid AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
       |  GROUP BY 1),
       |mcv AS (SELECT v, cnt FROM bv ORDER BY cnt DESC, v LIMIT $McvK),
       |hot AS MATERIALIZED (
       |  SELECT v FROM mcv, n WHERE cnt > n.n // $HotDiv),
       |hotagg AS (
       |  SELECT COALESCE(string_agg(CAST(v AS VARCHAR), '|' ORDER BY v),
       |      '') AS hot_keys,
       |    CAST(COUNT(*) AS BIGINT) AS n_hot
       |  FROM hot),
       |agg AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(COUNT(*) AS BIGINT) AS n_events,
       |    CAST(SUM(vc) AS BIGINT) AS sum_vc
       |  FROM ev JOIN customer ON uid = c_custkey
       |  GROUP BY 1)
       |SELECT nation, n_events, sum_vc, hot_keys, n_hot
       |FROM agg, hotagg ORDER BY nation""".stripMargin

  // ------------------------------------------------------------- q318

  private val TPart = 45L // p_size > 45: ~10% of parts
  private val TSupp = 400000L // s_acctbal > $4000.00: ~50% of suppliers
  private val TOrd = 8000000L // o_totalprice > $80,000.00: ~84% of orders
  private val Cap = 5000000L // q315's absolute broadcast row cap

  private def qOrderedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = load(s, dir, "lineitem").select(
      col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
        .as("vc"))
    val dims = Seq(
      StatsPlanner.JoinDim("part",
        load(s, dir, "part").select(col("p_partkey"), col("p_size")),
        col("l_partkey") === col("p_partkey"), "p_size", TPart),
      StatsPlanner.JoinDim("supplier",
        load(s, dir, "supplier").select(col("s_suppkey"),
          expr("CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)")
            .as("s_bal_c")),
        col("l_suppkey") === col("s_suppkey"), "s_bal_c", TSupp),
      StatsPlanner.JoinDim("orders",
        load(s, dir, "orders").select(col("o_orderkey"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
            .as("o_total_c")),
        col("l_orderkey") === col("o_orderkey"), "o_total_c", TOrd))
    val (joined, plans) = StatsPlanner.orderedJoin(fact, dims, B, Cap)
    val agg = joined.agg(count(lit(1)).as("n_joined"),
      sum(col("vc").cast(DecimalType(38, 0))).cast(LongType)
        .as("sum_vc"))
    plans.map(p => (p.pos.toLong, p.name, p.est, p.selPpm, p.plan))
      .toDF("pos", "dim_name", "est_rows", "sel_ppm", "plan_chosen")
      .crossJoin(broadcast(agg)) // one-row totals frame
      .select(col("pos"), col("dim_name"), col("est_rows"),
        col("sel_ppm"), col("plan_chosen"), col("n_joined"),
        col("sum_vc"))
      .orderBy(col("pos"))
  }

  /** One dim's histogram-estimate CTE chain (the q315 arithmetic,
    * parameterized per dim — both engines share the integer grid). */
  private def histEstCte(tag: String, srcSql: String, t: Long): String =
    s"""bv_$tag AS MATERIALIZED (
       |  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($srcSql)
       |  GROUP BY 1),
       |n_$tag AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM bv_$tag),
       |r_$tag AS (
       |  SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cum
       |  FROM bv_$tag),
       |hist_$tag AS MATERIALIZED (
       |  SELECT MIN(v) AS lo, MAX(v) AS hi,
       |    CAST(SUM(LEAST(cum, (b + 1) * n.n // $B) -
       |      GREATEST(cum - cnt, b * n.n // $B)) AS BIGINT) AS nb
       |  FROM r_$tag, n_$tag n, range(0, $B) t(b)
       |  WHERE cum > b * n.n // $B AND cum - cnt < (b + 1) * n.n // $B
       |  GROUP BY b),
       |sel_$tag AS (
       |  SELECT '$tag' AS dim_name, est_rows,
       |    est_rows * 1000000 // GREATEST(n, 1) AS sel_ppm,
       |    CASE WHEN est_rows <= $Cap THEN 'broadcast' ELSE 'shuffle'
       |      END AS plan_chosen
       |  FROM (
       |    SELECT CAST(SUM(CASE WHEN lo > $t THEN nb
       |        WHEN hi > $t THEN nb * (hi - $t) // GREATEST(hi - lo, 1)
       |        ELSE 0 END) AS BIGINT) AS est_rows,
       |      (SELECT n FROM n_$tag) AS n
       |    FROM hist_$tag))""".stripMargin

  private val qOrderedJoinSql = {
    val part = histEstCte("part",
      "SELECT CAST(p_size AS BIGINT) AS v FROM part", TPart)
    val supp = histEstCte("supplier",
      "SELECT CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS v " +
        "FROM supplier", TSupp)
    val ord = histEstCte("orders",
      "SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v " +
        "FROM orders", TOrd)
    s"""WITH $part,
       |$supp,
       |$ord,
       |plan AS (
       |  SELECT dim_name, est_rows, sel_ppm, plan_chosen,
       |    CAST(row_number() OVER (ORDER BY sel_ppm, dim_name) - 1
       |      AS BIGINT) AS pos
       |  FROM (SELECT * FROM sel_part
       |    UNION ALL SELECT * FROM sel_supplier
       |    UNION ALL SELECT * FROM sel_orders)),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_joined,
       |    CAST(SUM(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5)
       |      AS BIGINT) AS HUGEINT)) AS BIGINT) AS sum_vc
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey AND p_size > $TPart
       |  JOIN supplier ON l_suppkey = s_suppkey
       |    AND CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) > $TSupp
       |  JOIN orders ON l_orderkey = o_orderkey
       |    AND CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
       |      > $TOrd)
       |SELECT pos, dim_name, est_rows, sel_ppm, plan_chosen,
       |  n_joined, sum_vc
       |FROM plan, agg ORDER BY pos""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q317_skewed_join" -> QueryDef(qSkewedJoin, Some(qSkewedJoinSql),
      "MCV-driven skew-salted join: catalog stats pick the hot keys " +
        "(sentinel-account skew), only hot keys salt/replicate, " +
        "hot-key set + join aggregate hash-gated; SkewedJoinSpec " +
        "pins the hot/cold plan split"),
    "q318_ordered_join" -> QueryDef(qOrderedJoin, Some(qOrderedJoinSql),
      "cardinality-driven join order: per-dim histogram estimates " +
        "order a 3-dim star join most-selective-first; estimates, " +
        "positions, broadcast choices and the joined aggregate all " +
        "hash-gated; OrderedJoinSpec pins the executed sequence"))
}
