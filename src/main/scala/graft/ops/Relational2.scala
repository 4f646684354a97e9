package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Second relational battery: the SQL-surface corners the first pass
  * (Relational.scala) didn't exercise as first-class gates —
  * GROUPING SETS proper (q06/q13 cover rollup/cube), PIVOT, the
  * analytic-window function family beyond rank/row_number, and an
  * edit-distance verify stage on the LSH candidate chain.
  *
  * Scale shape: q115/q116 are single hash aggregates (grouping sets
  * multiplies rows by #sets, pivot by nothing); q117 is one
  * shuffle on the window partition key; q118 inherits q35's
  * sub-quadratic candidate generation and adds an O(candidates)
  * bounded-prefix Levenshtein — the q37 pattern with a different
  * verify metric.
  */
object Relational2 {

  // --------------------------------------------------------------- q115

  /** q115: GROUPING SETS — the explicit-set form (finer than rollup:
    * the middle set keeps priority NULL while status stays, plus the
    * grand total) with grouping_id() disambiguating NULL-as-grouped
    * from NULL-in-data, counts, and an exact DECIMAL revenue sum. */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast(LongType).as("gid"),
        count(lit(1)).cast(LongType).as("n_orders"),
        Tables.dsum(col("o_totalprice")).as("revenue"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  private val qGroupingSetsSql =
    """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
      |    AS gid,
      |  o_orderstatus, o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- q116

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q116: PIVOT — per-user event counts widened to one column per
    * type (the fixed value list keeps the schema static, which is also
    * the 100-TB rule: a pivot over an unbounded value set is a schema
    * explosion). Zero-filled so absent combinations hash-match the
    * conditional-sum oracle. */
  private def qEventPivot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .select(col("user_id") +: EventTypes.map(t =>
        coalesce(col(t), lit(0L)).cast(LongType).as(t)): _*)
      .orderBy(col("user_id"))

  private val qEventPivotSql = {
    val cols = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
    s"""SELECT user_id, ${cols.mkString(",\n  ")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // --------------------------------------------------------------- q117

  /** q117: the analytic WINDOW family beyond rank — percent_rank /
    * cume_dist (exact rationals k/m, bit-stable as doubles), ntile,
    * lag/lead with defaults, and first/nth/last over explicit ROWS
    * frames (the default RANGE frame is engine-trap territory; every
    * frame here is pinned). Order inside the partition is made total
    * by the (cents, orderkey, linenumber) key. */
  private def qWindowBattery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("flag"))
      .orderBy(col("c"), col("l_orderkey"), col("l_linenumber"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .select(col("l_orderkey"), col("l_linenumber"), col("flag"), col("c"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        lag(col("c"), 1, -1L).over(w).as("prev_c"),
        lead(col("c"), 1, -1L).over(w).as("next_c"),
        first(col("c")).over(wRun).as("run_min"),
        nth_value(col("c"), 3).over(wFull).as("third_c"),
        last(col("c")).over(wFull).as("max_c"))
      .orderBy(col("flag"), col("c"), col("l_orderkey"), col("l_linenumber"))
  }

  private val qWindowBatterySql =
    """WITH base AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, flag, c,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  lag(c, 1, -1) OVER w AS prev_c,
      |  lead(c, 1, -1) OVER w AS next_c,
      |  first_value(c) OVER (PARTITION BY flag
      |    ORDER BY c, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_min,
      |  nth_value(c, 3) OVER wf AS third_c,
      |  last_value(c) OVER wf AS max_c
      |FROM base
      |WINDOW w AS (PARTITION BY flag
      |    ORDER BY c, l_orderkey, l_linenumber),
      |  wf AS (PARTITION BY flag ORDER BY c, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY flag, c, l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------------------- q118

  /** Prefix length and match cut for the edit-distance verify. 64
    * chars bounds the DP cost per pair at 64² regardless of document
    * length; 16 (a quarter of the prefix) splits the candidate set
    * both ways on this corpus. */
  private val EditPrefix = 64
  private val EditThreshold = 16L

  /** q118: EDIT-DISTANCE verify on the LSH candidate chain — the q37
    * shape (candidates are q35's sub-quadratic band join, verify is
    * O(candidates)) with Levenshtein as the metric, the classic
    * record-linkage second stage. Never pairwise over the corpus: the
    * DP runs only on candidate pairs and only over bounded prefixes. */
  private def qEditVerify(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
      .select(col("doc_id"),
        substring(col("text"), 1, EditPrefix).as("prefix"))
    Dedup.minhashCandidates(s, dir)
      .join(docs.select(col("doc_id").as("doc_a"), col("prefix").as("pa")),
        "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("prefix").as("pb")),
        "doc_b")
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast(LongType))
      .withColumn("near", col("dist") <= EditThreshold)
      .select(col("doc_a"), col("doc_b"), col("dist"), col("near"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val qEditVerifySql =
    s"""WITH ${Dedup.candidatesCte}
       |SELECT c.doc_a, c.doc_b,
       |  CAST(levenshtein(substr(da.text, 1, $EditPrefix),
       |                   substr(db.text, 1, $EditPrefix)) AS BIGINT)
       |    AS dist,
       |  levenshtein(substr(da.text, 1, $EditPrefix),
       |              substr(db.text, 1, $EditPrefix)) <= $EditThreshold
       |    AS near
       |FROM cand c
       |JOIN documents da ON da.doc_id = c.doc_a
       |JOIN documents db ON db.doc_id = c.doc_b
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  // --------------------------------------------------------------- q119

  /** q119: UNPIVOT — q116's wide table melted back to long form and
    * gated against the ORIGINAL long-form aggregate: pivot∘unpivot =
    * id (minus true zeros), proven through the engine rather than
    * asserted. */
  private def qEventUnpivot(s: SparkSession, dir: String): DataFrame =
    qEventPivot(s, dir)
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray,
        "event_type", "n")
      .filter(col("n") > 0)
      .orderBy(col("user_id"), col("event_type"))

  private val qEventUnpivotSql =
    """SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // --------------------------------------------------------------- q120

  /** q120: time-spine RESAMPLING — the gap-filling pass every
    * time-series read needs before window math is meaningful (an hour
    * with zero events must exist as a zero, or moving averages skip
    * it): hour spine from the observed range × type alphabet, left
    * join, zero-fill, then a 3-hour trailing mean whose numerator and
    * denominator are exact integers (one IEEE division per row).
    * Scale shape: the spine is wall-clock-bounded (hours × types, not
    * data-sized), built once and broadcast-joined against the hourly
    * aggregate. */
  private def qResampleMa(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ev = load(s, dir, "events")
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    val spine = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val wf = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-2, Window.currentRow)
    spine.crossJoin(broadcast(types))
      .join(hourly, Seq("event_type", "hour"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("ma3", sum(col("n")).over(wf).cast(DoubleType)
        / count(lit(1)).over(wf))
      .select(col("event_type"), col("hour"), col("n"), col("ma3"))
      .orderBy(col("event_type"), col("hour"))
  }

  private val qResampleMaSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT date_trunc('hour', MIN(ts)) AS lo,
      |    date_trunc('hour', MAX(ts)) AS hi
      |  FROM events),
      |spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      |  FROM bounds),
      |grid AS (
      |  SELECT t.event_type, s.hour,
      |    COALESCE(h.n, 0) AS n
      |  FROM spine s
      |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      |  LEFT JOIN hourly h
      |    ON h.event_type = t.event_type AND h.hour = s.hour)
      |SELECT event_type, hour, n,
      |  CAST(SUM(n) OVER f AS DOUBLE) / COUNT(*) OVER f AS ma3
      |FROM grid
      |WINDOW f AS (PARTITION BY event_type ORDER BY hour
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, hour""".stripMargin

  // --------------------------------------------------------------- q125

  /** Salt fan-out: each join key's probe rows spread across this many
    * reducer partitions. */
  private val SaltFactor = 8

  /** q125: SKEW-SALTED JOIN — the manual hot-key treatment (q17 salts
    * an aggregation; this salts a join), in its PRODUCTION form: a
    * frequency pass flags hot keys, only their build rows replicate
    * across [[SaltFactor]] salt values, only their probe rows draw a
    * spread salt, and every cold key rides salt 0 untouched
    * ([[graft.util.Salting.hotSaltedJoin]]). Gated against the
    * UNSALTED join's aggregate: salting must be invisible in the
    * result.
    *
    * Round-7 measurement (`graft.SkewProbe`, 30% of probe rows on one
    * hot key): BLANKET build-side salting — this query's previous form
    * — ran 24.1 s at the 100× directory vs 10.1 s for AQE's runtime
    * skew split and 22.4 s untreated: whole-side replication loses
    * even to doing nothing. Hence the adopted order at 100 TB: let AQE
    * split skewed join partitions (on by default); reach for the
    * manual salt only where AQE cannot re-plan, and then always
    * frequency-gated. */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ord = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_linenumber"))
    graft.util.Salting.hotSaltedJoin(li, ord,
        "l_orderkey", "o_orderkey",
        spread = col("l_linenumber"), nSalts = SaltFactor)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).cast(LongType).as("n_items"),
        Tables.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  private val qSaltedJoinSql =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q115_grouping_sets" -> QueryDef(qGroupingSets, Some(qGroupingSetsSql),
      "explicit GROUPING SETS with grouping_id + exact decimal revenue"),
    "q116_event_pivot" -> QueryDef(qEventPivot, Some(qEventPivotSql),
      "fixed-value-list PIVOT, zero-filled, == conditional-sum oracle"),
    "q117_window_battery" -> QueryDef(qWindowBattery, Some(qWindowBatterySql),
      "percent_rank/cume_dist/ntile/lag/lead/nth over pinned ROWS frames"),
    "q118_edit_verify" -> QueryDef(qEditVerify, Some(qEditVerifySql),
      "Levenshtein verify on q35 LSH candidates (record-linkage stage 2)"),
    "q119_event_unpivot" -> QueryDef(qEventUnpivot, Some(qEventUnpivotSql),
      "UNPIVOT of q116 back to long form == original aggregate"),
    "q120_resample_ma" -> QueryDef(qResampleMa, Some(qResampleMaSql),
      "hour-spine gap fill + exact 3-hour trailing mean"),
    "q125_salted_join" -> QueryDef(qSaltedJoin, Some(qSaltedJoinSql),
      "skew-salted join (key,salt) == unsalted join (q17's join twin)"))
}
