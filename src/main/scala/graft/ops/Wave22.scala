package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-second wave (round 8): inventory accounting and journey
  * timing — two operators whose textbook formulations are imperative
  * loops, re-expressed as declarative Spark plans:
  *
  *  - q237: FIFO COST ALLOCATION (COGS). The classic "walk the receipt
  *    lots in order, draining each against issues" loop becomes pure
  *    relational algebra through the cumulative-interval isomorphism:
  *    a lot's [cum_start, cum_end) on the receipt axis matches an
  *    issue's interval on the issue axis exactly where they overlap,
  *    so FIFO matching is a per-part interval join over prefix sums —
  *    no loop, no UDF, no state.
  *  - q238: TRANSITION DWELL-TIME matrix — q231's probability matrix
  *    answers "after a view, WHAT happens"; this answers "after a
  *    view, HOW LONG until it happens", per (from, to) pair within a
  *    30-minute session, in exact microseconds.
  *
  * House rules: integer exactness (cents/micros), deterministic
  * orders, DuckDB oracle per query, windows only partitioned. */
object Wave22 {

  /** Session gap shared with q231/q236 (30 minutes, microseconds). */
  private val GapUs = 1800L * 1000000L

  // ------------------------------------------------------------- q237

  /** q237: FIFO inventory cost allocation per part. Receipts are the
    * part's 'F'-status lineitems, issues its 'O'-status lineitems,
    * both in (shipdate, orderkey, linenumber) order — a deterministic
    * unique FIFO sequence. Each side gets cumulative-quantity
    * intervals via a PARTITIONED prefix-sum window (per-part row
    * counts are bounded by the part's own history, never the table);
    * lot r supplies issue i exactly
    * `max(0, min(e_r, e_i) - max(s_r, s_i))` units — the interval-
    * overlap identity that makes FIFO a join. Costs are exact integer
    * cents at the lot's unit cost (extendedprice·100 div qty,
    * truncated). The per-part equi-join with a range predicate is
    * posting-list shaped: candidate pairs per part ≈ receipts+issues
    * (each issue overlaps a contiguous lot run), never receipts×issues.
    * Output: top-20 parts by allocated cost (TakeOrdered) with the
    * unfilled-demand remainder reported beside the match. */
  private def qFifoCogs(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_partkey").as("part"), col("l_linestatus").as("st"),
        col("l_quantity").cast("long").as("qty"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
          .as("cents"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("part"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def axis(status: String) = li.filter(col("st") === status)
      .withColumn("e", sum(col("qty")).over(w))
      .withColumn("b", col("e") - col("qty"))
    val receipts = axis("F")
      .select(col("part"), col("b").as("rb"), col("e").as("re"),
        expr("cents div qty").as("unit_cents"))
    val issues = axis("O")
      .select(col("part"), col("b").as("ib"), col("e").as("ie"))
    val matched = receipts.join(issues, Seq("part"))
      .filter(col("ib") < col("re") && col("rb") < col("ie"))
      .select(col("part"),
        (least(col("re"), col("ie")) - greatest(col("rb"), col("ib")))
          .as("m"),
        col("unit_cents"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("m")).as("matched_qty"),
        sum((col("m") * col("unit_cents"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("matched_cost_cents"))
    val rTot = receipts.groupBy(col("part"))
      .agg(count(lit(1)).as("n_receipts"), max(col("re")).as("supply_qty"))
    val iTot = issues.groupBy(col("part"))
      .agg(count(lit(1)).as("n_issues"), max(col("ie")).as("demand_qty"))
    matched.join(rTot, Seq("part")).join(iTot, Seq("part"))
      .select(col("part"), col("n_receipts"), col("n_issues"),
        col("n_pairs"), col("matched_qty"),
        (col("demand_qty") - col("matched_qty")).as("unfilled_qty"),
        col("matched_cost_cents"))
      .orderBy(col("matched_cost_cents").desc, col("part"))
      .limit(20)
  }

  private val qFifoCogsSql =
    """WITH li AS (
      |  SELECT l_partkey AS part, l_linestatus AS st,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
      |    l_shipdate, l_orderkey, l_linenumber
      |  FROM lineitem),
      |ax AS (
      |  SELECT *, SUM(qty) OVER (PARTITION BY part, st
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
      |  FROM li),
      |r AS MATERIALIZED (
      |  SELECT part, e - qty AS rb, e AS re, cents // qty AS unit_cents
      |  FROM ax WHERE st = 'F'),
      |i AS MATERIALIZED (
      |  SELECT part, e - qty AS ib, e AS ie FROM ax WHERE st = 'O'),
      |m AS (
      |  SELECT r.part,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(LEAST(re, ie) - GREATEST(rb, ib)) AS BIGINT)
      |      AS matched_qty,
      |    CAST(SUM(CAST(LEAST(re, ie) - GREATEST(rb, ib) AS HUGEINT)
      |      * unit_cents) AS BIGINT) AS matched_cost_cents
      |  FROM r JOIN i ON i.part = r.part AND ib < re AND rb < ie
      |  GROUP BY 1),
      |rt AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_receipts,
      |  CAST(MAX(re) AS BIGINT) AS supply_qty FROM r GROUP BY 1),
      |it AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_issues,
      |  CAST(MAX(ie) AS BIGINT) AS demand_qty FROM i GROUP BY 1)
      |SELECT m.part, n_receipts, n_issues, n_pairs, matched_qty,
      |  demand_qty - matched_qty AS unfilled_qty, matched_cost_cents
      |FROM m JOIN rt ON rt.part = m.part JOIN it ON it.part = m.part
      |ORDER BY matched_cost_cents DESC, m.part LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q238

  /** q238: TRANSITION DWELL TIME — for each within-session consecutive
    * event-type pair, how long the first state lasted: count, total,
    * truncated mean, and max, all in exact microseconds, plus each
    * from-state's share of total dwell in ppm. One lag + one lead over
    * the per-user shuffle; the matrix is alphabet²-bounded. The timing
    * complement of q231's probability matrix. */
  private def qDwellTime(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy(col("user_id")).orderBy(col("us"),
      col("event_id"))
    val ws = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
    val dw = load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("brk", when(coalesce(col("us") - lag(col("us"), 1)
        .over(wu), lit(GapUs + 1)) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wu))
      .withColumn("to_type", lead(col("event_type"), 1).over(ws))
      .withColumn("dwell_us", lead(col("us"), 1).over(ws) - col("us"))
      .filter(col("to_type").isNotNull)
    val m = dw.groupBy(col("event_type").as("from_type"),
        col("to_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("dwell_us")).as("total_us"),
        max(col("dwell_us")).as("max_us"))
      .withColumn("mean_us", expr("total_us div n"))
    m.withColumn("from_total", sum(col("total_us")).over(
        Window.partitionBy(col("from_type"))))
      .withColumn("share_ppm", expr( // decimal: totals can pass 2^63/1e6
        "CAST(CAST(total_us AS DECIMAL(38,0)) * 1000000 div from_total" +
          " AS BIGINT)"))
      .select(col("from_type"), col("to_type"), col("n"), col("total_us"),
        col("mean_us"), col("max_us"), col("share_ppm"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val qDwellTimeSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
       |  FROM events),
       |o AS (
       |  SELECT *, lag(us) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS pus
       |  FROM e),
       |b AS (
       |  SELECT *, CASE WHEN pus IS NULL OR us - pus > $GapUs
       |    THEN 1 ELSE 0 END AS brk FROM o),
       |sid AS (
       |  SELECT *, SUM(brk) OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS sid
       |  FROM b),
       |dw AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER w AS to_type,
       |    lead(us) OVER w - us AS dwell_us
       |  FROM sid
       |  WINDOW w AS (PARTITION BY user_id, sid ORDER BY us, event_id)),
       |m AS (
       |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dwell_us) AS BIGINT) AS total_us,
       |    CAST(MAX(dwell_us) AS BIGINT) AS max_us
       |  FROM dw WHERE to_type IS NOT NULL GROUP BY 1, 2)
       |SELECT from_type, to_type, n, total_us, total_us // n AS mean_us,
       |  max_us,
       |  CAST(CAST(total_us AS HUGEINT) * 1000000 // (SUM(total_us) OVER
       |    (PARTITION BY from_type)) AS BIGINT) AS share_ppm
       |FROM m ORDER BY from_type, to_type""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q237_fifo_cogs" -> QueryDef(qFifoCogs, Some(qFifoCogsSql),
      "FIFO cost allocation as a per-part prefix-sum interval join"),
    "q238_dwell_time" -> QueryDef(qDwellTime, Some(qDwellTimeSql),
      "within-session transition dwell-time matrix, exact micros"))
}
