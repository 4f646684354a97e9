package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Forty-eighth wave (round 10): the CORRELATED-SUBQUERY battery — the
  * three classic TPC-H decorrelation shapes, each stated CORRELATED on
  * the oracle side (scalar subquery / EXISTS / correlated min) and
  * DECORRELATED on the Spark side (keyed aggregate + equi-join back —
  * the plan Catalyst's RewriteCorrelatedScalarSubquery produces, built
  * explicitly so the intended physical shape is pinned rather than
  * hoped for):
  *
  *  - q292 (Q17 shape): revenue in small-quantity lineitems of parts
  *    whose quantity is below 20% of that part's average. The 0.2×avg
  *    comparison is exact integer arithmetic: qty_c·5·cnt < sum_c on
  *    the cent grid — no float avg crosses the engine boundary.
  *  - q293 (Q21 shape): suppliers who were the SOLE late shipper on a
  *    multi-supplier order (ship > order date + 30 days). EXISTS /
  *    NOT-EXISTS pair on the oracle; per-order distinct/late-distinct
  *    supplier counts + a semi filter on the Spark side.
  *  - q294 (Q2 shape): the cheapest supplier per part by floored
  *    micro unit price (extprice_c·10⁴ div qty_c), tie → lowest
  *    suppkey; correlated MIN subquery vs aggregate-and-join-back.
  *
  * Scale shapes: every subquery decorrelates to one keyed aggregate +
  * one equi-join on the same key — no per-row subquery execution, no
  * nested-loop; the classic reason a declarative plan survives 100 TB
  * where a literal correlated evaluation cannot. */
object Wave48 {

  // ------------------------------------------------------------- q292

  private def qSmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem").select(col("l_partkey"),
      expr("CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)").as("qc"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
        .as("epc"))
    val per = li.groupBy(col("l_partkey"))
      .agg(sum(col("qc").cast(DecimalType(38, 0))).cast(LongType)
          .as("sum_qc"),
        count(lit(1)).as("cnt"))
    li.join(per, Seq("l_partkey"))
      // qty < 0.2 * avg  <=>  5 * qc * cnt < sum_qc (exact integers)
      .filter(expr("5 * qc * cnt < sum_qc"))
      .agg(count(lit(1)).as("n_small"),
        sum(col("epc").cast(DecimalType(38, 0))).cast(LongType)
          .as("revenue_cents"))
      .select(col("n_small"),
        coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
  }

  private val qSmallQtyRevenueSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
      |  CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5)
      |    AS BIGINT)), 0) AS BIGINT) AS revenue_cents
      |FROM lineitem l1
      |WHERE 5 * CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
      |    * (SELECT COUNT(*) FROM lineitem l2
      |       WHERE l2.l_partkey = l1.l_partkey)
      |  < (SELECT SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
      |     FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""
      .stripMargin

  // ------------------------------------------------------------- q293

  private val LateDays = 30

  private def qSoleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        to_date(col("l_shipdate")).as("sd"))
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
    val flagged = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", datediff(col("sd"), col("od")) > LateDays)
    val per = flagged.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey")))
          .as("n_late_supp"))
    flagged.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(per, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("l_suppkey"))
  }

  private val qSoleLateSupplierSql =
    s"""WITH f AS MATERIALIZED (
       |  SELECT l.l_orderkey, l.l_suppkey,
       |    date_diff('day', CAST(o.o_orderdate AS DATE),
       |      CAST(l.l_shipdate AS DATE)) > $LateDays AS late
       |  FROM lineitem l JOIN orders o
       |    ON o.o_orderkey = l.l_orderkey)
       |SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
       |FROM (
       |  SELECT DISTINCT f1.l_orderkey, f1.l_suppkey
       |  FROM f f1
       |  WHERE f1.late
       |    AND EXISTS (SELECT 1 FROM f f2
       |      WHERE f2.l_orderkey = f1.l_orderkey
       |        AND f2.l_suppkey <> f1.l_suppkey)
       |    AND NOT EXISTS (SELECT 1 FROM f f3
       |      WHERE f3.l_orderkey = f1.l_orderkey
       |        AND f3.l_suppkey <> f1.l_suppkey AND f3.late))
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q294

  private def qCheapestSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) " +
          "* 10000 div CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)")
          .as("unit_micro"))
    val mins = li.groupBy(col("l_partkey"))
      .agg(min(col("unit_micro")).as("min_unit"))
    li.join(mins, Seq("l_partkey"))
      .filter(col("unit_micro") === col("min_unit"))
      .groupBy(col("l_partkey"), col("min_unit"))
      .agg(min(col("l_suppkey")).as("best_suppkey")) // tie -> lowest
      .select(col("l_partkey"), col("best_suppkey"),
        col("min_unit").as("unit_price_micro"))
      .orderBy(col("l_partkey"))
  }

  private val qCheapestSupplierSql =
    """WITH u AS MATERIALIZED (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * 10000
      |      // CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
      |      AS unit_micro
      |  FROM lineitem)
      |SELECT l_partkey,
      |  CAST(MIN(l_suppkey) AS BIGINT) AS best_suppkey,
      |  CAST(MIN(unit_micro) AS BIGINT) AS unit_price_micro
      |FROM u u1
      |WHERE u1.unit_micro = (SELECT MIN(u2.unit_micro) FROM u u2
      |  WHERE u2.l_partkey = u1.l_partkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q292_small_qty_revenue" -> QueryDef(qSmallQtyRevenue,
      Some(qSmallQtyRevenueSql),
      "TPC-H Q17 shape: revenue in below-20%-of-part-average quantity " +
        "lineitems; correlated scalar subqueries on the oracle, keyed " +
        "aggregate + join-back on Spark; exact cent-grid comparison"),
    "q293_sole_late_supplier" -> QueryDef(qSoleLateSupplier,
      Some(qSoleLateSupplierSql),
      "TPC-H Q21 shape: suppliers who were the sole late shipper on " +
        "multi-supplier orders; EXISTS/NOT-EXISTS on the oracle, " +
        "per-order distinct counts + semi filter on Spark"),
    "q294_cheapest_supplier" -> QueryDef(qCheapestSupplier,
      Some(qCheapestSupplierSql),
      "TPC-H Q2 shape: cheapest supplier per part by floored micro " +
        "unit price, tie to lowest suppkey; correlated MIN on the " +
        "oracle, aggregate-and-join-back on Spark"))
}
