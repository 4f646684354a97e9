package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Fifty-first wave (round 11): the canonical TPC-H battery, part 1 —
  * Q4 through Q11 restated on the driver's TPC-H-ish schema. Together
  * with part 2 (Wave52) and the pre-existing Q1/Q2/Q3/Q17/Q21 shapes
  * (q01/q294/q03/q292/q293) this completes all 22 canonical TPC-H
  * query shapes as oracle-gated entries — the public standard a
  * 100-TB relational user runs first (the round-10 verdict's ask #2).
  *
  * Schema adaptations (the driver's tables lack partsupp,
  * l_commitdate/l_receiptdate/l_shipmode, c_phone/c_address,
  * p_container/p_mfgr — see TESTDATA.md):
  *  - "late" lineitems (Q4's commit<receipt) = shipped more than a
  *    stated number of days after the order date;
  *  - part-supplier facts (Q9/Q11/Q20's partsupp) derive from the
  *    lineitem history (shipped value/quantity per part-supplier);
  *  - Q8's "nation market share" keeps its region/type/share shape
  *    with the synthetic nation names.
  *
  * House exactness devices throughout (the q292 grid): every money
  * aggregate runs on the integer cent grid (`floor(x*100+0.5)`),
  * discounted revenue on the cent-percent grid
  * `epc*(100-dpct)` — no float crosses the engine boundary; sums
  * route through DECIMAL(38,0)/HUGEINT (ANSI-safe at 100 TB), ratios
  * are integer ppm with guarded division, and every output has a
  * deterministic ORDER BY with tie-breaks.
  *
  * Scale shapes: each query is one or two keyed shuffles over the
  * fact table with all dimension joins broadcast; the correlated
  * subqueries (Q4's EXISTS, Q11's scalar total) decorrelate to a
  * semi-join / one-row broadcast scalar — the only plans that
  * survive 1000 executors. */
object Wave51 {

  /** Integer cent grid: round-half-up to cents, exact in both
    * engines (floor is floor in Spark and DuckDB). */
  private[ops] def cents(c: String): Column =
    expr(s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)")

  /** Discount as integer percent (the data's discounts are exact
    * hundredths, verified in TESTDATA). */
  private[ops] def pct(c: String): Column =
    expr(s"CAST(floor($c * 100.0 + 0.5) AS BIGINT)")

  /** Discounted revenue on the cent-percent grid: cents(extprice) ×
    * (100 − pct(discount)) — exact integers end to end. */
  private[ops] val RevCpExpr =
    "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * " +
      "(100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))"

  private[ops] val RevCpSql =
    """CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
      |  (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))"""
      .stripMargin.replace("\n", " ")

  private def dec38Sum(c: Column): Column =
    sum(c.cast(DecimalType(38, 0))).cast(LongType)

  // ------------------------------------------------------------- q297
  // TPC-H Q4: order priority checking. A quarter of orders; count per
  // priority those with at least one "late" lineitem (shipped > 90
  // days after the order date — the schema's commit<receipt stand-in).
  // EXISTS on the oracle, decorrelated to a distinct semi-join here.

  private val Q4Lo = "1996-07-01"
  private val Q4Hi = "1996-10-01"
  private val LateDays = 90

  private def qPriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '$Q4Lo' AND " +
        s"CAST(o_orderdate AS DATE) < DATE '$Q4Hi'"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(o_orderdate AS DATE)").as("od"))
    val lateOrders = load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(l_shipdate AS DATE)").as("sd"))
      .join(o.select(col("o_orderkey"), col("od")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("sd"), col("od")) > LateDays)
      .select(col("l_orderkey")).distinct()
    o.join(lateOrders, o("o_orderkey") === lateOrders("l_orderkey"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val qPriorityCheckSql =
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       |FROM orders o
       |WHERE CAST(o_orderdate AS DATE) >= DATE '$Q4Lo'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q4Hi'
       |  AND EXISTS (SELECT 1 FROM lineitem l
       |    WHERE l.l_orderkey = o.o_orderkey
       |      AND date_diff('day', CAST(o.o_orderdate AS DATE),
       |        CAST(l.l_shipdate AS DATE)) > $LateDays)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q298
  // TPC-H Q5: local supplier volume — revenue per nation in one
  // region/year where the supplier and the customer share the nation.

  private val Q5Region = "ASIA"
  private val Q5Lo = "1996-01-01"
  private val Q5Hi = "1997-01-01"

  private def qLocalSupplierVolume(s: SparkSession, dir: String)
      : DataFrame = {
    val o = load(s, dir, "orders")
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '$Q5Lo' AND " +
        s"CAST(o_orderdate AS DATE) < DATE '$Q5Hi'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        expr(RevCpExpr).as("rev_cp"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = load(s, dir, "nation")
    val reg = load(s, dir, "region").filter(col("r_name") === Q5Region)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dec38Sum(expr("rev_cp")).as("revenue_cp"))
      .orderBy(col("revenue_cp").desc, col("n_name"))
  }

  private val qLocalSupplierVolumeSql =
    s"""SELECT n_name,
       |  CAST(SUM($RevCpSql) AS BIGINT) AS revenue_cp
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$Q5Region'
       |  AND CAST(o_orderdate AS DATE) >= DATE '$Q5Lo'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q5Hi'
       |GROUP BY 1 ORDER BY revenue_cp DESC, n_name""".stripMargin

  // ------------------------------------------------------------- q299
  // TPC-H Q6: forecasting revenue change — one tight scan-filter-agg
  // (the predicate-pushdown poster child): revenue given up to
  // discounts in a band, for one shipping year and small quantities.

  private val Q6Lo = "1996-01-01"
  private val Q6Hi = "1997-01-01"

  private def qRevenueForecast(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(expr(s"CAST(l_shipdate AS DATE) >= DATE '$Q6Lo' AND " +
        s"CAST(l_shipdate AS DATE) < DATE '$Q6Hi'"))
      .filter(pct("l_discount").between(4, 6) &&
        expr("CAST(l_quantity AS BIGINT) < 24"))
      .agg(
        coalesce(dec38Sum(
            cents("l_extendedprice") * pct("l_discount")), lit(0L))
          .as("revenue_cp"),
        count(lit(1)).as("n_items"))

  private val qRevenueForecastSql =
    s"""SELECT CAST(COALESCE(SUM(
       |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
       |    CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)), 0)
       |  AS BIGINT) AS revenue_cp,
       |  CAST(COUNT(*) AS BIGINT) AS n_items
       |FROM lineitem
       |WHERE CAST(l_shipdate AS DATE) >= DATE '$Q6Lo'
       |  AND CAST(l_shipdate AS DATE) < DATE '$Q6Hi'
       |  AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)
       |    BETWEEN 4 AND 6
       |  AND CAST(l_quantity AS BIGINT) < 24""".stripMargin

  // ------------------------------------------------------------- q300
  // TPC-H Q7: volume shipping between two nations (both directions),
  // by supplier nation × customer nation × shipping year.

  private val Q7NatA = "NATION_3"
  private val Q7NatB = "NATION_8"

  private def qVolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .filter(expr("CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND " +
        "CAST(l_shipdate AS DATE) < DATE '1998-01-01'"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast(LongType).as("l_year"),
        expr(RevCpExpr).as("rev_cp"))
    val o = load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val n1 = load(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = load(s, dir, "nation")
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === Q7NatA &&
          col("cust_nation") === Q7NatB) ||
        (col("supp_nation") === Q7NatB && col("cust_nation") === Q7NatA))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dec38Sum(col("rev_cp")).as("revenue_cp"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val qVolumeShippingSql =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  year(CAST(l_shipdate AS DATE)) AS l_year,
       |  CAST(SUM($RevCpSql) AS BIGINT) AS revenue_cp
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
       |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
       |  AND ((sn.n_name = '$Q7NatA' AND cn.n_name = '$Q7NatB')
       |    OR (sn.n_name = '$Q7NatB' AND cn.n_name = '$Q7NatA'))
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------- q301
  // TPC-H Q8: national market share — the share (integer ppm) of one
  // nation's suppliers in the revenue of a part type sold to one
  // region's customers, per order year.

  private val Q8Region = "ASIA"
  private val Q8Type = "ECONOMY"
  private val Q8Nation = "NATION_2"

  private def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        expr(RevCpExpr).as("rev_cp"))
    val o = load(s, dir, "orders")
      .filter(expr("CAST(o_orderdate AS DATE) >= DATE '1996-01-01' AND " +
        "CAST(o_orderdate AS DATE) < DATE '1998-01-01'"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
    val part = load(s, dir, "part").filter(col("p_type") === Q8Type)
      .select(col("p_partkey"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = load(s, dir, "nation")
    val reg = load(s, dir, "region").filter(col("r_name") === Q8Region)
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val sn = load(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .groupBy(col("o_year"))
      .agg(
        dec38Sum(when(col("supp_nation") === Q8Nation, col("rev_cp"))
          .otherwise(lit(0L))).as("nat_cp"),
        dec38Sum(col("rev_cp")).as("tot_cp"))
      .select(col("o_year"),
        expr("CASE WHEN tot_cp = 0 THEN 0 ELSE " +
          "CAST((CAST(nat_cp AS DECIMAL(38,0)) * 1000000) div " +
          "CAST(tot_cp AS DECIMAL(38,0)) AS BIGINT) END")
          .as("share_ppm"),
        col("nat_cp"), col("tot_cp"))
      .orderBy(col("o_year"))
  }

  private val qMarketShareSql =
    s"""WITH v AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
       |    $RevCpSql AS rev_cp,
       |    sn.n_name = '$Q8Nation' AS is_nat
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation cn ON c_nationkey = cn.n_nationkey
       |  JOIN region ON cn.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation sn ON s_nationkey = sn.n_nationkey
       |  WHERE r_name = '$Q8Region' AND p_type = '$Q8Type'
       |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
       |    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'),
       |g AS (
       |  SELECT o_year,
       |    SUM(CASE WHEN is_nat THEN rev_cp ELSE 0 END) AS nat_cp,
       |    SUM(rev_cp) AS tot_cp
       |  FROM v GROUP BY 1)
       |SELECT o_year,
       |  CASE WHEN tot_cp = 0 THEN 0
       |    ELSE CAST((nat_cp * 1000000) // tot_cp AS BIGINT) END
       |    AS share_ppm,
       |  CAST(nat_cp AS BIGINT) AS nat_cp,
       |  CAST(tot_cp AS BIGINT) AS tot_cp
       |FROM g ORDER BY o_year""".stripMargin

  // ------------------------------------------------------------- q302
  // TPC-H Q9: product type profit. Without partsupp the supply cost is
  // the part's retail price × quantity (the schema's stand-in):
  // profit_cp = revenue_cp − retail_cents × qty × 100, by supplier
  // nation × order year.

  private val Q9Type = "STANDARD"

  private def qProductProfit(s: SparkSession, dir: String): DataFrame = {
    val part = load(s, dir, "part").filter(col("p_type") === Q9Type)
      .select(col("p_partkey"),
        cents("p_retailprice").as("rpc"))
    val li = load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        expr(RevCpExpr).as("rev_cp"),
        expr("CAST(l_quantity AS BIGINT)").as("qty"))
    val o = load(s, dir, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("o_year"))
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = load(s, dir, "nation")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(dec38Sum(expr("rev_cp - rpc * qty * 100")).as("profit_cp"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  private val qProductProfitSql =
    s"""SELECT n_name, year(CAST(o_orderdate AS DATE)) AS o_year,
       |  CAST(SUM($RevCpSql
       |    - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
       |      * CAST(l_quantity AS BIGINT) * 100) AS BIGINT) AS profit_cp
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |WHERE p_type = '$Q9Type'
       |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  // ------------------------------------------------------------- q303
  // TPC-H Q10: returned item reporting — top 20 customers by revenue
  // lost to returns in one quarter.

  private val Q10Lo = "1995-10-01"
  private val Q10Hi = "1996-01-01"

  private def qReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val o = load(s, dir, "orders")
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '$Q10Lo' AND " +
        s"CAST(o_orderdate AS DATE) < DATE '$Q10Hi'"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), expr(RevCpExpr).as("rev_cp"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        cents("c_acctbal").as("acctbal_c"), col("c_nationkey"))
    val nat = load(s, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("acctbal_c"),
        col("n_name"))
      .agg(dec38Sum(col("rev_cp")).as("revenue_cp"))
      .orderBy(col("revenue_cp").desc, col("c_custkey"))
      .limit(20)
  }

  private val qReturnedItemsSql =
    s"""SELECT c_custkey, c_name,
       |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_c,
       |  n_name, CAST(SUM($RevCpSql) AS BIGINT) AS revenue_cp
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '$Q10Lo'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q10Hi'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue_cp DESC, c_custkey LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q304
  // TPC-H Q11: important stock identification. Without partsupp the
  // per-part "value" is the shipped extended-price total from one
  // nation's suppliers; parts whose value exceeds 1/1000 of the
  // nation's total (stated as the overflow-safe integer cross-multiply
  // 1000·value > total — no division). Scalar subquery on the oracle,
  // one-row broadcast scalar here.

  private val Q11Nation = "NATION_7"

  private def qImportantParts(s: SparkSession, dir: String): DataFrame = {
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = load(s, dir, "nation").filter(col("n_name") === Q11Nation)
    val li = load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        cents("l_extendedprice").as("epc"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(dec38Sum(col("epc")).as("value_c"))
    val total = perPart
      .agg(dec38Sum(col("value_c")).as("total_c"))
    // one-row broadcast scalar join (bounded by construction)
    perPart.crossJoin(broadcast(total))
      .filter(expr("CAST(value_c AS DECIMAL(38,0)) * 1000 > " +
        "CAST(total_c AS DECIMAL(38,0))"))
      .select(col("l_partkey"), col("value_c"))
      .orderBy(col("value_c").desc, col("l_partkey"))
  }

  private val qImportantPartsSql =
    s"""WITH pv AS MATERIALIZED (
       |  SELECT l_partkey, SUM(
       |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
       |    AS value_c
       |  FROM lineitem
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = '$Q11Nation'
       |  GROUP BY 1)
       |SELECT l_partkey, CAST(value_c AS BIGINT) AS value_c
       |FROM pv
       |WHERE value_c * 1000 > (SELECT SUM(value_c) FROM pv)
       |ORDER BY value_c DESC, l_partkey""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q297_tpch_q4_priority" -> QueryDef(qPriorityCheck,
      Some(qPriorityCheckSql),
      "TPC-H Q4 shape: order priority checking — EXISTS late-lineitem " +
        "decorrelated to a distinct semi-join"),
    "q298_tpch_q5_local_volume" -> QueryDef(qLocalSupplierVolume,
      Some(qLocalSupplierVolumeSql),
      "TPC-H Q5 shape: local supplier volume — 6-table star with the " +
        "customer-nation = supplier-nation colocation predicate"),
    "q299_tpch_q6_forecast" -> QueryDef(qRevenueForecast,
      Some(qRevenueForecastSql),
      "TPC-H Q6 shape: single scan-filter-agg with full predicate " +
        "pushdown, exact cent-percent revenue"),
    "q300_tpch_q7_volume_shipping" -> QueryDef(qVolumeShipping,
      Some(qVolumeShippingSql),
      "TPC-H Q7 shape: bidirectional two-nation shipping volume by year"),
    "q301_tpch_q8_market_share" -> QueryDef(qMarketShare,
      Some(qMarketShareSql),
      "TPC-H Q8 shape: national market share as guarded integer ppm"),
    "q302_tpch_q9_profit" -> QueryDef(qProductProfit,
      Some(qProductProfitSql),
      "TPC-H Q9 shape: product profit by supplier nation and year " +
        "(lineitem-derived supply cost)"),
    "q303_tpch_q10_returns" -> QueryDef(qReturnedItems,
      Some(qReturnedItemsSql),
      "TPC-H Q10 shape: top-20 customers by returned revenue"),
    "q304_tpch_q11_important_parts" -> QueryDef(qImportantParts,
      Some(qImportantPartsSql),
      "TPC-H Q11 shape: parts above a 1/1000 share of one nation's " +
        "shipped value — scalar subquery as one-row broadcast, " +
        "division-free cross-multiply"))
}
