package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load
import Wave51.{cents, pct, RevCpExpr, RevCpSql}

/** Fifty-second wave (round 11): the canonical TPC-H battery, part 2 —
  * Q12, Q13, Q14, Q15, Q16, Q18, Q19, Q20 and Q22 (Q17/Q21 are
  * q292/q293 from Wave48). See Wave51's scaladoc for the schema
  * adaptations and the exact-integer grid devices shared by the whole
  * battery.
  *
  * Notable adaptations in this half:
  *  - Q12's l_shipmode becomes the shipping-lateness class (LATE /
  *    ONTIME vs the order date) — the priority-vs-class matrix keeps
  *    its shape;
  *  - Q16's "customer complaints" supplier exclusion becomes the
  *    negative-account-balance suppliers, and the part-supplier
  *    relation derives from lineitem;
  *  - Q20's "excess availability" becomes the dominant-supplier
  *    predicate (shipped more than half of a part's yearly volume);
  *  - Q22's phone country code becomes the customer nation key, and
  *    "no orders" (vacuous on this data — every customer has some
  *    order) becomes no RECENT orders. */
object Wave52 {

  private def dec38Sum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(38, 0))).cast(LongType)

  // ------------------------------------------------------------- q305
  // TPC-H Q12: shipping class vs order priority — for one shipping
  // year, per lateness class count the high-priority vs other orders.

  private val Q12Lo = "1997-01-01"
  private val Q12Hi = "1998-01-01"
  private val Q12LateDays = 30

  private def qShipClassPriority(s: SparkSession, dir: String)
      : DataFrame = {
    val li = load(s, dir, "lineitem")
      .filter(expr(s"CAST(l_shipdate AS DATE) >= DATE '$Q12Lo' AND " +
        s"CAST(l_shipdate AS DATE) < DATE '$Q12Hi'"))
      .select(col("l_orderkey"), expr("CAST(l_shipdate AS DATE)").as("sd"))
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(o_orderdate AS DATE)").as("od"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(datediff(col("sd"), col("od")) > Q12LateDays, "LATE")
          .otherwise("ONTIME"))
      .groupBy(col("ship_class"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  private val qShipClassPrioritySql =
    s"""SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
       |    CAST(l_shipdate AS DATE)) > $Q12LateDays
       |    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '$Q12Lo'
       |  AND CAST(l_shipdate AS DATE) < DATE '$Q12Hi'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- q306
  // TPC-H Q13: customer order-count distribution — LEFT join so
  // zero-order customers survive, then the histogram of counts.

  private val Q13Excl = "4-NOT SPECIFIED"

  private def qCustomerDistribution(s: SparkSession, dir: String)
      : DataFrame = {
    val cust = load(s, dir, "customer").select(col("c_custkey"))
    val o = load(s, dir, "orders")
      .filter(col("o_orderpriority") =!= Q13Excl)
      .select(col("o_orderkey"), col("o_custkey"))
    cust.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val qCustomerDistributionSql =
    s"""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
       |FROM (
       |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
       |  FROM customer
       |  LEFT JOIN orders ON c_custkey = o_custkey
       |    AND o_orderpriority <> '$Q13Excl'
       |  GROUP BY 1)
       |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ------------------------------------------------------------- q307
  // TPC-H Q14: promotion effect — promo revenue share (guarded
  // integer ppm) for one shipping month.

  private val Q14Lo = "1997-03-01"
  private val Q14Hi = "1997-04-01"

  private def qPromoEffect(s: SparkSession, dir: String): DataFrame = {
    val part = load(s, dir, "part").select(col("p_partkey"), col("p_type"))
    load(s, dir, "lineitem")
      .filter(expr(s"CAST(l_shipdate AS DATE) >= DATE '$Q14Lo' AND " +
        s"CAST(l_shipdate AS DATE) < DATE '$Q14Hi'"))
      .select(col("l_partkey"), expr(RevCpExpr).as("rev_cp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        dec38Sum(when(col("p_type") === "PROMO", col("rev_cp"))
          .otherwise(lit(0L))).as("promo_cp"),
        dec38Sum(col("rev_cp")).as("tot_cp"))
      .select(
        expr("CASE WHEN tot_cp IS NULL OR tot_cp = 0 THEN 0 ELSE " +
          "CAST((CAST(promo_cp AS DECIMAL(38,0)) * 1000000) div " +
          "CAST(tot_cp AS DECIMAL(38,0)) AS BIGINT) END")
          .as("promo_ppm"),
        coalesce(col("promo_cp"), lit(0L)).as("promo_cp"),
        coalesce(col("tot_cp"), lit(0L)).as("tot_cp"))
  }

  private val qPromoEffectSql =
    s"""WITH v AS (
       |  SELECT $RevCpSql AS rev_cp, p_type = 'PROMO' AS is_promo
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '$Q14Lo'
       |    AND CAST(l_shipdate AS DATE) < DATE '$Q14Hi'),
       |g AS (SELECT
       |  SUM(CASE WHEN is_promo THEN rev_cp ELSE 0 END) AS promo_cp,
       |  SUM(rev_cp) AS tot_cp FROM v)
       |SELECT
       |  CASE WHEN tot_cp IS NULL OR tot_cp = 0 THEN 0
       |    ELSE CAST((promo_cp * 1000000) // tot_cp AS BIGINT) END
       |    AS promo_ppm,
       |  CAST(COALESCE(promo_cp, 0) AS BIGINT) AS promo_cp,
       |  CAST(COALESCE(tot_cp, 0) AS BIGINT) AS tot_cp
       |FROM g""".stripMargin

  // ------------------------------------------------------------- q308
  // TPC-H Q15: top supplier — suppliers whose quarterly revenue equals
  // the maximum (correlated MAX on the oracle; one-row broadcast max
  // here — never a global window).

  private val Q15Lo = "1996-01-01"
  private val Q15Hi = "1996-04-01"

  private def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = load(s, dir, "lineitem")
      .filter(expr(s"CAST(l_shipdate AS DATE) >= DATE '$Q15Lo' AND " +
        s"CAST(l_shipdate AS DATE) < DATE '$Q15Hi'"))
      .select(col("l_suppkey"), expr(RevCpExpr).as("rev_cp"))
      .groupBy(col("l_suppkey"))
      .agg(dec38Sum(col("rev_cp")).as("total_revenue_cp"))
    val mx = rev.agg(max(col("total_revenue_cp")).as("max_cp"))
    val supp = load(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    rev.crossJoin(broadcast(mx)) // one-row broadcast scalar
      .filter(col("total_revenue_cp") === col("max_cp"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_cp"))
      .orderBy(col("s_suppkey"))
  }

  private val qTopSupplierSql =
    s"""WITH rev AS MATERIALIZED (
       |  SELECT l_suppkey,
       |    CAST(SUM($RevCpSql) AS BIGINT) AS total_revenue_cp
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '$Q15Lo'
       |    AND CAST(l_shipdate AS DATE) < DATE '$Q15Hi'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_revenue_cp
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_revenue_cp = (SELECT MAX(total_revenue_cp) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------- q309
  // TPC-H Q16: parts/supplier relationship — distinct suppliers per
  // (brand, type, size) over the lineitem-derived part-supplier
  // relation, excluding negative-balance suppliers (the complaints
  // stand-in), one brand, the PROMO type and a stated size set.

  private val Q16Brand = "Brand#1"
  private val Q16Sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35)

  private def qPartsSupplierCounts(s: SparkSession, dir: String)
      : DataFrame = {
    val part = load(s, dir, "part")
      .filter(col("p_brand") =!= Q16Brand && col("p_type") =!= "PROMO" &&
        col("p_size").isin(Q16Sizes.map(Integer.valueOf): _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast(LongType).as("p_size"))
    val badSupp = load(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val ps = load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(badSupp, col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    ps.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val qPartsSupplierCountsSql =
    s"""SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> '$Q16Brand' AND p_type <> 'PROMO'
       |  AND p_size IN (${Q16Sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (
       |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------------------- q310
  // TPC-H Q18: large-volume customers — orders whose total quantity
  // exceeds a threshold, with their customer.

  private val Q18MinQty = 250L

  private def qLargeVolumeCustomers(s: SparkSession, dir: String)
      : DataFrame = {
    val big = load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dec38Sum(expr("CAST(l_quantity AS BIGINT)")).as("sum_qty"))
      .filter(col("sum_qty") > Q18MinQty)
    val o = load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        cents("o_totalprice").as("totalprice_c"))
    val cust = load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    big.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_date"), col("totalprice_c"), col("sum_qty"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey"))
  }

  private val qLargeVolumeCustomersSql =
    s"""SELECT c_custkey, c_name, o_orderkey,
       |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
       |  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
       |    AS totalprice_c,
       |  CAST(sum_qty AS BIGINT) AS sum_qty
       |FROM (
       |  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
       |  FROM lineitem GROUP BY 1 HAVING sum_qty > $Q18MinQty) big
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY totalprice_c DESC, o_orderkey""".stripMargin

  // ------------------------------------------------------------- q311
  // TPC-H Q19: discounted revenue — the disjunctive brand/size/qty
  // predicate triple, planned as one equi-join on partkey with the
  // OR-filter above it (the decorrelated Q19 plan).

  private def qDiscountedRevenue(s: SparkSession, dir: String)
      : DataFrame = {
    val part = load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    load(s, dir, "lineitem")
      .select(col("l_partkey"), expr("CAST(l_quantity AS BIGINT)").as("qty"),
        expr(RevCpExpr).as("rev_cp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("qty").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("qty").between(10, 20)) ||
        (col("p_brand") === "Brand#9" && col("p_size").between(1, 15) &&
          col("qty").between(20, 30)))
      .agg(coalesce(dec38Sum(col("rev_cp")), lit(0L)).as("revenue_cp"),
        count(lit(1)).as("n_items"))
  }

  private val qDiscountedRevenueSql =
    s"""SELECT CAST(COALESCE(SUM($RevCpSql), 0) AS BIGINT) AS revenue_cp,
       |  CAST(COUNT(*) AS BIGINT) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |    AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |    AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 15
       |    AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)"""
      .stripMargin

  // ------------------------------------------------------------- q312
  // TPC-H Q20: potential part promotion — suppliers in one region who
  // DOMINATED some PROMO part's volume in one year (shipped more than
  // half of it): the nested part-supplier aggregate with a correlated
  // HAVING on the oracle, two keyed aggregates + a semi-join here.

  private val Q20Year = 1997
  private val Q20Region = "EUROPE"

  private def qDominantPromoSuppliers(s: SparkSession, dir: String)
      : DataFrame = {
    val promo = load(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val ps = load(s, dir, "lineitem")
      .filter(year(col("l_shipdate")) === Q20Year)
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dec38Sum(expr("CAST(l_quantity AS BIGINT)")).as("q_ps"))
    val pt = ps.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q_ps").cast(DecimalType(38, 0))).cast(LongType)
        .as("q_p"))
    val dominant = ps.join(pt, col("l_partkey") === col("pk"))
      .filter(expr("2 * q_ps > q_p"))
      .select(col("l_suppkey")).distinct()
    val nat = load(s, dir, "nation")
    val reg = load(s, dir, "region").filter(col("r_name") === Q20Region)
    load(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val qDominantPromoSuppliersSql =
    s"""WITH ps AS MATERIALIZED (
       |  SELECT l_partkey, l_suppkey,
       |    SUM(CAST(l_quantity AS BIGINT)) AS q_ps
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_type = 'PROMO'
       |    AND year(CAST(l_shipdate AS DATE)) = $Q20Year
       |  GROUP BY 1, 2),
       |pt AS MATERIALIZED (
       |  SELECT l_partkey, SUM(q_ps) AS q_p FROM ps GROUP BY 1)
       |SELECT s_suppkey, s_name
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$Q20Region'
       |  AND EXISTS (
       |    SELECT 1 FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
       |    WHERE ps.l_suppkey = s_suppkey AND 2 * ps.q_ps > pt.q_p)
       |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------- q313
  // TPC-H Q22: global sales opportunity — rich customers (balance
  // above the positive-balance average, stated as the exact
  // cross-multiply bal·n > total) in a stated nation-code set with no
  // RECENT orders (anti-join; "no orders ever" is vacuous on this
  // data — every customer has at least one).

  private val Q22Codes = Seq(1L, 3L, 5L, 7L, 9L)
  private val Q22Recent = "2000-01-01"

  private def qSalesOpportunity(s: SparkSession, dir: String)
      : DataFrame = {
    val cust = load(s, dir, "customer")
      .filter(col("c_nationkey").isin(Q22Codes.map(java.lang.Long.valueOf): _*))
      .select(col("c_custkey"), col("c_nationkey").as("cntrycode"),
        cents("c_acctbal").as("bal_c"))
    val avgScalar = cust.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c").cast(DecimalType(38, 0))).as("tot_c"),
        count(lit(1)).as("n_pos"))
    val recent = load(s, dir, "orders")
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '$Q22Recent'"))
      .select(col("o_custkey")).distinct()
    cust.crossJoin(broadcast(avgScalar)) // one-row broadcast scalar
      // bal > avg  <=>  bal·n_pos > total (exact integers)
      .filter(expr("CAST(bal_c AS DECIMAL(38,0)) * n_pos > tot_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dec38Sum(col("bal_c")).as("totacctbal_c"))
      .orderBy(col("cntrycode"))
  }

  private val qSalesOpportunitySql =
    s"""WITH cust AS MATERIALIZED (
       |  SELECT c_custkey, c_nationkey AS cntrycode,
       |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
       |  FROM customer
       |  WHERE c_nationkey IN (${Q22Codes.mkString(", ")})),
       |avgs AS (
       |  SELECT SUM(bal_c) AS tot_c, COUNT(*) AS n_pos
       |  FROM cust WHERE bal_c > 0)
       |SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       |  CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
       |FROM cust, avgs
       |WHERE bal_c * n_pos > tot_c
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND CAST(o_orderdate AS DATE) >= DATE '$Q22Recent')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q305_tpch_q12_ship_class" -> QueryDef(qShipClassPriority,
      Some(qShipClassPrioritySql),
      "TPC-H Q12 shape: shipping-lateness class vs order priority " +
        "matrix"),
    "q306_tpch_q13_cust_dist" -> QueryDef(qCustomerDistribution,
      Some(qCustomerDistributionSql),
      "TPC-H Q13 shape: customer order-count distribution via LEFT " +
        "join (zero-order customers survive)"),
    "q307_tpch_q14_promo" -> QueryDef(qPromoEffect,
      Some(qPromoEffectSql),
      "TPC-H Q14 shape: promotion revenue share as guarded integer ppm"),
    "q308_tpch_q15_top_supplier" -> QueryDef(qTopSupplier,
      Some(qTopSupplierSql),
      "TPC-H Q15 shape: suppliers at the max quarterly revenue — " +
        "correlated MAX as one-row broadcast scalar"),
    "q309_tpch_q16_parts_suppliers" -> QueryDef(qPartsSupplierCounts,
      Some(qPartsSupplierCountsSql),
      "TPC-H Q16 shape: distinct supplier counts per brand/type/size " +
        "with NOT-IN supplier exclusion as broadcast anti-join"),
    "q310_tpch_q18_large_volume" -> QueryDef(qLargeVolumeCustomers,
      Some(qLargeVolumeCustomersSql),
      "TPC-H Q18 shape: large-volume orders (HAVING sum(qty) > " +
        "threshold) joined back to customers"),
    "q311_tpch_q19_disjunct_revenue" -> QueryDef(qDiscountedRevenue,
      Some(qDiscountedRevenueSql),
      "TPC-H Q19 shape: disjunctive brand/size/quantity predicates " +
        "over one partkey equi-join (no OR-join explosion)"),
    "q312_tpch_q20_dominant_supplier" -> QueryDef(qDominantPromoSuppliers,
      Some(qDominantPromoSuppliersSql),
      "TPC-H Q20 shape: nested part-supplier aggregate with " +
        "correlated HAVING, decorrelated to two keyed aggs + semi-join"),
    "q313_tpch_q22_sales_opportunity" -> QueryDef(qSalesOpportunity,
      Some(qSalesOpportunitySql),
      "TPC-H Q22 shape: above-average balances (exact cross-multiply) " +
        "in a code set with no recent orders (anti-join)"))
}
