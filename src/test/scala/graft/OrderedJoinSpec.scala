package graft

import graft.ops.StatsPlanner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q318's plan gate (round-12 verdict ask #3): the histogram-ordered
  * star join must EXECUTE in the chosen order — most selective dim
  * innermost — with the chosen build sides, and the ordering must be
  * invisible in the result (any order joins the same rows). */
class OrderedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def fact = Tables.load(spark, dir, "lineitem").select(
    col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
    expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
      .as("vc"))

  private def dims = Seq(
    StatsPlanner.JoinDim("part",
      Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_size")),
      col("l_partkey") === col("p_partkey"), "p_size", 45L),
    StatsPlanner.JoinDim("supplier",
      Tables.load(spark, dir, "supplier").select(col("s_suppkey"),
        expr("CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT)")
          .as("s_bal_c")),
      col("l_suppkey") === col("s_suppkey"), "s_bal_c", 400000L),
    StatsPlanner.JoinDim("orders",
      Tables.load(spark, dir, "orders").select(col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
          .as("o_total_c")),
      col("l_orderkey") === col("o_orderkey"), "o_total_c", 8000000L))

  test("chosen order is most-selective-first and estimates track exact") {
    val (_, plans) = StatsPlanner.orderedJoin(fact, dims)
    assert(plans.map(p => (p.name, p.pos)) ==
      Seq(("part", 0), ("supplier", 1), ("orders", 2)),
      s"plans=$plans")
    assert(plans.map(_.selPpm) == plans.map(_.selPpm).sorted)
    // estimate quality: within one equi-depth bucket of exact per dim
    for ((d, p) <- dims.sortBy(_.name).zip(plans.sortBy(_.name))) {
      val exact = d.dim.filter(col(d.filterCol) > d.gt).count()
      val n = d.dim.count()
      assert(math.abs(p.est - exact) <= n / 16 + 1,
        s"${d.name}: est=${p.est} exact=$exact n=$n")
    }
    // all three dims are inside the absolute cap at this SF
    assert(plans.forall(_.plan == "broadcast"), plans.toString)
  }

  test("the EXECUTED plan nests the joins in the chosen sequence") {
    val (joined, _) = StatsPlanner.orderedJoin(fact, dims)
    val phys = joined.queryExecution.executedPlan.toString
    // three pinned broadcast joins
    assert("BroadcastHashJoin".r.findAllIn(phys).size == 3, phys)
    // tree print order is root-first: the OUTERMOST (last-executed)
    // join prints before the inner ones, so the first occurrence of
    // each dim's key column orders the joins outermost->innermost.
    // Chosen order part->supplier->orders nests part INNERMOST.
    val iOrd = phys.indexOf("o_orderkey")
    val iSup = phys.indexOf("s_suppkey")
    val iPart = phys.indexOf("p_partkey")
    assert(iOrd >= 0 && iSup >= 0 && iPart >= 0, phys)
    assert(iOrd < iSup && iSup < iPart,
      s"expected orders<supplier<part print order, got $iOrd/$iSup/$iPart")
  }

  test("ordering is invisible in the result: reversed declaration joins the same rows") {
    val (chosen, _) = StatsPlanner.orderedJoin(fact, dims)
    val (reversed, plansRev) = StatsPlanner.orderedJoin(fact, dims.reverse)
    // the planner re-orders regardless of declaration order...
    assert(plansRev.map(_.name) == Seq("part", "supplier", "orders"))
    // ...and a hand-built WORST order still agrees on the aggregate
    val worst = dims.sortBy(_.name).reverse.foldLeft(fact) { (acc, d) =>
      acc.join(d.dim.filter(col(d.filterCol) > d.gt), d.joinCond)
    }
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), sum(col("vc").cast("decimal(38,0)")))
      .collect().head.toString
    assert(agg(chosen) == agg(worst))
    assert(agg(chosen) == agg(reversed))
  }
}
