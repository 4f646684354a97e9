package graft

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster deployment path: with
  * `spark.sql.extensions=graft.functions.GraftExtensions` set at
  * context build (TestSpark sets it, the way a shared cluster passes
  * --conf), a FRESH session must expose the SQL function and plan the
  * custom operator with NO per-session registration calls. newSession()
  * rebuilds SessionState from the extensions, so it proves the
  * injection rather than some earlier suite's manual register/ensure. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-injected session resolves graft_dot and plans TopKPerGroup") {
    val s2 = TestSpark.spark.newSession()

    // SQL-callable custom expression, no vec.register(...) call
    val d = s2.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(d == 11.0)

    // SQL-callable custom AGGREGATE: two +1 votes on bit0 (masks 1, 3)
    // outvote nothing; bit1 splits 1-1 → negative wins → fp = 1
    val fp = s2.sql(
      "SELECT graft_simhash(m, 4) AS fp FROM VALUES (1L), (3L), (0L) t(m)")
      .collect()(0).getLong(0)
    assert(fp == 1L, s"fp=$fp")

    // SQL-callable vector-sum aggregate: element-wise over two rows
    val vs = s2.sql(
      "SELECT graft_vecsum(v, 2) AS s FROM VALUES (array(1L, 10L)), " +
        "(array(2L, 20L)) t(v)")
      .collect()(0).getSeq[Long](0)
    assert(vs == Seq(3L, 30L), s"vecsum=$vs")

    // SQL-callable exact integer sqrt (q162's stddev device)
    val iq = s2.sql(
      "SELECT graft_isqrt(x) AS s FROM VALUES (0L), (15L), (16L), " +
        "(9223372036854775807L) t(x) ORDER BY s")
      .collect().map(_.getLong(0)).toSeq
    assert(iq == Seq(0L, 3L, 4L, 3037000499L), s"isqrt=$iq")

    // the custom logical node plans through the INJECTED strategy —
    // TopK.ensure is deliberately not called on this session
    import s2.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val plan = graft.plans.TopKPerGroup(
      Seq(GraftBridge.eagerExpression(col("g"))),
      Seq(SortOrder(GraftBridge.eagerExpression(col("id")), Ascending)),
      1, GraftBridge.logicalPlan(df))
    val q = GraftBridge.ofRows(s2, plan)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = q.orderBy(col("g")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (3L, "b")))

    // and the optimizer rule rides along: a group filter above the
    // node is pushed below it (then ConvertToLocalRelation folds it
    // straight into the local data — so no Filter survives AND group
    // "b" is gone before the top-k runs)
    val filtered = GraftBridge.ofRows(s2, plan).filter(col("g") =!= "b")
    val optimized = filtered.queryExecution.optimizedPlan
    val filterAbove = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
    assert(filterAbove.isEmpty, s"filter was not pushed+folded:\n$optimized")
    assert(filtered.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a")))
  }
}
