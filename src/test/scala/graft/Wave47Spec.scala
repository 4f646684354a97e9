package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referee for wave 47: golden-record selection replayed by hand on a
  * fixture with a fuzzy chain, an exact-duplicate group, a tie on the
  * survivorship rule, and singletons that must not appear. */
class Wave47Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q291 clusters the chain, folds exact dups, elects by orders then key") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w47a_").toString
    // nation 1: chain abcd ~ abed ~ abee (one cluster of 3 names),
    //   plus an exact-dup group (two customers named "zzzz"),
    //   plus singleton "qqqq" (must not appear).
    // nation 2: "abcd" again — nations block, separate singleton.
    val customers = Seq(
      (10L, "abcd", 1), (11L, "abed", 1), (12L, "abee", 1),
      (20L, "zzzz", 1), (21L, "zzzz", 1),
      (30L, "qqqq", 1), (40L, "abcd", 2))
    customers.toDF("c_custkey", "c_name", "c_nationkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    // orders: key 11 has 3 orders (wins the chain cluster); 20 and 21
    // tie at 1 order each -> lowest key 20 wins the dup group
    val orders = Seq((100L, 11L), (101L, 11L), (102L, 11L),
      (103L, 20L), (104L, 21L), (105L, 10L))
    orders.toDF("o_orderkey", "o_custkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")

    val got = Registry.queries("q291_golden_record")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("cluster_id"),
        r.getAs[Long]("nation"), r.getAs[Long]("n_members"),
        r.getAs[Long]("canonical_key"), r.getString(4),
        r.getAs[Long]("canonical_orders"))).toList
    assert(got == List(
      // chain cluster: nodes {10, 11, 12}, id = min nid = 10;
      // canonical = key 11 (3 orders)
      (10L, 1L, 3L, 11L, "abed", 3L),
      // exact-dup group: singleton name node, 2 members, tie on
      // orders -> lowest key 20
      (20L, 1L, 2L, 20L, "zzzz", 1L)), s"got=$got")
    // singletons (30, 40) absent
    assert(!got.exists(t => t._1 == 30L || t._1 == 40L))
  }
}
