package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 37: the RI audit's nonzero-orphan path
  * (TPC-H-shaped data conforms, so the interesting branch needs
  * injection) and the drift report's mode tie rule. */
class Wave37Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q267 counts injected orphans and reports the smallest exemplar") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w37a_").toString
    // parents
    Seq((1L, "o"), (2L, "o")).toDF("o_orderkey", "pad")
      .select($"o_orderkey", $"pad".as("o_custkey"))
      .selectExpr("o_orderkey", "1L AS o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(1L).toDF("p_partkey").write.mode("overwrite")
      .parquet(s"$tmp/part.parquet")
    Seq(1L, 2L).toDF("s_suppkey").write.mode("overwrite")
      .parquet(s"$tmp/supplier.parquet")
    Seq((1L, 7L)).toDF("c_custkey", "c_nationkey").write.mode("overwrite")
      .parquet(s"$tmp/customer.parquet")
    Seq(7L).toDF("n_nationkey").write.mode("overwrite")
      .parquet(s"$tmp/nation.parquet")
    // children: orderkeys {1,2,9,5} -> orphans {5,9}; partkeys {1,3}
    // -> orphan {3}; suppkeys all valid
    Seq((1L, 1L, 1L), (2L, 1L, 2L), (9L, 3L, 1L), (5L, 1L, 2L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q267_ri_audit")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_orphan_keys"), r.getAs[Long]("first_orphan"),
          r.getAs[Long]("n_child_keys"))).toMap
    assert(got("lineitem.orderkey->orders") == ((2L, 5L, 4L)))
    assert(got("lineitem.partkey->part") == ((1L, 3L, 2L)))
    assert(got("lineitem.suppkey->supplier") == ((0L, -1L, 2L)))
    assert(got("orders.custkey->customer") == ((0L, -1L, 1L)))
    assert(got("customer.nationkey->nation") == ((0L, -1L, 1L)))
  }

  test("q268 drift report pins the mode tie rule and exact shares") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w37b_").toString
    // pre-1996: priorities A×2, B×2 (tie -> smallest value 'A' wins);
    // post: B×3, A×1
    val rows = Seq(
      ("A", "O", "1994-03-01"), ("A", "O", "1994-04-01"),
      ("B", "F", "1995-01-01"), ("B", "F", "1995-02-01"),
      ("B", "O", "1996-05-01"), ("B", "O", "1997-06-01"),
      ("B", "F", "1998-01-01"), ("A", "F", "1996-09-09"))
      .zipWithIndex.map { case ((pr, st, d), i) =>
        (i.toLong, 1L, pr, st, java.sql.Date.valueOf(d), 10.0)
      }
    rows.toDF("o_orderkey", "o_custkey", "o_orderpriority",
        "o_orderstatus", "o_orderdate", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Registry.queries("q268_profile_drift")(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    val pr = got("o_orderpriority")
    assert(pr.getAs[Long]("n_pre") == 4L && pr.getAs[Long]("n_post") == 4L)
    assert(pr.getAs[String]("top_v_pre") == "A",
      "tie must break to the smallest value")
    assert(pr.getAs[Long]("top_share_pre_ppm") == 500000L)
    assert(pr.getAs[String]("top_v_post") == "B")
    assert(pr.getAs[Long]("top_share_post_ppm") == 750000L)
    assert(pr.getAs[Long]("share_drift_ppm") == 250000L)
    assert(pr.getAs[Long]("ndv_pre") == 2L && pr.getAs[Long]("ndv_delta") == 0L)
    val yr = got("o_shipyear")
    assert(yr.getAs[Long]("ndv_pre") == 2L && yr.getAs[Long]("ndv_post") == 3L)
  }
}
