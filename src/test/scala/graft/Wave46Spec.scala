package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referees for wave 46: the F2 estimators against exact BigInt
  * replicas, and FK discovery against hand-computed containment on a
  * fixture with a planted orphan and a nested-domain control. */
class Wave46Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q289 matches BigInt replicas of all three estimators") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w46a_").toString
    val rng = new scala.util.Random(41)
    // skewed key frequencies so uniformity is visibly wrong
    val rows = (1 to 8000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else (i % 997).toLong + 100L
      (i.toLong, k)
    }
    rows.map { case (i, k) => (k, i, 1.0) }
      .toDF("l_orderkey", "l_partkey", "l_quantity").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    val w = rows.groupBy(_._2).map { case (k, xs) => k -> BigInt(xs.size) }
    val n = w.values.sum; val d = BigInt(w.size)
    val f2 = w.values.map(x => x * x).sum
    def h(k: Long): Long =
      ((k % 1000000007L) * 2654435761L) % 2147483648L
    val sample = w.keys.toSeq.sortBy(k => (h(k), k)).take(64)
    val sW2 = sample.map(k => w(k) * w(k)).sum
    val hK = sample.map(h).max
    val dEst = BigInt(63) * 2147483648L / hK
    val estUniform = n * n / d
    val estKmv = dEst * sW2 / 64
    def ppm(e: BigInt) = ((e - f2) * 1000000 / f2).toLong

    val got = Registry.queries("q289_join_cardinality")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("estimate"), r.getAs[Long]("err_ppm"))).toMap
    assert(got("exact_f2") == (f2.toLong, 0L))
    assert(got("uniformity") == (estUniform.toLong, ppm(estUniform)))
    assert(got("kmv_sampled") == (estKmv.toLong, ppm(estKmv)))
  }

  test("q290 separates a real FK, a planted orphan, and the nested-domain control") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w46b_").toString
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$name.parquet")
    // orders 1..100; lineitem references 1..100 PLUS orphan key 999
    write("orders", (1L to 100L).map(k => (k, k)).toDF("o_orderkey", "o_custkey"))
    write("customer", (1L to 100L).map(k => (k, 1)).toDF("c_custkey", "c_nationkey"))
    write("nation", Seq((1, "a")).toDF("n_nationkey", "n_name"))
    write("part", (1L to 500L).map(k => (k, 1)).toDF("p_partkey", "p_size"))
    write("supplier", (1L to 20L).map(k => (k, "s")).toDF("s_suppkey", "s_name"))
    write("lineitem", ((1L to 100L) :+ 999L).zipWithIndex.map {
      case (o, i) => (o, (i % 500) + 1L, (i % 20) + 1L)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey"))

    val got = Registry.queries("q290_fk_discovery")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("containment_ppm"), r.getAs[Boolean]("parent_unique"),
          r.getAs[Long]("coverage_ppm"), r.getAs[Boolean]("is_fk_candidate")))
      .toMap
    // planted orphan: 100 of 101 distinct child keys contained
    assert(got("li_orders") == (100L * 1000000L / 101L, true,
      1000000L, false))
    // clean FK
    assert(got("orders_cust") == (1000000L, true, 1000000L, true))
    // nested-domain control: full containment (suppkeys 1..20 nest in
    // partkeys 1..500) but coverage exposes it
    assert(got("supp_as_part_CTRL") == (1000000L, true,
      20L * 1000000L / 500L, true))
  }
}
