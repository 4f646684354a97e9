package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 21 (q234–q236). */
class Wave21Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q234 Theil-Sen median slope equals the brute-force pair scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w21_").toString
    // one nation, weekly revenue with an OUTLIER week that drags OLS
    // but not the median slope
    val epochWk = 604800L // seconds per week
    val weeks = Seq( // (week index, dollars)
      (1400L, 100.00), (1401L, 110.00), (1402L, 120.00),
      (1403L, 130.00), (1404L, 9000.00))
    val orders = weeks.zipWithIndex.map { case ((wk, usd), i) =>
      (i.toLong + 1L, 1L, usd,
        new java.sql.Timestamp(wk * epochWk * 1000L))
    }
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, 7L)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((7L, "X")).toDF("n_nationkey", "n_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/nation.parquet")

    val got = Registry.queries("q234_theil_sen")(spark, tmp).collect()
    assert(got.length == 1)
    val r = got.head

    // brute force in cents
    val cents = weeks.map { case (wk, usd) =>
      (wk, math.floor(usd * 100.0 + 0.5).toLong) }
    // Scala Long division truncates toward zero, same as Spark `div`
    val slopes = (for {
      (w1, c1) <- cents; (w2, c2) <- cents if w1 < w2
    } yield (c2 - c1) / (w2 - w1)).sorted
    val nPairs = slopes.length
    val median = slopes((nPairs + 1) / 2 - 1)
    assert(r.getAs[Long]("n_weeks") == 5L)
    assert(r.getAs[Long]("n_pairs") == nPairs.toLong)
    assert(r.getAs[Long]("theil_cpw") == median,
      s"theil=${r.getAs[Long]("theil_cpw")} expected $median")
    // the outlier week must have pulled OLS far above the median slope
    assert(r.getAs[Long]("ols_cpw") > 10L * math.abs(median))
  }

  test("q235 rules equal the brute-force basket scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w21_").toString
    // 6 baskets over brands A,B,C,D: {A,B,C} x3, {A,B,D}, {C,D}, {A}
    val baskets = Seq(
      Seq("A", "B", "C"), Seq("A", "B", "C"), Seq("A", "B", "C"),
      Seq("A", "B", "D"), Seq("C", "D"), Seq("A"))
    val items = baskets.zipWithIndex.flatMap { case (bs, i) =>
      bs.map(b => (i.toLong + 1L, b)) }
    val partOf = items.map(_._2).distinct.sorted.zipWithIndex
      .map { case (b, i) => (i.toLong + 1L, b) }
    val brandKey = partOf.map { case (k, b) => b -> k }.toMap
    items.map { case (ok, b) => (ok, brandKey(b)) }
      .toDF("l_orderkey", "l_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    partOf.toDF("p_partkey", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/part.parquet")

    val got = Registry.queries("q235_assoc_rules")(spark, tmp)
      .collect().map(r => (r.getAs[String]("ante1"),
        r.getAs[String]("ante2"), r.getAs[String]("cons"),
        r.getAs[Long]("n_abc"), r.getAs[Long]("support_ppm"),
        r.getAs[Long]("conf_ppm"), r.getAs[Long]("lift_ppm"))).toSet

    // brute force: the only triple with support >= 2 is (A,B,C) x3
    val n = baskets.length.toLong // 6
    val nAB = baskets.count(b => b.contains("A") && b.contains("B")).toLong
    val nAC = baskets.count(b => b.contains("A") && b.contains("C")).toLong
    val nBC = baskets.count(b => b.contains("B") && b.contains("C")).toLong
    val nA = baskets.count(_.contains("A")).toLong
    val nB = baskets.count(_.contains("B")).toLong
    val nC = baskets.count(_.contains("C")).toLong
    def rule(ab: Long, c: Long) =
      (3L * 1000000L / n, 3L * 1000000L / ab, 3L * n * 1000000L / (ab * c))
    val (s1, c1, l1) = rule(nAB, nC)
    val (s2, c2, l2) = rule(nAC, nB)
    val (s3, c3, l3) = rule(nBC, nA)
    val expected = Set(
      ("A", "B", "C", 3L, s1, c1, l1),
      ("A", "C", "B", 3L, s2, c2, l2),
      ("B", "C", "A", 3L, s3, c3, l3))
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("q236 top paths equal the brute-force trigram walk") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w21_").toString
    val M = 1000000L
    // user 1: one session v,c,p,v -> trigrams (v,c,p), (c,p,v); then a
    // separate session (gap) x,y,z -> (x,y,z)
    // user 2: v,c,p -> (v,c,p)
    val ev = Seq(
      (1L, 1L, "v", 0L), (2L, 1L, "c", 60L * M), (3L, 1L, "p", 120L * M),
      (4L, 1L, "v", 180L * M),
      (5L, 1L, "x", 10000L * M), (6L, 1L, "y", 10060L * M),
      (7L, 1L, "z", 10120L * M),
      (8L, 2L, "v", 0L), (9L, 2L, "c", 60L * M), (10L, 2L, "p", 120L * M))
    ev.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val got = Registry.queries("q236_top_paths")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toList
    val expected = List(
      ("v", "c", "p", 2L, 2L), // n desc first, then lexical
      ("c", "p", "v", 1L, 1L),
      ("x", "y", "z", 1L, 1L))
    assert(got == expected, s"got=$got")
  }
}
