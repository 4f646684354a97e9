package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 26 (q248–q249). */
class Wave26Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Scala replica of the exact Shapley computation over the
    * empirical 16-subset lattice (ppm-truncated v, coef/24 scaling). */
  private def shapleyReferee(users: Seq[(Set[String], Boolean)])
      : Map[String, Long] = {
    val bits = Map("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)
    val byMask = users.groupBy { case (chs, _) =>
      chs.map(bits).sum }
    def v(mask: Int): Long = byMask.get(mask) match {
      case None => 0L
      case Some(g) =>
        g.count(_._2).toLong * 1000000L / g.size.toLong
    }
    def coef(s: Int) = Seq(6L, 2L, 2L, 6L)(s)
    bits.map { case (ch, b) =>
      ch -> (0 until 16).filter(m => (m & b) == 0).map { m =>
        coef(Integer.bitCount(m)) * (v(m | b) - v(m))
      }.sum
    }
  }

  private def writeEvents(tmp: String,
      users: Seq[(Long, Set[String], Boolean)]): Unit = {
    import spark.implicits._
    val rows = users.flatMap { case (u, chs, conv) =>
      val touch = chs.toSeq.sorted.zipWithIndex.map { case (c, i) =>
        (u * 100L + i, u, c, i.toLong) }
      val buy = if (conv) Seq((u * 100L + 99L, u, "purchase", 99L))
        else Seq.empty
      touch ++ buy
    }
    rows.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
  }

  test("q248 Shapley values equal the lattice replica and sum to " +
      "v(full) - v(empty)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w26_").toString
    // NOTE: a zero-touch NON-converting user emits no event rows at all
    // and so cannot exist in the table; mask-0 support comes only from
    // purchase-only users (user 10).
    val users = Seq[(Long, Set[String], Boolean)](
      (1L, Set("click"), true), (2L, Set("click"), false),
      (3L, Set("view"), false), (4L, Set("click", "view"), true),
      (5L, Set("click", "view"), true),
      (6L, Set("signup", "view"), true),
      (8L, Set("error"), false),
      (9L, Set("click", "error", "signup", "view"), true),
      (10L, Set.empty[String], true),
      (11L, Set("click", "error", "signup", "view"), false))
    writeEvents(tmp, users)
    val ref = shapleyReferee(users.map(u => (u._2, u._3)))
    val got = Registry.queries("q248_shapley_attribution")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set("click", "error", "signup", "view"))
    for ((ch, (_, _, scaled, ppm)) <- got) {
      assert(scaled == ref(ch), s"$ch: got $scaled want ${ref(ch)}")
      assert(ppm == scaled / 24L)
    }
    // efficiency: credits sum to 24·(v(full) − v(∅)) exactly
    val vFull = 500000L // users 9 (yes) and 11 (no) hold the full set
    val vEmpty = 1000000L // user 10 (purchase-only, converted)
    assert(got.values.map(_._3).sum == 24L * (vFull - vEmpty))
    // exposure: click touched by users 1,2,4,5,9,11 (4 convert)
    assert(got("click")._1 == 6L && got("click")._2 == 4L)
  }

  test("q249 ladder picks the least-generalized level meeting k") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w26_").toString
    // K=10. Build orders: 2 priorities x 1 year x 2 quarters; within
    // each (prio, quarter): 6 orders in month A + 6 in month B -> level
    // 0 groups of 6 (fails), level 1 groups of 12 (passes).
    def t(month: Int) = java.sql.Timestamp.valueOf(
      f"1995-$month%02d-15 00:00:00")
    val rows = for {
      prio <- Seq("1-URGENT", "2-HIGH")
      (m1, m2) <- Seq((1, 2), (4, 5)) // two quarters, two months each
      m <- Seq(m1, m2); i <- 1 to 6
    } yield (prio.hashCode.toLong * 100 + m * 10 + i, prio, t(m))
    rows.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = Registry.queries("q249_generalization_ladder")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toList
    assert(got == List(
      (0L, 8L, 6L, 6L, false, false),   // 2 prio x 4 months, n=6 < 10
      (1L, 4L, 12L, 12L, true, true),   // 2 prio x 2 quarters, n=12
      (2L, 2L, 24L, 24L, true, false),  // 2 prio x 1 year
      (3L, 1L, 48L, 48L, true, false)), // 1 year
      s"got=$got")
  }

  test("q248/q249 are empty-input-safe") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w26_").toString
    Seq.empty[(Long, Long, String, Double)]
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(0)"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    Seq.empty[(Long, String)].toDF("o_orderkey", "o_orderpriority")
      .withColumn("o_orderdate", expr("timestamp_micros(0)"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val sh = Registry.queries("q248_shapley_attribution")(spark, tmp)
      .collect()
    assert(sh.length == 4 && sh.forall(r =>
      r.getLong(3) == 0L && r.getLong(1) == 0L))
    val gl = Registry.queries("q249_generalization_ladder")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4),
        r.getBoolean(5))).toList
    assert(gl == List((0L, 0L, false, false), (1L, 0L, false, false),
      (2L, 0L, false, false), (3L, 0L, false, false)))
  }
}
