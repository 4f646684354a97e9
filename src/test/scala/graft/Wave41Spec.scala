package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referees for wave 41: consistent-hash ring invariants against a
  * Scala replica, Neyman allocation against exact BigInt arithmetic,
  * and the watermark planner against hand-built lateness. */
class Wave41Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5p(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 6).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
  }

  test("q277 matches the ring replica; moved keys land ONLY on node 8") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w41a_").toString
    val keys = (1L to 500L)
    keys.map(k => (k, k)).toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    def ring(nNodes: Int): Seq[(Long, Int)] = // (pos, node) sorted
      (for (n <- 0 until nNodes; v <- 0 until 16)
        yield (md5p(s"n$n|v$v"), n)).sortBy(_._1)
    def assign(r: Seq[(Long, Int)], kpos: Long): Int =
      r.find(_._1 >= kpos).getOrElse(r.head)._2
    val r8 = ring(8); val r9 = ring(9)
    val asg = keys.map { k =>
      val kp = md5p(s"k|$k")
      (k, assign(r8, kp), assign(r9, kp))
    }
    // the consistent-hashing contract: a key either stays, or moves
    // to the NEW node — never between old nodes
    assert(asg.forall { case (_, a, b) => a == b || b == 8 })
    val moved = asg.count { case (_, a, b) => a != b }
    val before = asg.groupBy(_._2).map { case (n, xs) => n.toLong -> xs.size.toLong }
    val after = asg.groupBy(_._3).map { case (n, xs) => n.toLong -> xs.size.toLong }

    val got = Registry.queries("q277_hash_ring")(spark, tmp).collect()
    assert(got.forall(_.getAs[Long]("n_moved") == moved.toLong))
    for (r <- got) {
      val n = r.getAs[Long]("node")
      assert(r.getAs[Long]("keys_before") == before.getOrElse(n, 0L))
      assert(r.getAs[Long]("keys_after") == after.getOrElse(n, 0L))
    }
    // node 8 gained exactly the moved keys
    assert(after.getOrElse(8L, 0L) == moved.toLong)
  }

  test("q278 equals exact BigInt Neyman allocation and sums to n") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w41b_").toString
    val rng = new scala.util.Random(5)
    val rows = (0 until 600).map { i =>
      val stratum = s"P${i % 3}"
      // distinct spreads per stratum so sigma differs
      val price = (i % 3 + 1) * 100.0 + rng.nextInt(50 * (i % 3 + 1))
      (i.toLong, stratum, price)
    }
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")

    def isqrt(x: BigInt): BigInt = {
      if (x == 0) BigInt(0)
      else {
        var s = BigInt(math.floor(math.sqrt(x.toDouble)).toLong)
        while (s * s > x) s -= 1
        while ((s + 1) * (s + 1) <= x) s += 1
        s
      }
    }
    val byStr = rows.groupBy(_._2).toSeq.sortBy(_._1)
    val stats = byStr.map { case (st, xs) =>
      val cents = xs.map(r => BigInt(math.floor(r._3 * 100.0 + 0.5).toLong))
      val n = BigInt(cents.size)
      val s1 = cents.sum; val s2 = cents.map(c => c * c).sum
      val v = (n * s2 - s1 * s1) / (n * n)
      (st, n, isqrt(v))
    }
    val wTot = stats.map { case (_, n, sd) => n * sd }.sum
    val quotas = stats.map { case (st, n, sd) =>
      val w = n * sd
      (st, n, sd, (BigInt(10000) * w) / wTot, (BigInt(10000) * w) % wTot)
    }
    val leftover = 10000 - quotas.map(_._4).sum.toLong
    val bump = quotas.sortBy { case (st, _, _, _, rem) => (-rem, st) }
      .take(leftover.toInt).map(_._1).toSet
    val want = quotas.map { case (st, n, sd, base, _) =>
      (st, n.toLong, sd.toLong,
        base.toLong + (if (bump(st)) 1L else 0L))
    }.sortBy(_._1)

    val got = Registry.queries("q278_neyman_allocation")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getAs[Long]("nh"),
        r.getAs[Long]("sd"), r.getAs[Long]("alloc"))).toList
    assert(got == want.toList, s"got=$got want=$want")
    assert(got.map(_._4).sum == 10000L)
  }

  test("q279 prices hand-built lateness and recommends the minimum") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w41c_").toString
    // one user, arrival order = event_id; lateness is measured vs the
    // RUNNING MAX event time (base+999s after the first 1000 events):
    // two events 2s behind it, one 40s behind it. completeness:
    // 0s/1s: 1000/1003 = 997008 ppm; 5s/30s: 1002/1003 = 999002 ppm
    // (>= the 999000 target -> 5s is the minimal recommendation);
    // 60s/300s: 1003/1003.
    val base = 1700000000000000L
    val maxUs = base + 999 * 1000000L
    val onTime = (0 until 1000).map(i =>
      (1L, i.toLong, base + i * 1000000L))
    val late2s = Seq((1L, 1000L, maxUs - 2000000L),
      (1L, 1001L, maxUs - 2000000L))
    val late40s = Seq((1L, 1002L, maxUs - 40000000L))
    (onTime ++ late2s ++ late40s)
      .map { case (u, e, us) =>
        (u, e, new java.sql.Timestamp(us / 1000), "click")
      }
      .toDF("user_id", "event_id", "ts", "event_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queries("q279_watermark_planner")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("delay_us"),
        r.getAs[Long]("n_on_time"),
        r.getAs[Boolean]("recommended"))).toList
    assert(got == List(
      (0L, 1000L, false), (1000000L, 1000L, false),
      (5000000L, 1002L, true), (30000000L, 1002L, false),
      (60000000L, 1003L, false), (300000000L, 1003L, false)), s"got=$got")
  }
}
