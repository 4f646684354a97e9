package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Twins for wave 39: density-adaptive k-core vs a Scala-set peel
  * referee, the Merkle repair plan's one-file drill-down property, and
  * streaming-profile == batch-profile equality. */
class Wave39Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q270 equals a brute-force peel and its core is non-empty") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w39a_").toString
    // two 6-cliques (parts 1-6 and 11-16, one order per pair) plus a
    // degree-1 tail (parts 7-10 each co-ordered once with part 1):
    // E=34, V=16 -> k = floor(34/16) = 2, and the peel strips the
    // tail (degree 1) while both cliques plus part 1 survive — the
    // loop does real work AND the core is non-empty, both asserted.
    val cliquePairs = (for {
      base <- Seq(0L, 10L); a <- 1L to 6L; b <- (a + 1) to 6L
    } yield (base + a, base + b))
    val tailPairs = (7L to 10L).map(p => (1L, p))
    val pairs = cliquePairs ++ tailPairs
    val li = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong + 1L, a), (i.toLong + 1L, b))
    }
    li.toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    // referee: k = floor(E/V), then peel to fixpoint (< 8 rounds here)
    var edges = pairs.toSet
    val nodes = edges.flatMap(e => Set(e._1, e._2))
    val k = math.max(1L, edges.size.toLong / nodes.size)
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val wantDeg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }

    val got = Registry.queries("q270_k_core_adaptive")(spark, tmp).collect()
    assert(got.nonEmpty, "adaptive core must be non-empty by the " +
      "degeneracy bound")
    for (r <- got) {
      assert(r.getAs[Long]("k_used") == k)
      assert(r.getAs[Long]("core_nodes") == wantDeg.size.toLong)
      assert(r.getAs[Long]("core_edges") == edges.size.toLong)
      assert(wantDeg(r.getAs[Long]("node")) == r.getAs[Long]("degree"))
    }
    // and on the real corpus the core is non-empty too (the whole
    // point of the adaptive threshold — q243's fixed one is vacuous
    // above sf0.01)
    val real = Registry.queries("q270_k_core_adaptive")(
      spark, "/root/testdata/sf0.001").collect()
    assert(real.nonEmpty && real.head.getAs[Long]("core_nodes") > 0)
  }

  test("q271 one-file divergence ships exactly that file's ranges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w39b_").toString
    // maxTx = 100 -> t1 = 40. Files 150 and 151 share Merkle leaf 1
    // (mxF = 6400 -> leaf = f*64 div 6401); 150 diverges (tx 80 > t1),
    // 151 is fully snapshot'd, 6400 carries the head and diverges.
    val events = Seq(
      (150L, 10L), (150L, 80L),
      (151L, 20L), (151L, 30L),
      (6400L, 40L), (6400L, 100L))
    events.toDF("user_id", "event_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Registry.queries("q271_merkle_repair")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("file_id"),
        r.getAs[Long]("leaf"), r.getAs[Long]("rep_last"),
        r.getAs[Long]("n_missing"), r.getAs[Long]("ship_start"),
        r.getAs[Long]("ship_end"), r.getAs[Long]("ship_last_tx")))
      .toList
    // file 151 lives in the SAME divergent leaf as 150 but is in sync:
    // the drill-down must not re-ship it. file 150 misses tx 80:
    // range [3000, 3000+100+(150%37)*10] = [3000, 3120]. file 6400
    // misses tx 100: range [0, 100+(6400%37)*10] = [0, 460].
    assert(got == List(
      (150L, 1L, 10L, 1L, 3000L, 3120L, 80L),
      (6400L, 63L, 40L, 1L, 0L, 460L, 100L)), s"got=$got")
  }

  test("q272 streaming profile equals the batch q263 statistics") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Registry.queries("q272_stream_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toList
    val batch = Registry.queries("q263_table_profile")(spark, dir)
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("ndv_est"), col("min_s"), col("max_s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toList
    assert(streamed == batch,
      s"streamed=$streamed\nbatch=$batch")
  }
}
