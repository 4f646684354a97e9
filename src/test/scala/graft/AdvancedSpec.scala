package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the sixth-wave battery (q145–q151): each
  * test checks the query against an independently-computed ground
  * truth or a conservation law, not against its own implementation. */
class AdvancedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q145 dropDuplicatesWithinWatermark == batch distinct") {
    val out = Registry.queries("q145_stream_dedup_wm")(spark, dir)
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    // the stream injected an exact duplicate of every 7th event one
    // micro-batch later; the result must be the undoubled event log
    assert(out.count() == events.count())
    assert(out.exceptAll(events).isEmpty && events.exceptAll(out).isEmpty,
      "streaming dedup must reproduce the batch-distinct event set")
  }

  test("q146 k-anonymity: groups partition customers, flags consistent") {
    val out = Registry.queries("q146_k_anonymity")(spark, dir).collect()
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == nCust,
      "QI groups must partition the customer set")
    for (r <- out) {
      val (n, l) = (r.getAs[Long]("n_members"), r.getAs[Long]("l_distinct"))
      assert(l <= 5, "only five order priorities exist")
      assert(r.getAs[Int]("k_ok") == (if (n >= 5) 1 else 0))
      assert(r.getAs[Int]("l_ok") == (if (l >= 3) 1 else 0))
      assert(n >= 1)
    }
  }

  test("q147 clustering coefficient: bounded, triangle-consistent") {
    val out = Registry.queries("q147_clustering_coeff")(spark, dir).collect()
    val triangles = Registry.queries("q122_triangles")(spark, dir).count()
    // each triangle credits exactly its three corners
    assert(out.map(_.getAs[Long]("tri")).sum == 3 * triangles,
      "per-node triangle credits must total 3x the global count")
    for (r <- out) {
      val (deg, tri, lcc) = (r.getAs[Long]("deg"), r.getAs[Long]("tri"),
        r.getAs[Long]("lcc_ppm"))
      assert(deg >= 1, "isolated nodes cannot appear in an edge list")
      assert(tri <= deg * (deg - 1) / 2,
        "a node cannot close more wedges than it has")
      assert(lcc >= 0 && lcc <= 1000000, "lcc is a ppm fraction")
      if (deg < 2) assert(lcc == 0 && tri == 0)
    }
  }

  test("q148 boolean search: every hit contains both terms, never the negation") {
    val hits = Registry.queries("q148_bool_search")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w")).collect()
    val expected = docs.filter { r =>
      val w = r.getSeq[String](1).toSet
      w("vector") && w("hash") && !w("slow")
    }.map(_.getLong(0)).toSet
    assert(hits == expected, "posting-list algebra must equal direct evaluation")
    assert(hits.nonEmpty, "gate must exercise a non-empty result")
  }

  test("q149 HOF stats: equal to a plain-Scala recompute per vector") {
    val out = Registry.queries("q149_hof_array_stats")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    assert(vecs.nonEmpty && out.size == vecs.length)
    for (r <- vecs) {
      val id = r.getLong(0)
      val q = r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong)
      val got = out(id)
      assert(got.getAs[Long]("qsum") == q.sum, s"qsum vec $id")
      assert(got.getAs[Long]("qmin") == q.min && got.getAs[Long]("qmax") == q.max)
      assert(got.getAs[Long]("n_large") ==
        q.count(x => x >= 512 || x < -512), s"n_large vec $id")
      val dot = q.zip(q.reverse).map { case (a, b) => a * b }.sum
      assert(got.getAs[Long]("dot_rev") == dot, s"dot_rev vec $id")
    }
  }

  test("q150 CUSUM: closed form equals the sequential recursion") {
    val out = Registry.queries("q150_cusum_changepoint")(spark, dir).collect()
    val byType = out.groupBy(_.getString(0))
    for ((_, rows) <- byType) {
      val ordered = rows.sortBy(_.getTimestamp(1).getTime)
      val ns = ordered.map(_.getAs[Long]("n"))
      val k = ns.sum / ns.length // integer-floor mean, as the query defines
      var sRef = 0L
      for ((row, i) <- ordered.zipWithIndex) {
        sRef = math.max(0L, sRef + ns(i) - k)
        assert(row.getAs[Long]("s") == sRef,
          s"closed form diverges from the recursion at step $i")
        assert(row.getAs[Int]("alarm") == (if (sRef > 3 * k) 1 else 0))
      }
    }
    assert(out.map(_.getAs[Int]("alarm")).sum > 0,
      "gate data should trip at least one alarm")
  }

  test("q152 streaming IVM: continuously-maintained view == batch q151") {
    val stream = Registry.queries("q152_stream_ivm")(spark, dir)
    val batch = Registry.queries("q151_ivm_join_view")(spark, dir)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "streaming fold must restate the batch view bit-identically")
  }

  test("q153 interpolation: interp rows are linear between observed neighbors") {
    val out = Registry.queries("q153_interpolate")(spark, dir).collect()
    val srcs = out.map(_.getAs[String]("src")).toSet
    assert(srcs == Set("obs", "interp", "edge"),
      "gate data must exercise all three row kinds")
    for ((_, rows) <- out.groupBy(_.getString(0))) {
      val ordered = rows.sortBy(_.getTimestamp(1).getTime)
      val obs = ordered.zipWithIndex.collect {
        case (r, i) if r.getAs[String]("src") == "obs" =>
          i.toLong -> r.getAs[Long]("v_filled")
      }
      for ((r, i) <- ordered.zipWithIndex) r.getAs[String]("src") match {
        case "interp" =>
          val (ph, pv) = obs.filter(_._1 < i).last
          val (nh, nv) = obs.find(_._1 > i).get
          val want = pv + ((nv - pv) * (i - ph)) / (nh - ph)
          assert(r.getAs[Long]("v_filled") == want, s"row $i linearity")
        case "edge" =>
          assert(r.isNullAt(r.fieldIndex("v_filled")))
          assert(obs.isEmpty || i < obs.head._1 || i > obs.last._1,
            "edge rows only outside the observed range")
        case _ => ()
      }
    }
  }

  test("q154 winsorize: equals a plain-Scala nearest-rank recompute") {
    val out = Registry.queries("q154_winsorize")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value")).collect()
    val byType = ev.groupBy(_.getString(0))
    assert(out.keySet == byType.keySet)
    for ((t, rows) <- byType) {
      val v = rows.map(r => (math.floor(r.getDouble(2) * 1e6 + 0.5).toLong,
        r.getLong(1))).sortBy(identity).map(_._1)
      val n = v.length.toLong
      val lo = v(((n * 5 + 99) / 100 - 1).toInt)
      val hi = v(((n * 95 + 99) / 100 - 1).toInt)
      val got = out(t)
      assert(got.getAs[Long]("lo_v") == lo && got.getAs[Long]("hi_v") == hi,
        s"$t cutoffs")
      assert(got.getAs[Long]("robust_mean_micro") ==
        v.map(x => math.min(math.max(x, lo), hi)).sum / n, s"$t robust mean")
      assert(got.getAs[Long]("raw_mean_micro") == v.sum / n, s"$t raw mean")
    }
  }

  test("q155 rank fusion: equals a plain-Scala RRF recompute") {
    val out = Registry.queries("q155_rank_fusion")(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(col("text"), " ").as("w")).collect()
      .map { r =>
        val w = r.getSeq[String](3)
        (r.getString(1), r.getLong(0), r.getLong(2),
          w.distinct.size.toLong * 1000000L / w.size) }
    for ((lang, rows) <- docs.groupBy(_._1)) {
      val rLen = rows.sortBy(d => (-d._3, d._2)).map(_._2).zipWithIndex.toMap
      val rTtr = rows.sortBy(d => (-d._4, d._2)).map(_._2).zipWithIndex.toMap
      def score(id: Long) =
        1000000000L / (61 + rLen(id)) + 1000000000L / (61 + rTtr(id))
      val want = rows.map(_._2).sortBy(id => (-score(id), id)).take(10)
      val got = out.filter(_.getString(0) == lang).sortBy(_.getInt(1))
      assert(got.map(_.getAs[Long]("doc_id")).toSeq == want.toSeq,
        s"lang $lang")
      for (r <- got)
        assert(r.getAs[Long]("rrf_ppb") == score(r.getAs[Long]("doc_id")))
    }
  }

  test("q156 Markov: predictor is the transition argmax, accuracy exact") {
    val out = Registry.queries("q156_markov_accuracy")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { u =>
      val o = u.sortBy(e => (e._3, e._4)).map(_._2)
      o.zip(o.drop(1))
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size).toMap
    for (r <- out) {
      val cur = r.getString(0)
      val nexts = counts.collect { case ((c, n), k) if c == cur => (n, k) }
      val predicted = nexts.toSeq.sortBy { case (n, k) => (-k, n) }.head._1
      assert(r.getAs[String]("predicted") == predicted, s"$cur argmax")
      val n = pairs.count(_._1 == cur).toLong
      val hits = counts.getOrElse((cur, predicted), 0).toLong
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("hits") == hits)
      assert(r.getAs[Long]("acc_ppm") == hits * 1000000L / n)
    }
  }

  test("q157 Benford: digits partition the table, ppm bookkeeping exact") {
    val out = Registry.queries("q157_benford")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    assert(out.map(_.getString(0)).toSet == (1 to 9).map(_.toString).toSet,
      "every leading digit 1-9 must occur at gate scale")
    val ppmSum = out.map(_.getAs[Long]("obs_ppm")).sum
    assert(ppmSum > 1000000L - 9 && ppmSum <= 1000000L,
      "floor-division ppm must sum to just under 10^6")
    for (r <- out) {
      val d = r.getString(0).toInt
      val exp = math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong
      assert(r.getAs[Long]("exp_ppm") == exp, s"digit $d literal")
      assert(r.getAs[Long]("dev_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - exp))
    }
  }

  test("q158 stream-stream outer join == batch left interval join") {
    val out = Registry.queries("q158_stream_outer_join")(spark, dir)
    val ev = Tables.load(spark, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val batch = v.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("interval 1 hour"), "left")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty,
      "streaming outer join must equal the batch left join")
    assert(out.filter(col("purchase_id").isNull).count() > 0,
      "gate data must exercise the null-emission path")
  }

  test("q159 rolling median: equals a plain-Scala sliding recompute") {
    val out = Registry.queries("q159_rolling_median")(spark, dir).collect()
    for ((_, rows) <- out.groupBy(_.getString(0))) {
      val ordered = rows.sortBy(_.getTimestamp(1).getTime)
      val ns = ordered.map(_.getAs[Long]("n"))
      for ((r, i) <- ordered.zipWithIndex) {
        val frame = ns.slice(math.max(0, i - 23), i + 1).sorted
        val med = frame((frame.length + 1) / 2 - 1)
        assert(r.getAs[Long]("med") == med, s"median at row $i")
        assert(r.getAs[Long]("dev") == ns(i) - med)
      }
    }
  }

  test("q160 chi-square: cells partition events, contributions exact") {
    val out = Registry.queries("q160_chi_square")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(out.map(_.getAs[Long]("c")).sum == total)
    val n = BigInt(total)
    for (r <- out) {
      val (c, rt, kt) = (BigInt(r.getAs[Long]("c")),
        BigInt(r.getAs[Long]("r")), BigInt(r.getAs[Long]("k")))
      val d = c * n - rt * kt
      assert(BigInt(r.getAs[Long]("chi_micro")) ==
        d * d * 1000000 / (rt * kt * n), s"cell ${r.getString(0)}/${r.get(1)}")
    }
  }

  test("q161 Pareto frontier: kept iff no strictly longer doc has >= ttr") {
    val out = Registry.queries("q161_pareto_frontier")(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id"))).toSet
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(col("text"), " ").as("w")).collect()
      .map { r =>
        val w = r.getSeq[String](3)
        (r.getString(1), r.getLong(0), r.getLong(2),
          w.distinct.size.toLong * 1000000L / w.size) }
    val expected = (for {
      (lang, rows) <- docs.groupBy(_._1).toSeq
      d <- rows
      if !rows.exists(o => o._3 > d._3 && o._4 >= d._4)
    } yield (lang, d._2)).toSet
    assert(out == expected, "window frontier must equal brute-force dominance")
    assert(out.nonEmpty && out.size < docs.length,
      "frontier must be a proper non-empty subset")
  }

  test("graft_isqrt: exact floor sqrt on edges, both eval paths") {
    import graft.functions.IntegerSqrt
    def truth(x: Long): Long = {
      // Newton's method on BigInt — independent of the IEEE device
      var r = BigInt(x)
      if (r > 1) {
        var y = (r + 1) / 2
        while (y < r) { r = y; y = (r + BigInt(x) / r) / 2 }
      }
      r.toLong
    }
    val edges = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      (1L << 31) - 1, 1L << 31, (1L << 52) + 1, (1L << 62) - 1,
      3037000498L * 3037000498L, 3037000499L * 3037000499L,
      3037000499L * 3037000499L - 1, Long.MaxValue)
    val rng = new scala.util.Random(7)
    val rand = Seq.fill(200)(math.abs(rng.nextLong()) max 0L)
    for (x <- edges ++ rand)
      assert(IntegerSqrt.isqrt(x) == truth(x), s"interpreted isqrt($x)")
    // codegen path through a real plan
    import spark.implicits._
    val df = (edges ++ rand).toDF("x")
      .withColumn("s", IntegerSqrt(col("x")))
    for (r <- df.collect())
      assert(r.getLong(1) == truth(r.getLong(0)), s"codegen isqrt(${r.get(0)})")
  }

  test("q162 integer z-scores: stats equal a BigInt recompute") {
    val out = Registry.queries("q162_integer_zscore")(spark, dir).collect()
    for ((_, rows) <- out.groupBy(_.getString(0))) {
      val xs = rows.map(_.getAs[Long]("x"))
      val d = BigInt(xs.length)
      val sx = BigInt(xs.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val mean = (sx * 1000 / d).toLong
      val v = ((d * sxx - sx * sx) * 1000000 / (d * d)).toLong
      val sd = graft.functions.IntegerSqrt.isqrt(v)
      for (r <- rows) {
        assert(r.getAs[Long]("mean_milli") == mean)
        assert(r.getAs[Long]("sd_milli") == sd)
        assert(r.getAs[Long]("z_milli") ==
          (r.getAs[Long]("x") * 1000 - mean) * 1000 / math.max(sd, 1L))
      }
    }
  }

  test("q163 decile drift: deciles equal a plain-Scala nearest-rank recompute") {
    val out = Registry.queries("q163_decile_drift")(spark, dir).collect()
    assert(out.map(_.getInt(0)).toSeq.sorted == (1 to 10))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        substring(md5(concat(lit("drift:"), col("doc_id"))), 1, 1)
          .as("h")).collect()
      .map(r => (if ("01234567".contains(r.getString(2))) "A" else "B",
        r.getLong(1), r.getLong(0)))
    val halves = docs.groupBy(_._1).view
      .mapValues(_.sortBy(d => (d._2, d._3)).map(_._2)).toMap
    for (r <- out) {
      val dec = r.getInt(0)
      def decile(h: String): Long = {
        val v = halves(h)
        v(((v.length.toLong * dec + 9) / 10 - 1).toInt)
      }
      assert(r.getAs[Long]("a_val") == decile("A"), s"A decile $dec")
      assert(r.getAs[Long]("b_val") == decile("B"), s"B decile $dec")
      assert(r.getAs[Long]("gap") ==
        math.abs(r.getAs[Long]("a_val") - r.getAs[Long]("b_val")))
    }
  }

  test("q164 co-purchase: lift exact, neighbors ranked, support held") {
    val out = Registry.queries("q164_copurchase")(spark, dir).collect()
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = op.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val cnt = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = BigInt(byOrder.size)
    val co = scala.collection.mutable.Map[(Long, Long), Long]()
    for ((_, parts) <- byOrder; a <- parts; b <- parts if a < b)
      co((a, b)) = co.getOrElse((a, b), 0L) + 1
    for (r <- out) {
      val (item, rec) = (r.getAs[Long]("item"), r.getAs[Long]("rec"))
      val key = (math.min(item, rec), math.max(item, rec))
      assert(r.getAs[Long]("co") == co(key) && co(key) >= 2)
      assert(BigInt(r.getAs[Long]("lift_ppm")) ==
        BigInt(co(key)) * n * 1000000 / (BigInt(cnt(item)) * cnt(rec)))
    }
    for ((_, rows) <- out.groupBy(_.getAs[Long]("item"))) {
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to ranked.length))
      assert(ranked.length <= 5)
      val lifts = ranked.map(_.getAs[Long]("lift_ppm"))
      assert(lifts.zip(lifts.drop(1)).forall { case (a, b) => a >= b },
        "neighbors must be in descending lift order")
    }
  }

  test("q165 Gini: histogram closed form equals the sorted-vector definition") {
    val out = Registry.queries("q165_key_skew_gini")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("sz")).collect()
      .map(r => (r.getString(0), r.getAs[Long]("sz")))
    for (r <- out) {
      val xs = ev.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = BigInt(xs.length)
      val t = BigInt(xs.sum)
      val num = xs.zipWithIndex.map { case (x, i) =>
        (BigInt(2) * (i + 1) - n - 1) * x }.sum
      assert(r.getAs[Long]("n_keys") == xs.length)
      assert(r.getAs[Long]("total") == xs.sum)
      assert(BigInt(r.getAs[Long]("gini_ppm")) == num * 1000000 / (n * t),
        s"${r.getString(0)} gini")
      assert(r.getAs[Long]("gini_ppm") >= 0 &&
        r.getAs[Long]("gini_ppm") < 1000000)
    }
  }

  test("q166 fingerprint: order-independent, counts partition the table") {
    val out = Registry.queries("q166_table_fingerprint")(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    assert(out.forall(_.getAs[Int]("order_independent") == 1),
      "shuffled-self checksum must equal scan-order checksum")
    assert(out.map(_.getAs[Long]("checksum")).distinct.length == out.length,
      "flag partitions should fingerprint differently")
  }

  test("q167 malformed routing: bad count matches the injection rule") {
    val out = Registry.queries("q167_malformed_routing")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    for (r <- out) {
      val ids = ev.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getAs[Long]("n") == ids.length)
      // truncating '{"k": N}' always yields invalid JSON → bad set is
      // exactly the injected tenth
      assert(r.getAs[Long]("n_bad") == ids.count(_ % 11 == 0),
        s"${r.getString(0)} bad count")
      assert(r.getAs[Long]("bad_ppm") ==
        r.getAs[Long]("n_bad") * 1000000L / r.getAs[Long]("n"))
    }
    assert(out.map(_.getAs[Long]("n_bad")).sum > 0)
  }

  test("q168 integer quantiles: equals plain-Scala exact interpolation") {
    val out = Registry.queries("q168_integer_quantiles")(spark, dir).collect()
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        col("l_orderkey"), col("l_linenumber").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((flag, rows) <- li.groupBy(_._1)) {
      val q = rows.sortBy(r => (r._2, r._3, r._4)).map(_._2)
      val n = q.length.toLong
      for (p <- Seq(25L, 50L, 75L)) {
        val pos = p * (n - 1)
        val (lo, frac) = (pos / 100, pos % 100)
        val vLo = q(lo.toInt)
        val vHi = q(math.min(lo + 1, n - 1).toInt)
        val want = vLo * 1000000L + (vHi - vLo) * frac * 1000000L / 100
        val got = out.find(r => r.getString(0) == flag &&
          r.getAs[Long]("p") == p).get
        assert(got.getAs[Long]("q_micro") == want, s"$flag p$p")
        // cross-check against the engine's own double percentile
        val dbl = vLo + (vHi - vLo) * (frac / 100.0)
        assert(math.abs(got.getAs[Long]("q_micro") / 1e6 - dbl) < 1e-6)
      }
    }
  }

  test("q169 bitmap intersection: equals distinct set intersection") {
    val out = Registry.queries("q169_bitmap_intersect")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expected = for {
      a <- types; b <- types if a < b
    } yield (a, b, (sets(a) & sets(b)).size.toLong)
    assert(out.length == expected.length, "full canonical pair matrix")
    for (r <- out) {
      val want = expected.find(e => e._1 == r.getString(0) &&
        e._2 == r.getString(1)).get._3
      assert(r.getAs[Long]("n_both") == want,
        s"${r.getString(0)}x${r.getString(1)}")
    }
  }

  test("q170 quantile normalization: equals the sorted mid-rank definition") {
    val out = Registry.queries("q170_quantile_normalize")(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2).sorted
    val n = all.length.toLong
    def qppm(v: Long): Long = {
      val c = all.count(_ < v).toLong
      val m = all.count(_ == v).toLong
      (2 * c + m - 1) * 1000000L / (2 * (n - 1))
    }
    for (r <- out) {
      val vs = docs.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getAs[Long]("n_docs") == vs.length)
      val qs = vs.map(qppm)
      assert(r.getAs[Long]("mean_q_ppm") == qs.sum / qs.length)
      assert(r.getAs[Long]("min_q_ppm") == qs.min &&
        r.getAs[Long]("max_q_ppm") == qs.max)
    }
  }

  test("q171 SLA fill rate: equals a per-order recompute") {
    val out = Registry.queries("q171_sla_fill_rate")(spark, dir).collect()
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byOrder = li.groupBy(_._1)
    for (r <- out) {
      val orders = ord.filter(_._2 == r.getString(0))
        .filter(o => byOrder.contains(o._1))
      val onTime = orders.count { o =>
        byOrder(o._1).forall { l =>
          (l._2 - o._3) / 86400000L <= 60 }
      }.toLong
      assert(r.getAs[Long]("n_orders") == orders.length, r.getString(0))
      assert(r.getAs[Long]("n_on_time") == onTime)
      assert(r.getAs[Long]("on_time_ppm") ==
        onTime * 1000000L / orders.length)
    }
  }

  test("q172 Complete-mode streaming aggregate == batch aggregate") {
    val stream = Registry.queries("q172_stream_complete_agg")(spark, dir)
    val batch = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("CAST(floor(sum(CAST(l_extendedprice * (1.0 - l_discount)" +
        " AS DECIMAL(18,6))) * 100) AS BIGINT)").as("revenue_cents"),
        count(lit(1)).as("n_items"))
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "final Complete emission must equal the batch aggregate")
  }

  test("q173 weighted median: half the token mass sits on each side") {
    val out = Registry.queries("q173_weighted_median")(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for (r <- out) {
      val vs = docs.filter(_._1 == r.getString(0))
      val tot = vs.map(_._3).sum
      assert(r.getAs[Long]("total_tokens") == tot)
      val m = r.getAs[Long]("wmedian_chars")
      // defining property of the weighted median (nearest-rank form):
      // tokens strictly below the median < half; tokens at-or-below >= half
      val below = vs.filter(_._2 < m).map(_._3).sum
      val atOrBelow = vs.filter(_._2 <= m).map(_._3).sum
      assert(below * 2 < tot && atOrBelow * 2 >= tot,
        s"${r.getString(0)} weighted-median property")
    }
  }

  test("q174 sliding distinct: equals brute-force trailing-24h sets") {
    val out = Registry.queries("q174_sliding_distinct")(spark, dir).collect()
      .map(r => r.getTimestamp(0).getTime / 3600000L -> r.getAs[Long]("u24"))
      .toMap
    val ev = Tables.load(spark, dir, "events")
      .select(expr("unix_micros(ts) div 3600000000"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byHour = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hmax = ev.map(_._1).max
    for ((h, got) <- out) {
      val want = (h - 23 to h).flatMap(byHour.getOrElse(_, Set.empty))
        .toSet.size.toLong
      assert(got == want, s"hour $h")
      assert(h <= hmax)
    }
    // every hour that any window covers is present
    assert(out.size == (ev.map(_._1).min to hmax).length)
  }

  test("q175 apportionment: quotas sum to the budget, Hamilton-exact") {
    val out = Registry.queries("q175_apportion")(spark, dir).collect()
    val budget = 10000L
    assert(out.map(_.getAs[Long]("quota")).sum == budget,
      "largest-remainder quotas must sum exactly to the budget")
    val toks = out.map(r => r.getString(0) -> r.getAs[Long]("tok")).toMap
    val t = toks.values.sum
    for (r <- out) {
      val fq = toks(r.getString(0)) * budget / t
      assert(r.getAs[Long]("floor_q") == fq)
      val q = r.getAs[Long]("quota")
      assert(q == fq || q == fq + 1, "each group gets floor or floor+1")
    }
    // Hamilton: the +1s go to the largest remainders
    val plusOne = out.filter(r => r.getAs[Long]("quota") >
      r.getAs[Long]("floor_q")).map(r => toks(r.getString(0)) * budget % t)
    val zero = out.filter(r => r.getAs[Long]("quota") ==
      r.getAs[Long]("floor_q")).map(r => toks(r.getString(0)) * budget % t)
    assert(plusOne.isEmpty || zero.isEmpty || plusOne.min >= zero.max)
  }

  test("q176 stratified lift: pooled row equals the stratum sums") {
    val out = Registry.queries("q176_stratified_lift")(spark, dir).collect()
    val pooled = out.find(_.getAs[Long]("stratum") == -1L).get
    val strata = out.filter(_.getAs[Long]("stratum") >= 0L)
    for (c <- Seq("n_a", "conv_a", "n_b", "conv_b"))
      assert(pooled.getAs[Long](c) == strata.map(_.getAs[Long](c)).sum,
        s"pooled $c")
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(pooled.getAs[Long]("n_a") + pooled.getAs[Long]("n_b") == nCust)
    for (r <- out) {
      assert(r.getAs[Long]("rate_a_ppm") ==
        r.getAs[Long]("conv_a") * 1000000L / r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("lift_ppm") ==
        r.getAs[Long]("rate_a_ppm") - r.getAs[Long]("rate_b_ppm"))
      assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
    }
  }

  test("q177 deterministic mode: argmax with the declared tie rule") {
    val out = Registry.queries("q177_deterministic_mode")(spark, dir).collect()
    val rows = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    for (r <- out) {
      val grp = rows.filter(_._1 == r.getString(0)).map(_._2)
      val counts = grp.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val mode = counts.toSeq.sortBy { case (v, c) => (-c, v) }.head
      assert(r.getAs[String]("mode_flag") == mode._1, r.getString(0))
      assert(r.getAs[Long]("cnt") == mode._2)
      assert(r.getAs[Long]("share_ppm") ==
        mode._2 * 1000000L / grp.length)
    }
  }

  test("q178 streaks: histogram equals a per-user islands recompute") {
    val out = Registry.queries("q178_streaks")(spark, dir).collect()
    val days = Tables.load(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(date_trunc('DAY', ts)) div 86400000000"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    // .toSeq BEFORE .map: mapping a Map to pairs would collapse users
    // sharing the same (longest, n_streaks) into one entry
    val perUser = days.groupBy(_._1).toSeq.map { case (_, ds) =>
      val sorted = ds.map(_._2).sorted
      // day − index is constant inside a consecutive run
      val islands = sorted.zipWithIndex.map { case (d, i) => d - i }
        .groupBy(identity).values.map(_.size.toLong).toSeq
      (islands.max, islands.size.toLong)
    }
    val hist = perUser.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    assert(out.length == hist.size)
    for (r <- out) {
      val (nUsers, totStreaks) = hist(r.getAs[Long]("longest"))
      assert(r.getAs[Long]("n_users") == nUsers)
      assert(r.getAs[Long]("total_streaks") == totStreaks)
    }
  }

  test("q179 strict funnel: monotone stages equal a per-user recompute") {
    val out = Registry.queries("q179_strict_funnel")(spark, dir).collect()
      .sortBy(_.getLong(0))
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    for ((_, es) <- byUser) {
      def minAfter(t: String, after: Long): Option[Long] = {
        val c = es.filter(e => e._2 == t && e._3 > after).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      minAfter("view", Long.MinValue).foreach { t1 =>
        n1 += 1
        minAfter("click", t1).foreach { t2 =>
          n2 += 1
          minAfter("purchase", t2).foreach(_ => n3 += 1)
        }
      }
    }
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(n1, n2, n3))
    assert(n1 >= n2 && n2 >= n3 && n3 > 0, "funnel must narrow and be exercised")
    assert(out(1).getAs[Long]("conv_ppm") == n2 * 1000000L / n1)
  }

  test("q180 cohort LTV: cumulative curves are monotone and conserve value") {
    val out = Registry.queries("q180_cohort_ltv")(spark, dir).collect()
    val ev = Tables.load(spark, dir, "events")
      .select(expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0))
    // the grid partitions all event value exactly once
    assert(out.map(_.getAs[Long]("week_value_micro")).sum == ev.sum)
    for ((_, rows) <- out.groupBy(_.getAs[Long]("cohort_week"))) {
      val ordered = rows.sortBy(_.getAs[Long]("offset_wk"))
      var cum = 0L
      for (r <- ordered) {
        cum += r.getAs[Long]("week_value_micro")
        assert(r.getAs[Long]("cum_ltv_micro") == cum,
          "cumulative must equal the running sum of weekly values")
        assert(r.getAs[Long]("offset_wk") >= 0)
      }
    }
  }

  test("q181 RFM: segments partition users and conserve value") {
    val out = Registry.queries("q181_rfm_segments")(spark, dir).collect()
    val users = Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum == users,
      "segments must partition the user base")
    for (r <- out) {
      val seg = r.getString(0)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '4'),
        s"segment code $seg")
    }
    val totalValue = out.map(_.getAs[Long]("value_micro")).sum
    for (r <- out)
      assert(r.getAs[Long]("value_share_ppm") ==
        r.getAs[Long]("value_micro") * 1000000L / totalValue)
    // quartile 1 on M must hold at least a quarter of the value
    val topM = out.filter(_.getString(0).endsWith("1"))
      .map(_.getAs[Long]("value_micro")).sum
    assert(topM * 4 >= totalValue, "top monetary quartile share")
  }

  test("q182 seasonal residuals: baseline is the profile mean, top-20 exact") {
    val out = Registry.queries("q182_seasonal_resid")(spark, dir).collect()
    assert(out.map(_.getAs[Int]("rk")).toSeq == (1 to 20))
    val hourly = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("hr")))
      .withColumn("hod", hour(col("hr"))).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getAs[Long]("n"),
        r.getAs[Int]("dow"), r.getAs[Int]("hod")))
    val profile = hourly.groupBy(h => (h._1, h._4, h._5)).view
      .mapValues(v => v.map(_._3).sum / v.length).toMap
    val resids = hourly.map(h =>
      (h._1, h._2, h._3, profile((h._1, h._4, h._5))))
      .map { case (t, hr, n, b) => (t, hr, n, b, n - b) }
      .sortBy { case (t, hr, _, _, res) => (-math.abs(res), t, hr.getTime) }
    for ((r, i) <- out.sortBy(_.getAs[Int]("rk")).zipWithIndex) {
      val (t, hr, n, b, res) = resids(i)
      assert(r.getString(1) == t && r.getTimestamp(2) == hr &&
        r.getAs[Long]("n") == n && r.getAs[Long]("base") == b &&
        r.getAs[Long]("resid") == res, s"rank ${i + 1}")
    }
  }

  test("q183 rapid-repeat screen: equals the brute-force pair set") {
    val out = Registry.queries("q183_duplicate_payments")(spark, dir).collect()
    val p = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (for {
      (_, es) <- p.groupBy(_._1).toSeq
      a <- es.toSeq; b <- es.toSeq
      if a._2 < b._2 && math.abs(b._3 - a._3) <= 600000000L
    } yield (a._1, a._2, b._2)).toSet
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("id_a"),
      r.getAs[Long]("id_b"))).toSet == expected,
      "banded join must equal brute-force within-window pairs")
    assert(out.nonEmpty, "gate data must exercise the screen")
    for (r <- out) assert(r.getAs[Long]("gap_us") <= 600000000L)
  }

  test("q151 IVM: delta-merged view == direct full aggregate") {
    val out = Registry.queries("q151_ivm_join_view")(spark, dir)
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    val direct = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"), count(lit(1)).as("n_items"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty,
      "incremental maintenance must be bit-identical to recompute")
  }
}
