package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the eighth-wave battery (q190–q195): each
  * statistic recomputed by an independent driver-side brute force over
  * the tiny sf0.001 tables (plain Scala collections, no Spark ops). */
class Wave8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def docRows: Array[(Long, String, String, String)] =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def ngrams(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
  }

  test("q190 KS: matches exact brute-force max CDF gap") {
    val out = Registry.queries("q190_ks_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("ks_ppm")))
      .toMap
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
        pmod(col("user_id"), lit(2)).as("grp")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((typ, rows) <- ev.groupBy(_._1)) {
      val a = rows.filter(_._3 == 0).map(_._2)
      val b = rows.filter(_._3 == 1).map(_._2)
      val vs = (a ++ b).distinct.sorted
      val dNum = vs.map { v =>
        (BigInt(a.count(_ <= v)) * b.size - BigInt(b.count(_ <= v)) * a.size).abs
      }.max
      val ks = (dNum * 1000000 / (BigInt(a.size) * b.size)).toLong
      assert(out(typ) == ((a.size.toLong, b.size.toLong, ks)),
        s"KS mismatch for $typ")
      assert(ks >= 0 && ks <= 1000000)
    }
  }

  test("q191 kappa: matches brute-force confusion-matrix computation") {
    val out = Registry.queries("q191_cohens_kappa")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("po_ppm"),
          r.getAs[Long]("pe_ppm"), r.getAs[Long]("kappa_milli"))).toMap
    val d = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((lang, rows) <- d.groupBy(_._1)) {
      val lab = rows.map { case (_, nc, id) => ((nc / 50) % 3, ((nc + id) / 50) % 3) }
      val n = lab.size
      val po = BigInt(lab.count(p => p._1 == p._2)) * 1000000 / n
      val peNum = (0L to 2L).map(k =>
        BigInt(lab.count(_._1 == k)) * lab.count(_._2 == k)).sum
      val pe = peNum * 1000000 / (BigInt(n) * n)
      val kappa = if (pe == 1000000) 0L
        else ((po - pe) * 1000 / (1000000 - pe)).toLong
      assert(out(lang) == ((n.toLong, po.toLong, pe.toLong, kappa)),
        s"kappa mismatch for $lang")
      assert(kappa <= 1000, "kappa cannot exceed 1")
    }
  }

  test("q192 Chao1: matches brute-force frequency-of-frequencies") {
    val out = Registry.queries("q192_chao1_richness")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("s_obs"), r.getAs[Long]("f1"), r.getAs[Long]("f2"),
          r.getAs[Long]("chao1_milli"))).toMap
    for ((src, rows) <- docRows.groupBy(_._3)) {
      val counts = rows.flatMap(r => ngrams(r._4, 3))
        .groupBy(identity).map(_._2.size)
      val (s, f1, f2) = (counts.size.toLong,
        counts.count(_ == 1).toLong, counts.count(_ == 2).toLong)
      val chao1 = 1000 * s + 1000 * f1 * (f1 - 1) / (2 * (f2 + 1))
      assert(out(src) == ((s, f1, f2, chao1)), s"Chao1 mismatch for $src")
      assert(chao1 >= 1000 * s, "the estimator never shrinks the observed count")
    }
  }

  test("q193 burstiness: matches brute-force VMR ranking") {
    val out = Registry.queries("q193_burstiness")(spark, dir).collect()
      .map(r => (r.getAs[String]("t"), r.getAs[Long]("df"),
        r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("vmr_micro")))
    val docs = docRows.filter(_._4.split(" ", -1).length >= 2)
    val n = docs.size.toLong
    val perDoc = docs.toSeq.flatMap(r => ngrams(r._4, 2).map(t => (t, r._1)))
      .groupBy(identity).toSeq
      .map { case ((t, d), occ) => (t, d, occ.size.toLong) }
    val stats = perDoc.groupBy(_._1).collect {
      case (t, cs) if cs.size >= 20 =>
        val s1 = cs.map(_._3).sum; val s2 = cs.map(c => c._3 * c._3).sum
        val vmr = ((BigInt(n) * s2 - BigInt(s1) * s1) * 1000000 /
          (BigInt(n) * s1)).toLong
        (t, cs.size.toLong, s1, s2, vmr)
    }.toSeq
    val expected = stats.sortBy(x => (-x._5, x._1)).take(20)
    assert(out.toSeq == expected, "top-20 VMR list mismatch")
  }

  test("q194 source overlap: matches brute-force set Jaccard") {
    val out = Registry.queries("q194_source_overlap")(spark, dir).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("inter"), r.getAs[Long]("jac_ppm"))).toMap
    val vocab = docRows.groupBy(_._3)
      .map { case (s, rs) => s -> rs.flatMap(r => ngrams(r._4, 3)).toSet }
    val srcs = vocab.keys.toSeq.sorted
    val pairs = for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (a, b) = (srcs(i), srcs(j))
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield (a, b) -> (vocab(a).size.toLong, vocab(b).size.toLong, inter,
      inter * 1000000 / (vocab(a).size + vocab(b).size - inter))
    assert(out == pairs.toMap, "Jaccard matrix mismatch")
    // pairs with zero intersection legitimately have no row
    assert(out.keySet.forall { case (a, b) => a < b })
  }

  test("q195 vocab growth: buckets partition the vocabulary, cum is total") {
    val out = Registry.queries("q195_vocab_growth")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("new_terms"),
        r.getAs[Long]("cum_terms")))
    val maxd = docRows.map(_._1).max + 1
    val first = docRows.flatMap(r => ngrams(r._4, 3).map(t => (t, r._1)))
      .groupBy(_._1).map { case (t, occ) => (t, occ.map(_._2).min) }
    val buckets = first.values.groupBy(fd => fd * 20 / maxd)
      .map { case (b, fs) => (b, fs.size.toLong) }
    assert(out.map(r => (r._1, r._2)).toMap == buckets, "bucket counts mismatch")
    assert(out.last._3 == first.size.toLong,
      "cumulative count must end at the full vocabulary")
    assert(out.map(_._2).sum == first.size.toLong)
    // running sum is consistent
    assert(out.scanLeft(0L)((acc, r) => acc + r._2).tail.toSeq ==
      out.map(_._3).toSeq)
  }
}
