package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized degenerate-input invariants for the wave-7/8 statistics
  * (q184–q195): each property constructs corpora where the statistic
  * has a KNOWN closed-form value (no drift ⇒ KS = 0, disjoint supports
  * ⇒ KS = 1, mirrored labels ⇒ AUC = 1/2, forced agreement ⇒ κ = 1,
  * tripled corpus ⇒ Chao1 = S_obs, …) and checks the operator lands on
  * it exactly. The fixed-corpus Wave7Spec/Wave8Spec pin one dataset;
  * these sample many — degenerate shapes are where gate failures at
  * odd scales come from (see q162/q179 in round 6's ADVICE). */
class StatsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Synthetic documents table with explicit gate-schema columns. */
  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sprop_").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Synthetic events table (micro-precision timestamps). */
  private def eventsDir(rows: Seq[(Long, Long, String, Double, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sprop_").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  private val genWord = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta", "iota", "mu")
  private val genText: Gen[String] =
    Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, genWord)).map(_.mkString(" "))
  // two-decimal values: micro-quantization is exact, no float fuzz
  private val genVal: Gen[Double] = Gen.choose(0, 9999).map(_ / 100.0)
  private val types = Seq("view", "click", "purchase")

  test("q190 KS = 0 when the two samples are identical multisets") {
    val gen = for {
      m <- Gen.choose(3, 30)
      vs <- Gen.listOfN(m, genVal)
      ty <- Gen.listOfN(m, Gen.oneOf(types))
    } yield vs.zip(ty)
    check(Prop.forAll(gen) { pairs =>
      // every (type, value) lands once under an even and once under an
      // odd user: the two per-type samples are equal by construction
      val rows = pairs.zipWithIndex.flatMap { case ((v, t), i) =>
        Seq((2L * i, 0L, t, v, 1000L * i), (2L * i + 1, 1L, t, v, 1000L * i))
      }
      val out = Registry.queries("q190_ks_drift")(spark, eventsDir(rows))
        .collect()
      out.nonEmpty && out.forall { r =>
        r.getAs[Long]("ks_ppm") == 0L &&
          r.getAs[Long]("n_a") == r.getAs[Long]("n_b")
      }
    }, n = 8)
  }

  test("q190 KS = 1 when the two samples have disjoint supports") {
    val gen = for {
      na <- Gen.choose(2, 15); nb <- Gen.choose(2, 15)
      as <- Gen.listOfN(na, Gen.choose(0, 999))
      bs <- Gen.listOfN(nb, Gen.choose(2000, 2999))
    } yield (as.map(_ / 100.0), bs.map(_ / 100.0))
    check(Prop.forAll(gen) { case (as, bs) =>
      val rows = as.zipWithIndex.map { case (v, i) =>
        (2L * i, 0L, "view", v, 1000L * i) } ++
        bs.zipWithIndex.map { case (v, i) =>
          (2L * i + 1, 1L, "view", v, 999999L + 1000L * i) }
      val out = Registry.queries("q190_ks_drift")(spark, eventsDir(rows))
        .collect()
      out.length == 1 && out.head.getAs[Long]("ks_ppm") == 1000000L
    }, n = 8)
  }

  test("q185 AUC = 1/2 on mirrored labels, 1 on separated ones") {
    val gen = for {
      m <- Gen.choose(3, 20)
      vs <- Gen.listOfN(m, genVal)
      seg <- Gen.choose(0L, 3L)
    } yield (vs, seg)
    check(Prop.forAll(gen) { case (vs, seg) =>
      // mirrored: every value appears once as purchase, once as view
      val mirrored = vs.zipWithIndex.flatMap { case (v, i) =>
        Seq((2L * i, seg, "purchase", v, 1000L * i),
          (2L * i + 1, seg, "view", v, 1000L * i))
      }
      val m = Registry.queries("q185_group_auc")(spark, eventsDir(mirrored))
        .collect()
      // separated: every purchase value strictly above every view value
      val sep = vs.zipWithIndex.flatMap { case (v, i) =>
        Seq((2L * i, seg, "purchase", v + 200.0, 1000L * i),
          (2L * i + 1, seg, "view", v / 2.0, 1000L * i))
      }
      val s = Registry.queries("q185_group_auc")(spark, eventsDir(sep))
        .collect()
      m.length == 1 && m.head.getAs[Long]("auc_ppm") == 500000L &&
        s.length == 1 && s.head.getAs[Long]("auc_ppm") == 1000000L
    }, n = 6)
  }

  test("q191 kappa = 1 under forced agreement (multi-class), 0 single-class") {
    val gen = for {
      n <- Gen.choose(4, 25)
      ncs <- Gen.listOfN(n, Gen.choose(0L, 449L))
      langs <- Gen.listOfN(n, Gen.oneOf("en", "de"))
    } yield ncs.zip(langs)
    check(Prop.forAll(gen) { rows =>
      // doc_id ≡ 0 (mod 150) shifts a2's quotient by a multiple of 3:
      // a2 == a1 for every document, agreement is total by construction
      val docs = rows.zipWithIndex.map { case ((nc, l), i) =>
        (150L * i, "t", l, "s", nc)
      }
      val out = Registry.queries("q191_cohens_kappa")(spark, docsDir(docs))
        .collect()
      out.forall { r =>
        val lang = r.getAs[String]("lang")
        val classes = rows.filter(_._2 == lang).map(_._1 / 50 % 3).distinct.size
        val want = if (classes >= 2) 1000L else 0L
        r.getAs[Long]("po_ppm") == 1000000L &&
          r.getAs[Long]("kappa_milli") == want
      }
    }, n = 8)
  }

  test("q192 Chao1 = S_obs exactly when no type is rare (tripled corpus)") {
    val gen = for {
      n <- Gen.choose(2, 10)
      texts <- Gen.listOfN(n, genText)
      srcs <- Gen.listOfN(n, Gen.oneOf("sa", "sb"))
    } yield texts.zip(srcs)
    check(Prop.forAll(gen) { base =>
      // three copies of every document: every 3-gram count is a
      // multiple of 3, so f1 = f2 = 0 and the estimator collapses
      val docs = base.zipWithIndex.flatMap { case ((t, src), i) =>
        (0 until 3).map(k => (3L * i + k, t, "en", src, t.length.toLong))
      }
      val out = Registry.queries("q192_chao1_richness")(spark, docsDir(docs))
        .collect()
      out.nonEmpty && out.forall { r =>
        r.getAs[Long]("f1") == 0L && r.getAs[Long]("f2") == 0L &&
          r.getAs[Long]("chao1_milli") == 1000L * r.getAs[Long]("s_obs")
      }
    }, n = 8)
  }

  test("q193 VMR = 0 when every document is identical") {
    val gen = for {
      n <- Gen.choose(20, 40)
      t <- genText if t.split(" ").length >= 2
    } yield (n, t)
    check(Prop.forAll(gen) { case (n, t) =>
      val docs = (0 until n).map(i => (i.toLong, t, "en", "s", t.length.toLong))
      val out = Registry.queries("q193_burstiness")(spark, docsDir(docs))
        .collect()
      out.nonEmpty && out.forall { r =>
        r.getAs[Long]("df") == n.toLong && r.getAs[Long]("vmr_micro") == 0L
      }
    }, n = 6)
  }

  test("q194 Jaccard = 1 between sources with identical text sets") {
    val gen = for {
      n <- Gen.choose(2, 8)
      texts <- Gen.listOfN(n, genText)
    } yield texts
    check(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.flatMap { case (t, i) =>
        Seq((2L * i, t, "en", "sa", t.length.toLong),
          (2L * i + 1, t, "en", "sb", t.length.toLong))
      }
      val out = Registry.queries("q194_source_overlap")(spark, docsDir(docs))
        .collect()
      out.length == 1 && {
        val r = out.head
        r.getAs[String]("src_a") == "sa" && r.getAs[String]("src_b") == "sb" &&
          r.getAs[Long]("n_a") == r.getAs[Long]("n_b") &&
          r.getAs[Long]("jac_ppm") == 1000000L
      }
    }, n = 8)
  }

  test("q184 nDCG = 1 when the retriever order IS the ideal order") {
    val gen = for {
      n <- Gen.choose(4, 30)
      ids <- Gen.listOfN(n, Gen.choose(0L, 4000L))
    } yield ids.distinct
    check(Prop.forAll(gen) { ids =>
      // n_chars := gain makes the system ranking (n_chars desc, id asc)
      // coincide with the ideal ranking (gain desc, id asc)
      val docs = ids.map(id =>
        (id, "t", "en", "s", (1L << (id % 4).toInt) - 1))
      val out = Registry.queries("q184_ndcg")(spark, docsDir(docs)).collect()
      out.length == 1 && {
        val r = out.head
        val want = if (r.getAs[Long]("idcg_milli") == 0L) 0L else 1000000L
        r.getAs[Long]("dcg_milli") == r.getAs[Long]("idcg_milli") &&
          r.getAs[Long]("ndcg_ppm") == want
      }
    }, n = 8)
  }

  test("q189 reports zero lateness on an in-order stream") {
    val gen = for {
      n <- Gen.choose(3, 40)
      gaps <- Gen.listOfN(n, Gen.choose(0L, 5000L))
      ty <- Gen.listOfN(n, Gen.oneOf(types))
    } yield gaps.zip(ty)
    check(Prop.forAll(gen) { rows =>
      // event time nondecreasing in arrival (event_id) order
      var us = 0L
      val ev = rows.zipWithIndex.map { case ((gap, t), i) =>
        us += gap; (i.toLong, 7L, t, 1.0, us)
      }
      val out = Registry.queries("q189_ooo_audit")(spark, eventsDir(ev))
        .collect()
      out.nonEmpty && out.forall { r =>
        r.getAs[Long]("n_late") == 0L && r.getAs[Long]("max_late_ms") == 0L &&
          r.getAs[java.lang.Long]("p99_late_ms") == null
      }
    }, n = 8)
  }
}
