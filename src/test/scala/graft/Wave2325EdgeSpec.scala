package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus properties for waves 23–25 (q239–q247): empty and
  * single-row inputs must produce a well-defined result, never an ANSI
  * arithmetic crash — this sweep is what forced the d_n=0 guard in
  * q241 and the n_days=0 guard in q247. */
class Wave2325EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dirWith(writes: (String, org.apache.spark.sql.DataFrame)*)
      : String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_w25e_").toString
    writes.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$t.parquet") }
    tmp
  }

  test("q239/q241/q243 are empty- and single-row-lineitem-safe") {
    import spark.implicits._
    val li = Seq((1L, 10L, 100L, "R"))
      .toDF("l_partkey", "l_suppkey", "l_orderkey", "l_returnflag")
    val empty = dirWith("lineitem" -> li.limit(0))
    val lone = dirWith("lineitem" -> li)
    assert(Registry.queries("q239_fd_violations")(spark, empty)
      .collect().isEmpty)
    assert(Registry.queries("q239_fd_violations")(spark, lone)
      .collect().isEmpty) // one row cannot violate an FD
    assert(Registry.queries("q243_k_core")(spark, empty)
      .collect().isEmpty)
    assert(Registry.queries("q243_k_core")(spark, lone)
      .collect().isEmpty) // one part, no co-purchase pair
    val eKmv = Registry.queries("q241_kmv_intersect")(spark, empty)
      .collect().head
    assert(eKmv.getAs[Long]("pool_n") == 0L)
    assert(eKmv.getAs[Long]("est_union") == 0L)
    assert(eKmv.getAs[Long]("est_inter") == 0L)
    assert(eKmv.getAs[Long]("exact_inter") == 0L)
    val lKmv = Registry.queries("q241_kmv_intersect")(spark, lone)
      .collect().head // one 'R' part: A={1}, B=∅
    assert(lKmv.getAs[Long]("pool_n") == 1L)
    assert(lKmv.getAs[Long]("est_union") == 1L)
    assert(lKmv.getAs[Long]("exact_union") == 1L)
    assert(lKmv.getAs[Long]("est_inter") == 0L)
    assert(lKmv.getAs[Long]("jacc_exact_ppm") == 0L)
  }

  test("q242/q244/q245 are empty- and single-document-safe") {
    import spark.implicits._
    val docs = Seq((1L, "order fast", "srcA", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val empty = dirWith("documents" -> docs.limit(0))
    val lone = dirWith("documents" -> docs)
    assert(Registry.queries("q242_autocomplete")(spark, empty)
      .collect().isEmpty)
    assert(Registry.queries("q245_compaction_bins")(spark, empty)
      .collect().isEmpty)
    // phrase table always reports all 3 phrases, zeros included
    val pm = Registry.queries("q244_phrase_match")(spark, empty)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(pm == List(("order fast", 0L), ("stream column", 0L),
      ("window join", 0L)))
    val pl = Registry.queries("q244_phrase_match")(spark, lone)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(pl == List(("order fast", 1L), ("stream column", 0L),
      ("window join", 0L)))
    // a lone 2-word doc: prefixes of both words, each completion rank 1
    val ac = Registry.queries("q242_autocomplete")(spark, lone).collect()
    assert(ac.length == 6) // 3 prefixes per word, one completion each
    assert(ac.forall(_.getLong(2) == 1L))
    val cb = Registry.queries("q245_compaction_bins")(spark, lone)
      .collect().head
    assert(cb.getLong(3) == 1L && cb.getLong(4) == 1L) // 1 bin, min 1
  }

  test("q240/q246/q247 are empty- and single-row-safe") {
    import spark.implicits._
    val docs = Seq((1L, "en")).toDF("doc_id", "lang")
    assert(Registry.queries("q240_stratified_folds")(
      spark, dirWith("documents" -> docs.limit(0))).collect().isEmpty)
    val sf = Registry.queries("q240_stratified_folds")(
      spark, dirWith("documents" -> docs)).collect()
    assert(sf.length == 1 && sf.head.getLong(4) == 1000000L &&
      sf.head.getLong(6) == 0L)
    val ev = Seq((1L, 1L, 1.0))
      .toDF("event_id", "user_id", "value")
      .withColumn("ts", expr("timestamp_micros(0)"))
    val eEv = dirWith("events" -> ev.limit(0))
    val lEv = dirWith("events" -> ev)
    assert(Registry.queries("q246_lag_features")(spark, eEv)
      .collect().isEmpty)
    val lf = Registry.queries("q246_lag_features")(spark, lEv).collect()
    assert(lf.length == 1 && lf.head.getLong(2) == 1L)
    val bt = Registry.queries("q247_forecast_backtest")(spark, eEv)
      .collect().head
    assert(bt.getAs[Long]("n_days") == 0L)
    assert(bt.getAs[Long]("mae_naive_micro") == 0L)
    val bl = Registry.queries("q247_forecast_backtest")(spark, lEv)
      .collect().head // one day: no lag-7 reference -> zero scored days
    assert(bl.getAs[Long]("n_days") == 0L)
  }
}
