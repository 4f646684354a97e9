package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit over the WHOLE query battery: the properties that
  * keep a plan alive at 100 TB are asserted mechanically, so a future
  * edit that re-introduces an all-pairs join (the round-1 q37 mistake:
  * a 300 s cartesian at sf0.1, unbounded at scale) fails CI instead of
  * failing the bench.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a broadcast nested-loop:
    * a deliberately tiny side against a linear scan (the brute-force
    * recall baseline q38) or a constant-size pivot/probe table (IVF's
    * 16-pivot assign stage q45, ANN probe table q39). A broadcast BNL
    * over a BOUNDED side is a linear scan, not a cartesian blow-up. */
  private val broadcastNlAllowed = Set(
    "q38_sim_cosine_topk", "q45_sim_ann_ivf", "q39_sim_ann_lsh",
    "q69_kmeans_lloyd", // k x dim centroid table broadcast per iteration
    "q70_tfidf_cosine", // 1-row corpus-size scalar broadcast
    "q89_semantic_dedup", // q45's 16-pivot assign stage, reused
    "q102_cluster_sample", // q45's 16-pivot assign stage, reused
    "q100_dsir_weights", // 1-row corpus-mean scalar broadcast (q70 shape)
    "q108_zipf_coverage", // 1-row corpus-total scalar broadcast (q70 shape)
    "q110_session_pairs", // 1-row session-count scalar broadcast (q70 shape)
    "q120_resample_ma", // type-alphabet distinct broadcast against the spine
    "q123_ann_pq", // 5-query exact-baseline probe broadcast (q38 shape)
    "q135_hard_negatives", // q45's 16-pivot assign stage, reused
    "q136_knn_label", // q45's 16-pivot assign stage, reused
    "q142_decay_score", // 1-row corpus-watermark scalar broadcast (q70 shape)
    "q153_interpolate", // type-alphabet distinct broadcast against the spine (q120 shape)
    "q160_chi_square", // 1-row grand-total scalar broadcast (q70 shape)
    "q164_copurchase", // 1-row order-count scalar broadcast (q70 shape)
    "q175_apportion", // 1-row total/shortfall scalar broadcasts (q70 shape)
    "q181_rfm_segments", // 1-row total-value scalar broadcast (q70 shape)
    "q193_burstiness", // 1-row doc-count scalar broadcast (q70 shape)
    "q195_vocab_growth", // 1-row max-doc-id scalar broadcast (q70 shape)
    "q197_cluster_histogram", // two 1-row scalar totals for the singleton row
    "q206_link_prediction", // 1-row capped-bridge count broadcast (q70 shape)
    "q207_collocations", // 1-row token-total scalar broadcast (q70 shape)
    "q209_cramers_v", // 1-row marginal-total scalar broadcast per pair (q160 shape)
    "q210_target_encoding", // 1-row global-rate scalar broadcast (q70 shape)
    "q211_conformal", // 3-row threshold table theta-joined to the bounded nc histogram
    "q213_ipw_ate", // 1-row ATE scalar broadcast onto the 4-row propensity table
    "q216_t_closeness", // 5-row priority-alphabet broadcast completes each group
    "q219_p_chart", // 1-row center-line scalar broadcast (q70 shape)
    "q221_cuped", // 1-row pooled-theta scalar broadcast (q70 shape)
    "q230_bm25_topk", // 1-row corpus-size scalar broadcast (q70 shape)
    "q232_keywords_topk", // 1-row corpus-size scalar broadcast (q70 shape)
    "q235_assoc_rules", // 1-row basket-count scalar broadcast (q70 shape)
    "q241_kmv_intersect", // 1-row exact-stats scalar broadcast beside the sketch row
    "q243_k_core", // 1-row core-totals scalar broadcast onto the limit(20) members
    "q270_k_core_adaptive", // 1-row core-totals scalar broadcast (q243's shape)
    "q273_image_dhash_dedup", // 1-row pair-totals scalar broadcast (q70 shape)
    "q276_bloom_audit", // 3-row (bits/key, k) plan-table broadcast
    "q277_hash_ring", // 1-row moved-totals scalar broadcast (q70 shape)
    "q278_neyman_allocation", // 1-row weight/base-total scalar broadcasts
    "q279_watermark_planner", // 6-row delay plan table + 1-row min-ok scalar
    "q248_shapley_attribution", // 4-channel × 16-subset broadcast lattice joins
    "q249_generalization_ladder", // 1-row best-level scalar onto the 4-row ladder
    "q251_range_splits", // 1-row total-rows scalar broadcast (q70 shape)
    "q255_dispersion_index", // span-days × 5-type-alphabet spine completion (both sides bounded)
    "q259_setsim_join", // two 1-row stats scalar broadcasts (q70 shape)
    "q267_ri_audit", // per-edge 1-row orphan-stats scalar broadcast (q70 shape)
    "q269_merkle_digest", // 1-row range-bound max() scalar broadcast (q70 shape)
    "q260_isotonic_calibration", // interval self-joins on the ≤50-row quantity-alphabet bin table
    "q282_changepoint", // three 1-row scalar broadcasts (totals, argmax, best-k)
    "q283_survival_table", // two 1-row scalar broadcasts (corpus end date, cohort size)
    "q284_hilbert_audit", // per-scheme 1-row totals scalar broadcast (q70 shape)
    "q287_hilbert_range_scan", // 1-row scaling/count/totals scalar broadcasts
    "q289_join_cardinality", // two 1-row stats scalar broadcasts (q70 shape)
    "q290_fk_discovery", // per-edge 1-row distinct-stats scalar broadcasts (q267 shape)
    "q304_tpch_q11_important_parts", // 1-row nation-total scalar broadcast (Q11's scalar subquery)
    "q308_tpch_q15_top_supplier", // 1-row max-revenue scalar broadcast (Q15's correlated MAX)
    "q313_tpch_q22_sales_opportunity", // 1-row avg-balance scalar broadcast (Q22's scalar subquery)
    "q314_cbo_planning_audit", // 1-row catalog-stat scalar broadcasts (n/min/max/hist/mcv/exact)
    "q316_morton3_cells", // 1-row per-dim min/max bounds scalar broadcast (the writer's stats pass)
    "q318_ordered_join") // 3-row decision table × 1-row joined-totals scalar broadcast

  /** Streaming/stateful queries run side effects when built — their
    * result is a read-back table, so the interesting plan was already
    * audited via their batch twins (q26 for q27; q26+cogroup for
    * q28/q44; the batch DISTINCT oracle for q63). */
  private val skipBuild = Set("q262_stream_wav_health",
    "q261_mmr_rerank", // bounded-pool greedy runs jobs at build time
    "q27_cdc_stream_fsm", "q63_stream_dedup",
    "q72_stream_lsh_index", "q77_stream_topk", "q80_stream_agg_maintain",
    "q109_stream_sessionize", "q112_stream_rate_anomaly",
    "q124_stream_sessions_tws", "q129_stream_cdc_merge",
    "q130_stream_interval_join", "q134_stream_static_join",
    "q139_stream_scd2", "q145_stream_dedup_wm", "q152_stream_ivm",
    "q158_stream_outer_join", "q172_stream_complete_agg",
    "q272_stream_profile", // batch twin q263 carries the audited plan
    "q286_stream_cms", // batch twin q285 carries the audited plan
    "q319_stream_cbo_join") // per-batch plans audited via q315's batch
    // twin (same analyzedJoinFromStats device, AnalyzedJoinSpec-pinned)

  test("no gate query plans an unbounded cartesian product") {
    val offenders = Registry.queries.toSeq
      .filterNot { case (name, _) => skipBuild(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnl = plan.contains("BroadcastNestedLoopJoin") &&
          !broadcastNlAllowed(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnl) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("filter + projection reach the parquet scan (pushdown)") {
    val plan = Registry.queries("q01_pricing_summary")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(!plan.contains("PushedFilters: []"),
      "filter list empty — predicate did not reach the scan")
  }

  test("dimension joins broadcast (no shuffle of the small side)") {
    for (q <- Seq("q03_top_revenue_orders", "q05_star_join")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: expected a broadcast hash join for the dimension side")
    }
  }

  test("training-pipeline lookups broadcast the small side") {
    // q59: the eval-gram table; q60: the vocabulary; q61: the 64-row
    // per-dimension stats; q64: the quota table. Each must reach the
    // corpus scan as a broadcast, never a shuffle of the big side.
    for (q <- Seq("q59_decontaminate", "q60_unigram_lm",
        "q61_embed_quantize", "q64_corpus_release")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: expected the model/lookup side to broadcast")
    }
  }

  test("broadcast hints ride only bounded sides (never a growing scan)") {
    // The q03/q05 lesson (round-4 verdict): a forced broadcast() on a
    // table that grows with SF is a latent OOM at 100-TB scale even
    // though every test SF passes. Mechanically: every ResolvedHint in
    // every analyzed plan must wrap a side that is bounded by
    // construction — an Aggregate (group-cardinality bound), a
    // Limit/Sample, a LocalRelation (driver literal), or a scan of a
    // genuinely constant dim (region = 5 rows, nation = 25 at any SF).
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val constantDims = Set("region", "nation")
    // Hinted sides bounded by a CONSTANT key predicate (vec_id < 5/16/50
    // query/pivot rows) rather than a plan shape the walker can prove:
    // each is a fixed probe set whose size is SF-independent by
    // construction. Anything newly flagged must either earn its row here
    // (with the bound named) or drop its hint.
    val constantFilterBounded = Set("q38_sim_cosine_topk",
      "q39_sim_ann_lsh", "q45_sim_ann_ivf", "q69_kmeans_lloyd",
      "q89_semantic_dedup", "q102_cluster_sample",
      "q135_hard_negatives", // vec_id < 50 anchor/probe set + 16 pivots
      "q136_knn_label") // vec_id < 16 pivot table (holdout side NOT hinted)
    // Hinted sides bounded by a RUNTIME ESTIMATE the static walker
    // cannot prove: the CBO path. Each entry must name the gate.
    val statsGatedBounded = Set(
      "q315_analyzed_join", // broadcast only when the 32-bucket histogram
      // estimate is under min(5% of n, 5M-row absolute cap) — the
      // StatsPlanner budget; the shuffle branch carries a merge hint,
      // which never replicates the side
      "q318_ordered_join") // each dim side broadcasts only when its
      // histogram estimate is under the same 5M-row absolute cap
      // (StatsPlanner.orderedJoin); over the cap the dim is pinned to
      // a merge-hinted shuffle (orders crosses the cap at sf10)
    val offenders = Registry.queries.toSeq
      .filterNot { case (name, _) =>
        skipBuild(name) || constantFilterBounded(name) ||
          statsGatedBounded(name) }
      .flatMap { case (name, fn) =>
        fn(spark, dir).queryExecution.analyzed.collect {
          // merge/shuffle-hash hints never REPLICATE their side — they
          // pin scale-safe shuffle strategies; only broadcast and
          // replicate-NL hints can OOM on a growing side
          case h: ResolvedHint if h.hints.strategy.exists(s =>
              s == BROADCAST || s == SHUFFLE_REPLICATE_NL) =>
            val bounded = h.child.collectFirst {
              case _: Aggregate => ()
              case _: GlobalLimit => ()
              case _: Sample => ()
              case _: Deduplicate => ()
            }.isDefined
            val growingScans = h.child.collect {
              case lr: LogicalRelation if (lr.relation match {
                    case fs: HadoopFsRelation => !fs.location.rootPaths
                      .exists(p => constantDims.exists(d =>
                        p.toString.contains(s"/$d")))
                    case _ => true
                  }) => lr
            }
            if (!bounded && growingScans.nonEmpty)
              Some(s"$name: ${h.hints.strategy.get} hint on an unbounded, " +
                s"SF-growing side (${growingScans.size} raw scan(s))")
            else None
        }.flatten
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no gate return path routes result rows through the driver") {
    // The round-6 verdict's one systemic scale flaw: streaming gates
    // that `collect()` their final result to the driver and rebuild a
    // local DataFrame — O(result) driver memory at 100× scale even when
    // the operator itself is distributed. Results must instead land in
    // GateOut (stream sink or one distributed persist) and return as a
    // lazy reader. Mechanically: the rebuild idiom `collect().toSeq`
    // must not appear in main source at all, and every remaining
    // `.collect(` must be annotated as a bounded collect (a scalar, a
    // fixed alphabet, or a registry-sized set) within the 3 preceding
    // lines — an unannotated collect is either unbounded or undocumented,
    // and both fail here.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala
        lines.zipWithIndex.flatMap { case (line, i) =>
          if (line.contains("collect().toSeq"))
            Some(s"$p:${i + 1}: collect().toSeq rebuild idiom")
          else if (line.contains(".collect(") && !line.trim.startsWith("//") &&
              !(i - 3 to i).exists(j => j >= 0 &&
                lines(j).toLowerCase.contains("bounded collect")))
            Some(s"$p:${i + 1}: unannotated .collect( — bound it or GateOut it")
          else None
        }
      }.toSeq
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** Queries whose UNPARTITIONED windows are audited bounded: the window
    * input is a histogram / alphabet / limit-capped / partition-count
    * table, never a table that grows linearly with the data. Every entry
    * names its bound; anything newly flagged must either earn a row here
    * or be recoded onto a scale-safe device (Ranks.globalRank for exact
    * global ranking, orderBy().limit() for top-k — the q181/q182 round-8
    * recodes). */
  private val unpartitionedWindowBounded: Map[String, String] = Map(
    "q62_lang_rebalance" -> "min over the per-language counts table (#languages rows)",
    "q64_corpus_release" -> "same withQuotas language-alphabet min as q62",
    "q79_source_mixture" -> "budget min over the 5-row ratio x counts table",
    "q108_zipf_coverage" -> "rank over the limit(1000)-capped vocab head",
    "q157_benford" -> "share window over the 9-row first-digit histogram",
    "q170_quantile_normalize" -> "cumulative over the n_chars length histogram (max doc length)",
    "q175_apportion" -> "largest-remainder rank over #languages rows",
    "q181_rfm_segments" -> "Ranks.globalRank offsets table (#shuffle-partitions rows)",
    "q182_seasonal_resid" -> "rank label over the 20 rows surviving orderBy().limit(20)",
    "q195_vocab_growth" -> "cumulative over the fixed 20-bucket corpus grid",
    "q198_concentration" -> "count-of-counts histogram (max per-user count)",
    "q204_decile_lift" -> "cumulative over the 10-bin score histogram",
    "q205_pr_curve" -> "total over the 10-bin score histogram",
    "q214_nelson_aalen" -> "hazard windows over the 10-minute duration histogram (observation span)",
    "q216_t_closeness" -> "global-distribution total over the 5-priority alphabet",
    "q314_cbo_planning_audit" -> "Ranks.globalRank offsets table (#shuffle-partitions rows) x1 + cumulative over the 32-bucket histogram x2",
    "q218_topk_churn" -> "rank over each window's limit(20)-capped top list",
    "q227_typo_join" -> "rank label over the 20 rows surviving orderBy().limit(20)",
    "q228_zorder_audit" -> "rank label over the 24 rows surviving orderBy().limit(24)",
    "q230_bm25_topk" -> "rank label over the 20 rows surviving orderBy().limit(20)",
    "q240_stratified_folds" -> "global total over the per-language counts table (#languages rows)",
    "q241_kmv_intersect" -> "rank over the ≤2k=128-row union of two limit(64) KMV sketches",
    "q247_forecast_backtest" -> "lags over the daily spine (one row per day of observation span)",
    "q251_range_splits" -> "Ranks.prefixSum offsets table (#shuffle-partitions rows)",
    "q260_isotonic_calibration" -> "prefix sums + monotone lag over the ≤50-row quantity-alphabet bin table",
    "q278_neyman_allocation" -> "largest-remainder rank over the 5-row o_orderpriority stratum table",
    "q281_skyline" -> "Ranks.prefixMax + globalRank offsets tables (#shuffle-partitions rows each)",
    "q282_changepoint" -> "Ranks.globalRank + prefixSum offsets tables (#shuffle-partitions rows each)",
    "q283_survival_table" -> "Ranks.prefixSum offsets table (#shuffle-partitions rows)",
    "q284_hilbert_audit" -> "Ranks.globalRank offsets tables (#shuffle-partitions rows, one per scheme)",
    "q285_cms_audit" -> "rank over the 20 rows surviving orderBy().limit(20)",
    "q287_hilbert_range_scan" -> "Ranks.globalRank offsets table (#shuffle-partitions rows)")

  test("no unpartitioned window runs over an unbounded input") {
    // The q181 lesson (round-7 verdict): `ntile/row_number over
    // Window.orderBy(...)` with no partition clause executes as ONE task
    // sorting the entire input — correct at test SF, a scale killer at
    // 100×. Mechanically: every logical Window node with an empty
    // partitionSpec must belong to a query whose window input is proven
    // bounded (allow-list above, bound named per entry).
    import org.apache.spark.sql.catalyst.plans.logical
    val offenders = Registry.queries.toSeq
      .filterNot { case (name, _) =>
        skipBuild(name) || unpartitionedWindowBounded.contains(name) }
      .flatMap { case (name, fn) =>
        val n = fn(spark, dir).queryExecution.optimizedPlan.collect {
          case w: logical.Window if w.partitionSpec.isEmpty => w
        }.size
        if (n > 0) Some(s"$name: $n unpartitioned Window node(s)")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the similarity battery joins only on bucket/cell equi-keys") {
    for (q <- Seq("q39_sim_ann_lsh", "q40_sim_cosine_neardup",
        "q43_dedup_simhash_hamming", "q35_dedup_minhash_lsh",
        "q37_dedup_ngram_jaccard")) {
      val plan = Registry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q: pairwise stage must stay candidate-scoped")
    }
  }
}
