package graft

import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Static plan audit — the 100 TB invariants, asserted on the physical
  * plans of the registered queries rather than read off by hand. A plan
  * regression (a lost broadcast, an accidental cross product, a filter
  * that stopped pushing) fails CI here long before it costs hours on a
  * cluster. Plans are audited post-EnsureRequirements (executedPlan),
  * descending through the AQE wrapper.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTest
    with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  // every non-ML query whose construction does not itself run jobs;
  // ML fits and dictionary-collecting kernels are excluded because
  // building their DataFrame already executes Spark jobs
  private val auditable = Seq(
    "o1_scan", "o2_project_ids", "o2b_project_idlist", "o3_range",
    "o3b_range_cond", "o4_equal", "o5_agg_all", "o5_argmax", "o5_percentile",
    "o5_topk", "o6_window_pos", "o6_window_time", "o6_window_argmax",
    "o6_window_p50", "o8_zonemap",
    "o8_zonemap_max", "influx_max", "influx_max_groupby", "tsbs_last_loc",
    "tsbs_low_fuel", "tsbs_high_load", "tsbs_untagged",
    "ts_session", "ts_resample_ffill",
    "asof_segment", "asof_native", "range_bands", "e1_quantize", "e2_approx",
    "q1_agg", "q3_join", "q5_join", "q6_filter_agg", "q9_parts",
    "bonus_topk", "bonus_distinct",
    "bonus_setops", "bonus_rollup", "dedup_exact", "dedup_minhash",
    "dedup_ngram", "dedup_simhash", "simhash_pairs", "dedup_embedding",
    "text_stats", "text_quality", "text_lang_id", "text_token_count",
    "text_clean", "text_fingerprint", "emb_norm", "ann_lsh",
    "tier_paa_max", "tier_rrd", "tier_recode_plan", "tier_lttb",
    "tier_lttb_summary", "mm_meta", "mm_features", "mm_frames",
    "pipe_split", "pipe_pack", "pipe_quota", "pipe_curate", "pipe_vocab",
    "pipe_decontam", "pipe_corpus",
    "ts_delta", "ts_moving_avg", "ts_zscore", "ts_corr", "ts_gaps",
    "ts_ewma_seg", "bonus_approx", "e2b_approx_sum",
    "tier_policy", "tier_ladder", "text_repetition", "text_scrub",
    "pipe_mixture", "ts_counter_rate", "pipe_shuffle", "ts_resample_interp",
    "ts_xcorr_lag", "ts_xcorr_best", "tier_pla", "ts_seasonal_anomaly",
    "ts_histogram", "ts_rolling_corr", "pipe_bpe_pairs",
    "o8_percentile_sketch",
    "ts_twa", "ts_m4", "ts_acf", "ts_bollinger", "ts_hw_forecast",
    "seg_motif", "text_entropy", "text_dup_lines",
    "asof_tolerance", "ts_hod_profile", "ts_outlier_mad", "ts_mad",
    "ts_peaks", "ts_event_funnel", "ts_json_props", "dedup_jaccard_hist",
    "q10_returns", "q18_bigorders", "bonus_cube", "bonus_retention",
    "ts_ohlc_weekly", "text_ttr", "pipe_pack_sorted",
    // emb_knn_confusion wraps emb_knn_1nn's bounded broadcast probe set
    // (the by-design nested-loop baseline) — excluded like seg_knn
    "text_langid_confusion", "ts_forecast_backtest",
    "asof_native_tolerance", "emb_project", "pipe_chunk",
    // round-15 additions: the blob-dedup rungs build lazily (banded /
    // prefix-filtered postings candidate joins + confirm)
    "mm_dedup_exact", "mm_near_dup", "mm_near_dup_winnow")
  // ann_rp / ann_rp_rerank / ann_rp_*_recall are excluded like ann_quant:
  // the reduced-space pass ranks a bounded broadcast probe set against the
  // corpus by design (the JL shortlist baseline), and the recall rows
  // embed the brute-force exact baseline
  // round-10 exclusions, same rationales: buff_max_outlier fetches the
  // scalar base offset at build time like the other buff_* rows;
  // ml_iforest_psi fits at construction like the rest of the ml_* family;
  // seg_profile_route / seg_profile_auto / seg_discord_auto
  // localCheckpoint at construction like the rest of the profile family
  // (their keyed-join discipline is asserted on candidatePairs in
  // MotifDiscordSpec's plan-shape test)
  // round-9 exclusions, same rationales: seg_knn_fft(_agree) rank the
  // bounded broadcast probe set like seg_knn; buff_range_outlier /
  // buff_sum_outlier fetch the scalar base offset at build time like the
  // other buff_* rows; tier_lru_plan localCheckpoints its range-
  // partitioned stats at build time (the two-phase prefix sum's pid
  // consistency requires one materialization)
  // round-8 exclusions, same construction-runs-jobs rationale:
  // text_bm25/text_xent/pipe_quality_filter/pipe_bpe_round2 fetch bounded
  // corpus scalars at build time, ml_dbscan/dedup_semantic run the CC
  // loop; their plan invariants are asserted in RelevanceSpec /
  // DbscanSpec / SemanticDedupSpec instead
  // second-wave exclusions: ann_ivfpq*/pipe_bpe_encode fetch the bounded
  // codebook/merge scalars at build time; pipe_dedup_quality runs the CC
  // loop; seg_knn_paa ranks the bounded broadcast probe set like seg_knn
  // ann_quant is excluded like ann_brute: both rank a bounded broadcast
  // probe set against the corpus by design (the exact/quantized baselines)
  // excluded on purpose: ann_recall / ann_ivf_recall / dedup_emb_recall
  // embed the brute-force exact baseline (a bounded broadcast
  // nested-loop probe set by design), and ml_* / *_kmeans / seg_kernel_*
  // run jobs (fits, dictionary collects) at DataFrame-construction time

  test("no query plans a cartesian product or an unbounded nested-loop join") {
    for (name <- auditable) {
      val p = plan(name)
      assert(collect(p) { case c: CartesianProductExec => c }.isEmpty,
        s"$name plans a CartesianProduct")
      // the exact-baseline probes (ann_brute, seg_knn, emb_knn_1nn)
      // broadcast a BOUNDED side by design and are not in this list;
      // everything else must join by hash on a key
      assert(collect(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("dimension joins broadcast the small side") {
    for (name <- Seq("q3_join", "q5_join", "tsbs_last_loc", "tsbs_high_load",
                     "pipe_mixture")) {
      val b = collect(plan(name)) { case j: BroadcastHashJoinExec => j }
      assert(b.nonEmpty, s"$name lost its broadcast join")
    }
  }

  test("aggregations are map-side partial (two HashAggregate phases)") {
    for (name <- Seq("q1_agg", "o5_agg_all", "influx_max_groupby", "dedup_exact")) {
      val aggs = collect(plan(name)) { case a: HashAggregateExec => a }
      assert(aggs.size >= 2, s"$name is not partial-aggregated: ${aggs.size} phases")
    }
  }

  test("LSH dedup shuffles only on keys, never funnels the corpus") {
    // every exchange must be hash-partitioned (keyed); a RoundRobin or
    // single-partition exchange in the pair-generation path would mean
    // the corpus is being funneled, not bucketed
    for (name <- Seq("dedup_minhash", "dedup_ngram", "simhash_pairs", "ann_lsh")) {
      val exs = collect(plan(name)) { case e: ShuffleExchangeExec => e }
      assert(exs.nonEmpty, s"$name: expected keyed shuffles")
      exs.foreach { e =>
        val part = e.outputPartitioning.getClass.getSimpleName
        assert(part.contains("HashPartitioning"),
          s"$name shuffles with $part instead of hash partitioning")
      }
    }
  }

  test("bandit reward aggregations shuffle keyed only") {
    // the distributed half of the bandit (per-segment rewards) must stay
    // a keyed aggregation: hash-partitioned exchanges, no funneling
    val r = graft.operators.Readings.of(spark, sf)
    for ((nm, df) <- Seq(
        "compress" -> graft.ml.Bandit.rewardInputs(r),
        "recode" -> graft.ml.Bandit.recodeRewardInputs(r))) {
      val p = df.queryExecution.executedPlan
      assert(collect(p) { case c: CartesianProductExec => c }.isEmpty,
        s"bandit $nm plans a CartesianProduct")
      val exs = collect(p) { case e: ShuffleExchangeExec => e }
      assert(exs.nonEmpty, s"bandit $nm: expected keyed shuffles")
      exs.foreach { e =>
        val part = e.outputPartitioning.getClass.getSimpleName
        assert(part.contains("HashPartitioning"),
          s"bandit $nm shuffles with $part instead of hash partitioning")
      }
    }
  }

  test("bandit replay never materializes the full reward stream on the driver") {
    // the r5 verdict's one scale-killer: the policy walk must CONSUME the
    // ordered reward stream (toLocalIterator, one partition at a time),
    // never .collect() it whole. Source-level guard: a reintroduced
    // full-stream collect in the bandit module fails here.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ml/Bandit.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(!src.contains(".collect()"),
      "Bandit.scala contains a full-stream .collect() — feed the walk via toLocalIterator")
    assert(src.contains("toLocalIterator"),
      "Bandit.scala lost its incremental toLocalIterator feed")
  }

  test("the deterministic split is map-only: zero exchanges") {
    // sampleSplit must stay a pure projection — any shuffle here would
    // mean the per-doc assignment somehow depends on other rows
    val exs = collect(plan("pipe_split")) { case e: ShuffleExchangeExec => e }
    assert(exs.isEmpty, s"pipe_split shuffles: ${exs.size} exchanges")
  }

  test("whole-stage codegen covers the scan->filter->project hot path") {
    // under AQE, CollapseCodegenStages runs per query stage at execution
    // time — run the query, then audit the FINAL adaptive plan
    for (name <- Seq("o3_range", "text_quality", "e1_quantize")) {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // executes THIS plan (count() would build a new one)
      val spans = collect(df.queryExecution.executedPlan) {
        case w: WholeStageCodegenExec => w
      }
      assert(spans.nonEmpty, s"$name has no codegen span")
    }
  }
}
