package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression net over the gate queries, using the same
  * fingerprint parser as `Explain --plans-md`: asserts the properties
  * that make these plans right at 100 TB — filter pushdown reaching the
  * parquet scan, bounded shuffle counts, no cartesian products or
  * nested-loop joins outside the deliberate broadcast-centroid/query
  * designs, hash (not sort) aggregation on the hot paths. A refactor
  * that silently loses one of these fails here, not in a 100× run.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fp(name: String): (Explain.Fingerprint, String) = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.count() // AQE-final plan
    val plan = df.queryExecution.explainString(FormattedMode)
    (Explain.fingerprint(plan), plan)
  }

  test("downsample scan: pushdown, no joins, hash-agg only, few shuffles") {
    val (f, plan) = fp("q_ds_avg")
    assert(f.pushedFilters, "ts/metric bounds must reach the parquet scan")
    assert(f.exchanges <= 3, s"q_ds_avg shuffles: ${f.exchanges}\n$plan")
    assert(f.sortMergeJoins == 0 && f.nestedLoopJoins == 0)
    assert(f.sortAggregates == 0, "downsample must stay hash-aggregated")
  }

  test("cross-series aggregation stays hash-aggregated with pushdown") {
    val (f, _) = fp("q_agg_sum")
    assert(f.pushedFilters)
    assert(f.sortAggregates == 0)
    assert(f.exchanges <= 4)
  }

  test("near-dup blocked join: equi-join only — no cartesian, no BNLJ") {
    val (f, plan) = fp("pl_neardup_cos")
    assert(f.nestedLoopJoins == 0,
      s"blocked triangle join degenerated to a cartesian/BNLJ\n$plan")
  }

  test("exact dedup is one hash exchange + window, no joins") {
    val (f, _) = fp("pl_dedup_exact")
    assert(f.exchanges <= 2)
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0)
  }

  test("per-row operators never shuffle beyond the output sort") {
    Seq("pl_lang_id", "pl_redact", "pl_fingerprint", "pl_text_stats",
      "pl_quality_lr", "pl_repetition", "pl_mixture", "pl_split",
      "pl_sample", "pl_embed_prep", "pl_mm_meta", "pl_mm_frames").foreach { q =>
      val (f, plan) = fp(q)
      assert(f.exchanges <= 1, s"$q should be per-row (+output sort): $plan")
      assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
        s"$q grew a join")
    }
  }

  test("textrank: no cartesian/BNLJ across the unrolled PageRank rounds") {
    val (f, plan) = fp("pl_textrank")
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"PageRank round degenerated\n$plan")
    assert(f.sortAggregates == 0, "contribution sums must stay hash-agg")
  }

  test("embed outlier: aggregate + per-row scoring, no join anywhere") {
    val (f, plan) = fp("pl_embed_outlier")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"centroid must be a literal, not a join\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k must be TakeOrdered, not a global sort\n$plan")
  }

  test("source overlap: token self-join is equi, set sizes broadcast") {
    val (f, plan) = fp("pl_source_overlap")
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"vocab self-join degenerated\n$plan")
    assert(f.broadcastJoins >= 2, s"size frames must broadcast\n$plan")
  }

  test("seasonal forecast and sax: one keyed exchange each, pushdown intact") {
    Seq("q_hw_forecast", "q_sax").foreach { q =>
      val (f, plan) = fp(q)
      assert(f.pushedFilters, s"$q: ts/metric bounds must reach the scan")
      assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
        s"$q grew a join\n$plan")
    }
  }

  test("decontamination broadcasts the eval side (train never shuffles first)") {
    val (f, plan) = fp("pl_decontam")
    assert(f.pushedFilters)
    assert(f.sortMergeJoins == 0,
      s"eval grams must broadcast, not sort-merge\n$plan")
  }

  test("as-of join: one data shuffle, window-only — no join operator at all") {
    val (f, plan) = fp("q_asof_join")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"as-of must stay union+window, not become a range join\n$plan")
    // one hash exchange for the keyed window + the output range sort
    assert(f.exchanges <= 2, s"q_asof_join shuffles: ${f.exchanges}\n$plan")
  }

  test("interval join: equi-join on (key, bucket) — no cartesian, no BNLJ") {
    val (f, plan) = fp("q_interval_join")
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"bucketed interval join degenerated to a range scan\n$plan")
  }

  test("bpe encode: broadcast-merge map, no shuffle beyond the output sort") {
    val (f, plan) = fp("pl_bpe")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"pl_bpe grew a join\n$plan")
    assert(f.exchanges <= 1, s"encode is per-row (+output sort): $plan")
  }

  test("bm25: query terms broadcast; no cartesian anywhere") {
    val (f, plan) = fp("pl_bm25")
    assert(!plan.contains("CartesianProduct"), s"bm25 cartesian\n$plan")
    assert(f.broadcastJoins >= 1,
      s"query-term join must be the broadcast side\n$plan")
    assert(f.nestedLoopJoins == 0, s"bm25 grew a BNLJ\n$plan")
  }

  test("winnowing: one doc-keyed window shuffle, no joins") {
    val (f, plan) = fp("pl_winnow")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"winnow grew a join\n$plan")
    // window exchange + distinct exchange + output sort
    assert(f.exchanges <= 3, s"pl_winnow shuffles: ${f.exchanges}\n$plan")
  }

  test("ewma: single keyed window, no joins, pushdown intact") {
    val (f, plan) = fp("q_ewma")
    assert(f.pushedFilters, "ts/metric bounds must reach the scan")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"ewma grew a join\n$plan")
  }

  test("IVF search: centroid joins broadcast, candidate work never " +
    "query-cross-corpus") {
    val (f, plan) = fp("pl_knn_ivf")
    // the probe side may broadcast-nested-loop against the (tiny)
    // centroid table; a SortMergeJoin on cid for candidates is
    // acceptable — what must never appear is an unpartitioned cartesian
    // over the corpus, or a SECOND nested-loop (corpus assignment is a
    // per-row NearestCentroidCos expression, not a join)
    assert(!plan.contains("CartesianProduct"), s"corpus cartesian\n$plan")
    assert(f.nestedLoopJoins <= 1,
      s"corpus-side assignment regressed to a join\n$plan")
  }

  test("mad: pushdown, broadcast-only joins back to the deduped frame") {
    val (f, plan) = fp("q_mad")
    assert(f.pushedFilters, "ts/metric bounds must reach the scan")
    assert(f.sortMergeJoins == 0 && f.nestedLoopJoins == 0,
      s"median/MAD frames must broadcast, not shuffle-join\n$plan")
  }

  test("acf: bucketed self-join is equi, moments stay hash-aggregated") {
    val (f, plan) = fp("q_acf")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"lag pairing degenerated\n$plan")
    assert(f.sortAggregates == 0, "moment sums must stay hash-agg")
  }

  test("linear fill: spine join equi, one window pass for both neighbors") {
    val (f, plan) = fp("q_fill_linear")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"spine join degenerated\n$plan")
    // the IGNORE-NULLS neighbor columns may split across chained Window
    // execs, but they must all ride ONE (skey, bucket) sort — the only
    // other Sort in the plan is the output presentation sort
    assert("(?m)^\\s*(?:\\+- |:- )?Sort ".r.findAllIn(plan).size <= 2,
      s"neighbor windows re-sorted between passes\n$plan")
  }

  test("grid quantiles: no joins; sketch agg + cumsum window + readout") {
    val (f, plan) = fp("pl_len_quantiles")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"sketch readout grew a join\n$plan")
    assert(f.exchanges <= 4, s"pl_len_quantiles shuffles: ${f.exchanges}\n$plan")
  }

  test("url dedup: both shuffles keyed by canon, no cartesian") {
    val (f, plan) = fp("pl_dedup_url")
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"canon-key join degenerated\n$plan")
  }

  test("stupid backoff: count joins all equi on gram keys, hash-agg") {
    val (f, plan) = fp("pl_sbo_nll")
    assert(f.nestedLoopJoins <= 1, // the 1-row N·V scalar frame broadcast
      s"count join degenerated\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian\n$plan")
    assert(f.sortAggregates == 0, "gram counts must stay hash-agg")
  }

  test("ANN re-rank and recall: candidate-bounded, no corpus cartesian") {
    Seq("pl_knn_rerank", "pl_ann_recall").foreach { q =>
      val (_, plan) = fp(q)
      assert(!plan.contains("CartesianProduct"), s"$q corpus cartesian\n$plan")
    }
  }

  test("cluster stats: assignment is an expression, centroids broadcast") {
    val (f, plan) = fp("pl_cluster_stats")
    assert(!plan.contains("CartesianProduct"), s"corpus cartesian\n$plan")
    assert(f.sortMergeJoins == 0,
      s"k-row centroid frame must broadcast, not shuffle-join\n$plan")
    assert(f.sortAggregates == 0, "inertia sums must stay hash-agg")
  }

  test("series outlier: two-level agg, cohort frame broadcast, pushdown") {
    val (f, plan) = fp("q_series_outlier")
    assert(f.pushedFilters, "ts/metric bounds must reach the scan")
    assert(f.sortMergeJoins == 0,
      s"1-row cohort stats must broadcast\n$plan")
    assert(f.sortAggregates == 0)
  }

  test("OLS fit: single moment aggregation, no joins, pushdown") {
    val (f, plan) = fp("q_ols_fit")
    assert(f.pushedFilters, "ts/metric bounds must reach the scan")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"six-sum fit must be one aggregation chain, not a join\n$plan")
    assert(f.sortAggregates == 0, "moment sums must stay hash-agg")
  }

  test("cross-metric correlation: bucket frames join equi on (tkey, t)") {
    Seq("q_xcorr", "q_spearman").foreach { q =>
      val (f, plan) = fp(q)
      assert(f.pushedFilters, s"$q: metric/ts bounds must reach the scan")
      assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
        s"$q entity join degenerated\n$plan")
      assert(f.sortAggregates == 0, s"$q moment sums must stay hash-agg")
    }
  }

  test("STL: one 5-bucket window + phase agg; seasonal joins back equi") {
    val (f, plan) = fp("q_stl")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"phase join degenerated\n$plan")
  }

  test("changepoint: prefix-sum windows + rank, no joins at all") {
    val (f, plan) = fp("q_changepoint")
    assert(f.pushedFilters)
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"split scoring must be windows over one frame, not a join\n$plan")
  }

  test("seasonal-naive backtest: shifted self-joins stay equi-keyed") {
    val (f, plan) = fp("q_snaive_eval")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"forecast join degenerated\n$plan")
    assert(f.sortAggregates == 0, "sMAPE term sums must stay hash-agg")
  }

  test("stratified sample: one rank window per stratum, no joins") {
    val (f, plan) = fp("pl_sample_strat")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"quota filter must ride the rank window, not a count join\n$plan")
    assert(f.exchanges <= 2, s"pl_sample_strat shuffles: ${f.exchanges}\n$plan")
  }

  test("z-order audit: per-row curve key + one aggregation, no joins") {
    val (f, plan) = fp("pl_zorder")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"Morton key must be an expression, not a join\n$plan")
  }

  test("budget water-fill: one corpus pass; the fill runs on source rows") {
    val (f, plan) = fp("pl_budget_alloc")
    assert(f.nestedLoopJoins <= 1, // the 1-row λ/remainder params broadcast
      s"water-fill grew an unbounded join\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian\n$plan")
    val (f2, plan2) = fp("pl_budget_sample")
    assert(f2.nestedLoopJoins <= 1, s"apply-side grew a BNLJ\n$plan2")
    assert(f2.sortMergeJoins == 0,
      s"per-source allocations must broadcast into the apply join\n$plan2")
  }

  test("pca: moment aggregation hash-aggregated; projection is per-row") {
    val (f, plan) = fp("pl_pca")
    assert(f.sortAggregates == 0, s"moment sums must stay hash-agg\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian\n$plan")
  }

  test("standardize: moment frame broadcasts back, no shuffle-join") {
    val (f, plan) = fp("pl_emb_standardize")
    assert(f.sortMergeJoins == 0,
      s"64-row moment frame must broadcast\n$plan")
    assert(f.sortAggregates == 0)
  }

  test("matrix profile: subsequence self-join equi on skey, pushdown") {
    val (f, plan) = fp("q_matrix_profile")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"profile pair join degenerated\n$plan")
  }

  test("value drift: two hash aggs + broadcast totals, no SMJ") {
    val (f, plan) = fp("q_value_drift")
    assert(f.pushedFilters)
    assert(f.sortMergeJoins == 0,
      s"per-series totals must broadcast\n$plan")
    assert(f.sortAggregates == 0)
  }

  test("dtw: one skey-keyed shuffle into the per-series DP, pushdown") {
    val (f, plan) = fp("q_dtw")
    assert(f.pushedFilters, "ts/metric bounds must reach the scan")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"profile DP must ride the bucket aggregation, not a join\n$plan")
  }

  test("metric ratio: bucket frames left-join equi on (tkey, t)") {
    val (f, plan) = fp("q_metric_ratio")
    assert(f.pushedFilters)
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"ratio join degenerated\n$plan")
    assert(f.sortAggregates == 0)
  }

  test("HLL overlap: register joins all equi, estimates hash-aggregated") {
    val (f, plan) = fp("pl_hll_overlap")
    assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
      s"pair-union register merge degenerated to a cartesian\n$plan")
    assert(f.sortAggregates == 0, "register max/harmonic sums must stay hash-agg")
  }

  test("ngram novelty: gram-keyed window + id agg, join-free") {
    val (f, plan) = fp("pl_ngram_novelty")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0,
      s"novelty must ride ONE shingle window, not a join\n$plan")
    assert(f.exchanges <= 3, s"novelty shuffles grew: ${f.exchanges}\n$plan")
    assert(f.windows == 1, "exactly one first-occurrence window")
  }

  test("dup inflation: two map-side-combined aggs, text never shuffles") {
    val (f, plan) = fp("pl_dup_inflation")
    assert(f.broadcastJoins + f.sortMergeJoins + f.nestedLoopJoins == 0)
    assert(f.exchanges <= 3, s"inflation shuffles grew: ${f.exchanges}")
    assert(f.sortAggregates == 0)
  }

  test("cross-source leak and fertility: equi-joins only") {
    Seq("pl_cross_source_leak", "pl_tok_fertility").foreach { q =>
      val (f, plan) = fp(q)
      assert(f.nestedLoopJoins == 0 && !plan.contains("CartesianProduct"),
        s"$q degenerated to a cartesian\n$plan")
      assert(f.sortAggregates == 0, s"$q lost hash aggregation")
    }
  }
}
