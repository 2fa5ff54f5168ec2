"""Edge-case robustness: nulls, empty/short texts, unicode, and the A9
randomSplit mini-batch invariants."""

import os

import pytest
from pyspark.sql import functions as F

from fmx.operators import dedup as D
from fmx.operators import text as X

# r13 verdict #2: the full per-round partition-invariance nets re-run
# ~90 queries at two shuffle-partition counts — too slow for the
# external driver's verify window.  Default tier keeps ONE small net
# over the structurally riskiest (fusion-touched) queries; the full
# per-round nets run under FMX_FULL_SUITE=1 (builder runs that tier
# before every round close).
full_suite_only = pytest.mark.skipif(
    os.environ.get("FMX_FULL_SUITE") != "1",
    reason="full-tier partition-invariance net (set FMX_FULL_SUITE=1)")


@pytest.fixture()
def messy_docs(spark):
    return spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the cat sat on the mat"),          # exact dup of 1
         (3, ""),                                 # empty
         (4, "ab"),                               # shorter than shingle n
         (5, "naïve café déjà-vu ünïcode 日本語"),  # unicode
         (6, "a b")],                             # 2 tokens < 3-shingle
        "doc_id bigint, text string")


def test_exact_dedup_handles_empty_and_unicode(spark, messy_docs):
    out = {r.keep_id: r.dup_count
           for r in D.exact_dedup(messy_docs, "doc_id", "text").collect()}
    assert out[1] == 2            # 1 and 2 collapse
    assert out[3] == 1 and out[5] == 1
    assert sum(out.values()) == 6


def test_shingles_skip_short_docs(spark, messy_docs):
    sh = D.word_shingles(messy_docs, "doc_id", "text", n=3)
    by_doc = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert 3 not in by_doc and 4 not in by_doc and 6 not in by_doc
    assert 1 in by_doc and 5 in by_doc


def test_minhash_collapses_exact_dups_only(spark, messy_docs):
    pairs = {(r.id_a, r.id_b)
             for r in D.minhash_lsh_pairs(messy_docs, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_simhash_empty_token_stability(spark, messy_docs):
    out = D.simhash(messy_docs, "doc_id", "text")
    rows = {r.doc_id: r.simhash for r in out.collect()}
    assert rows[1] == rows[2]
    assert 0 <= rows[5] < (1 << 16)


def test_text_stats_degenerate_docs(spark, messy_docs):
    stats = {r.doc_id: r for r in
             X.token_stats(messy_docs, "doc_id", "text").collect()}
    # empty text: split(' ') yields [''] -> 1 token, 0 chars
    assert stats[3].n_tokens == 1 and stats[3].n_chars == 0
    assert stats[6].n_tokens == 2
    # ratios never null/negative
    for r in stats.values():
        for v in (r.stopword_ratio, r.punct_ratio, r.digit_ratio):
            assert v is None or v >= 0.0


def test_null_text_rows_survive(spark):
    df = spark.createDataFrame([(1, None), (2, "ok text here")],
                               "doc_id bigint, text string")
    assert D.exact_dedup(df, "doc_id", "text").count() == 2  # null group kept
    fp = {r.doc_id: r.fingerprint
          for r in X.fingerprint(df, "doc_id", "text").collect()}
    assert fp[1] is None and fp[2] is not None


def test_connected_components_chains_and_singletons(spark):
    """A-B, B-C chain collapses to one cluster; isolated nodes keep
    their own id; canonical keep = min id per cluster."""
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint")
    comps = {r.doc_id: r.cluster_id
             for r in D.connected_components(pairs, ids, "doc_id").collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}

    df = ids.withColumn("text", F.concat(F.lit("doc "), "doc_id"))
    kept = {r.doc_id
            for r in D.dedup_keep_canonical(df, pairs, "doc_id").collect()}
    assert kept == {1, 4, 5}


def test_randomsplit_batches_disjoint_and_complete(spark):
    """A9 (SGD.scala:111-112): one randomSplit produces disjoint batches
    covering the dataset, stable under a fixed seed."""
    df = spark.range(1000)
    frac = [0.25] * 4
    batches = df.randomSplit(frac, seed=1234)
    ids = [set(r.id for r in b.collect()) for b in batches]
    union = set().union(*ids)
    assert union == set(range(1000))
    total = sum(len(s) for s in ids)
    assert total == 1000                      # disjoint (no overlaps)
    again = df.randomSplit(frac, seed=1234)
    assert [set(r.id for r in b.collect()) for b in again] == ids


def _assert_partition_invariant(spark, sf_dir, names):
    """Shared net: re-run each named query under two different
    shuffle-partition counts and require identical (column-name-sorted,
    row-sorted, 9dp-rounded, NaN-normalized) results — catches
    order-dependent aggregates, unseeded randomness, and rank ties
    broken by partition layout."""
    import math

    import fmx.queries as Q

    ALL = Q.all_queries()

    def snap():
        out = {}
        for n in names:
            df = ALL[n].fn(spark, sf_dir).toPandas()
            cols = sorted(df.columns)
            rows = [tuple("NaN" if isinstance(v, float) and math.isnan(v)
                          else (round(v, 9) if isinstance(v, float) else v)
                          for v in row)
                    for row in df[cols].itertuples(index=False)]
            out[n] = sorted(rows, key=repr)
        return out

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = snap()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = snap()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    bad = [n for n in names if a[n] != b[n]]
    assert not bad, bad


@full_suite_only
def test_round5_queries_partition_invariant(spark, sf_dir):
    """Results must be a pure function of the data, not of parallelism:
    re-running under a different shuffle-partition count must produce
    identical rows (catches order-dependent aggregates, unseeded
    randomness, and rank ties broken by partition layout)."""
    names = ["event_sessionization", "dedup_cross_corpus",
             "web_domain_cap", "profile_robust_scale",
             "sample_pack_manifest", "dedup_keep_longest",
             "text_vocab_kl_by_source", "ann_ivf_cell_histogram"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round6_queries_partition_invariant(spark, sf_dir):
    """Same pure-function-of-the-data invariant for the round-6
    additions: LPA tie-breaks, Gramian partial-sum layout, power
    iteration, boilerplate reassembly order, BPE/jaccard rank ties,
    sketch register merges — none may depend on parallelism."""
    names = ["graph_label_propagation", "emb_gram_matrix",
             "emb_top_eigvec", "text_boilerplate_strip",
             "text_bpe_pair_merges", "graph_jaccard_neighbors",
             "feat_target_encode_loo", "eval_ks_split_drift",
             "rolling_7d_hll_users", "dq_table_diff_drilldown",
             "cohort_ltv_curve", "ts_seasonal_backtest",
             "retrieval_hard_negatives", "eval_ab_srm",
             "profile_column_cardinalities",
             "multimodal_payload_dedup", "sample_group_split",
             "ts_cusum_changepoint", "profile_gini_binned",
             "text_ngram_novelty", "ts_concurrent_orders",
             "ts_autocorrelation", "text_template_clusters",
             "dq_key_uniqueness", "ann_eval_ndcg",
             "emb_label_separation", "sample_neyman_allocation",
             "eval_langid_confusion", "sample_class_balance",
             "eval_pr_auc"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round7_queries_partition_invariant(spark, sf_dir):
    """Pure-function-of-the-data invariant for the round-7 additions:
    fold coins, percentile cutpoints, vocab rank ties, degree bins,
    freshness lags, range-search thresholds, CSV round-trip checksums
    — none may depend on parallelism."""
    names = ["s1_csv_roundtrip", "feat_frequency_encode",
             "feat_target_encode_kfold", "feat_quantile_bins",
             "feat_onehot_topk", "graph_degree_distribution",
             "dq_freshness", "ann_range_search", "eval_lift_deciles",
             "sample_time_split_embargo", "emb_pca_project",
             "profile_corr_matrix", "graph_kcore_members",
             "profile_value_ranges", "event_interarrival_stats",
             "emb_outlier_distance", "feat_hashed_cross",
             "eval_confusion_at_threshold", "ts_weekday_hour_profile",
             "sample_epoch_shuffle", "graph_assortativity",
             "eval_brier_score", "multimodal_payload_near_dup"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round7_session2_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the second round-7 batch: min-label
    rounds, entropy folds, EWMA lag chains, WoE totals, k-means
    argmins, grouped-AUC bins — pure functions of the data."""
    names = ["graph_connected_components", "profile_entropy",
             "dq_null_rate_drift", "text_readability", "ts_ewma",
             "feat_woe_encode", "eval_auc_by_group", "emb_kmeans_assign",
             "emb_truncation_fidelity", "ann_eval_ivf_vs_exact",
             "text_charset_profile", "dq_id_gaps", "eval_ece",
             "w8_rolling_median", "graph_adamic_adar",
             "sample_group_kfold", "text_zipf_slope",
             "ts_theilsen_trend", "graph_clustering_coefficient",
             "profile_null_patterns", "feat_decayed_counts",
             "multimodal_chunk_manifest", "retrieval_triplets",
             "ann_hamming_topk", "sample_negative_downsample"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round8_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-8 additions: blocking
    keys, PMI totals, kappa chance terms, KM risk sets, rank moments,
    MI marginals, streak islands, collapse thresholds, magic-byte
    stamps — pure functions of the data."""
    names = ["er_fuzzy_match", "text_pmi_bigrams", "text_gopher_filters",
             "eval_cohen_kappa", "eval_mcnemar", "event_new_vs_returning",
             "event_transition_entropy", "feat_target_rate_curve",
             "dq_amount_reconciliation", "ann_eval_hamming_vs_exact",
             "emb_dim_whiten", "multimodal_payload_entropy",
             "w9_percent_rank", "eval_spearman_corr",
             "feat_mutual_information", "event_kaplan_meier",
             "event_user_churn", "event_active_streaks",
             "event_weekly_stickiness", "feat_rare_category_collapse",
             "text_sentence_stats", "multimodal_format_sniff",
             "emb_cluster_purity", "emb_pairwise_cosine_histogram",
             "dedup_minhash_estimate_error", "ts_business_day_lag",
             "eval_kendall_tau_topk", "sample_dup_aware_weights",
             "sample_pps_systematic", "text_rake_keyphrases",
             "emb_assignment_margin", "stickiness_from_hll_registers",
             "event_burstiness", "dq_schema_drift",
             "eval_wilcoxon_signed_rank"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round9_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-9 additions: rank-sum
    moments, contingency crosses, hazard accumulations, passage-hash
    first-occurrence, closed-form MATTR, BFS frontier anti-joins,
    epsilon-graph min labels, kNN vote ties, register folds, bitmask
    sums, forward-asof carry — pure functions of the data."""
    names = ["eval_mann_whitney_u", "eval_cramers_v", "eval_log_loss",
             "event_nelson_aalen", "stats_mode_by_group",
             "stats_weighted_median", "text_passage_dedup", "text_mattr",
             "graph_bfs_frontier", "emb_epsilon_components",
             "ann_nprobe_recall_curve", "emb_knn_classifier_eval",
             "emb_label_representatives", "event_activity_bitmask",
             "quantiles_from_hist_registers", "ts_asof_forward_tolerance",
             "ts_stl_decompose", "s5_jsonl_roundtrip", "ann_ivf_topk"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round9_session1b_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the second round-9 batch: DiD cell
    means, CUPED decimal moments, Fleiss vote counts, wedge-join
    2-hop sets, ntile decile ties, vocab-rank cumsums, IDF-weighted
    shingle sums, per-stratum fold deals — pure functions of the
    data."""
    names = ["event_diff_in_diff", "event_cuped_adjustment",
             "eval_fleiss_kappa", "graph_harmonic_centrality_2hop",
             "event_lorenz_curve", "text_vocab_coverage_curve",
             "text_hapax_ratio", "dedup_weighted_jaccard",
             "sample_stratified_kfold", "emb_collapse_score",
             "ts_stl_anomaly", "eval_power_analysis",
             "w10_cumulative_distinct_users", "profile_boxplot_stats",
             "dedup_minhash_band_tuning", "feat_cyclical_encode"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round10_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-10 additions: unioned
    blocking passes, integer moment formulas, midrank sums, walk
    counts, wedge censuses, FD variant counts, md5 projections and
    Poisson replicate weights — pure functions of the data."""
    names = ["er_fuzzy_match_multipass", "eval_anova_f",
             "eval_kruskal_wallis", "eval_cochran_q", "stats_theil_index",
             "stats_trimmed_mean", "ts_mann_kendall", "graph_hits_3iter",
             "graph_rectangle_count", "dq_functional_dependency",
             "ann_mips_topk", "emb_jl_projection", "text_bigram_lm_ppl",
             "text_burrows_delta", "sample_poisson_bootstrap",
             "eval_permutation_test", "eval_proportions_ztest",
             "ts_pacf", "ts_seasonal_strength", "graph_edge_embeddedness",
             "stats_grubbs_test", "stats_jarque_bera",
             "ts_periodogram_dow", "event_survival_rmst",
             "event_uplift_by_decile", "emb_epsilon_components_scaled",
             # second round-10 batch: prefix-filter candidate joins,
             # smoothed m/u ratios, higher-order-fold recursions,
             # reverse-running-min step-up, postings-join LM scoring
             "dedup_allpairs_exact", "er_fellegi_sunter",
             "ts_holt_linear", "stats_benjamini_hochberg",
             "retrieval_query_likelihood", "sketch_kmv_intersection",
             "eval_msprt_always_valid", "s6_orc_roundtrip",
             "dedup_allpairs_canonical", "graph_rectangle_count_capped",
             "er_fellegi_sunter_scaled", "stats_p_chart", "text_heaps_law",
             "eval_tost_equivalence", "stats_brown_forsythe",
             "stats_friedman_test"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round11_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-11 additions: unioned FS
    blocking passes, Welch/Bartlett/Mood/runs moments, concordance
    ranks, Ljung-Box lag moments, Brier bin sums, centroid silhouette,
    JS divergence term sums, and the Holt-Winters seasonal fold."""
    names = ["er_fellegi_sunter_multipass", "eval_welch_ttest",
             "stats_mood_median_test", "stats_runs_test",
             "stats_bartlett_test", "stats_kendall_w", "ts_ljung_box",
             "eval_brier_decomposition", "emb_silhouette_simplified",
             "text_js_divergence", "ts_holt_winters",
             "eval_chisq_gof_dow", "eval_cohens_d",
             "er_fellegi_sunter_em",
             "graph_harmonic_centrality_2hop_capped",
             "stats_gini_exact", "eval_auc_delong", "stats_quade_test",
             "eval_hosmer_lemeshow"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round12_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-12 additions: the
    Anderson-Darling integer-scaled ln sums, Page/Cox-Stuart rank and
    sign assemblies, CUSUM fold, Cliff's-delta cumulative counts,
    Dickey-Fuller regression moments, assortativity stub sums, Yule's
    K frequency moments, MCC cells, MAP precision windows, Atkinson
    log/harmonic moments, turning-point lag/lead comparisons — none
    may depend on partition layout."""
    names = ["stats_anderson_darling", "eval_spiegelhalter_z",
             "eval_cliffs_delta", "ts_turning_points",
             "stats_cusum_chart", "stats_atkinson_index",
             "ts_dickey_fuller", "text_yules_k", "eval_mcc",
             "stats_page_trend", "graph_degree_assortativity",
             "ann_eval_map", "ts_cox_stuart", "stats_ks_normal"]
    _assert_partition_invariant(spark, sf_dir, names)


@full_suite_only
def test_round13_queries_partition_invariant(spark, sf_dir):
    """Parallelism invariance for the round-13 additions: the
    max_df-gated span profile's df join, Good-Turing frequency-of-
    frequency counts, burstiness floor-divided ratios, neighbor-degree
    class sums, rich-club threshold folds, the isotonic minimax
    lattice, conformal score windows, confident-joint cross-
    multiplied cells, Hurst block folds, and the diversified-topk
    suppression joins — none may depend on partition layout."""
    names = ["dedup_span_profile_capped", "text_good_turing",
             "text_burstiness", "graph_avg_neighbor_degree",
             "graph_rich_club", "eval_isotonic_calibration",
             "stats_conformal_coverage", "eval_confident_joint",
             "ts_hurst_rs", "ann_diversified_topk"]
    _assert_partition_invariant(spark, sf_dir, names)


def test_fused_headliners_partition_invariant(spark, sf_dir):
    """Default-tier net (r13 verdict #2): the queries whose plans were
    structurally fused in the r13/r14 optimization rounds — the ones a
    layout-dependent bug would most plausibly hide in — stay a pure
    function of the data under different shuffle-partition counts.
    The full per-round nets above run under FMX_FULL_SUITE=1."""
    names = ["dedup_allpairs_canonical", "emb_kmeans_assign",
             "pipeline_dataprep", "graph_connected_components",
             "fm_predict", "ann_ivfpq_topk", "text_rake_keyphrases",
             "dedup_span_profile"]
    _assert_partition_invariant(spark, sf_dir, names)
