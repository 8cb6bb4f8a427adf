"""Query-surface registry.

Every operator/query the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a PySpark callable plus (where SQL-expressible) an ANSI-SQL
oracle that DuckDB can run on the same parquet tables. The driver's
correctness gate runs both sides and hash-compares; ``tests/test_queries.py``
runs the identical comparison locally at sf0.001 before the driver does.
"""

from icebergsql_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401

# The driver's correctness gate samples roughly the FIRST 50 registry
# entries, so ordering is an explicit, auditable list instead of an
# accident of module import order.  Rotation policy: queries that have
# never received a driver CORRECTNESS row go first (newest operators at
# the very head); queries with green rows from earlier rounds rotate to
# the tail (they stay covered by the identical local oracle comparison in
# tests/test_queries.py).
#
# Round-10 window: the 17 pipeline12 gates (pre-authored + pre-verified
# at three SFs in late round 9, never driver-checked) go first, followed
# by plan-changed re-checks (markov-attribution rewrite; add_files bloom
# sizing + per-file schema guard per ADVICE_r09).  The 38 round-9 head
# rows are all green in CORRECTNESS_r09 (49 match + 1 rows-only-by-
# design) and rotate to the tail; remaining slots re-confirm the oldest
# (r5-era) green rows.
# ROUND-11 RULE: rotate the round-10 head rows out FIRST before adding
# new gates; grep plans/ for each new name first (register() shadows
# silently in the REGISTRY dict).
# Late-round-10 addendum: the 30 pipeline14 gates registered mid-round
# sit right after the 3 plan-changed re-checks, followed by 6 more
# re-checks (metadata views became JVM VALUES LocalRelations — every
# $view consumer re-verified at sf0.01+0.1 locally).
# THIRD-SESSION round-10 addendum: 28 more rows head the window (3
# pipeline15 + 25 pipeline16), each driver-sim verified at
# sf0.001+0.01+0.1 in fresh vanilla processes when authored, and the
# WHOLE 413-gate registry re-swept green at sf0.01 at session close.
# Plan-changed in the third session (re-verified at 3 SFs):
# graph_community_connectivity + graph_leiden_refine (oracles
# re-materialized), sketch_bloom_sliding (tail refactored into
# _bloom_daily_bits/_bloom_sliding_result), events_page_hinkley
# (fold extracted into _ph_fold).
# The must-check block is now ~109 rows; the ~50-row driver sample
# covers the head (this session's 28 + the pipeline12/13 waves) and
# misses the tail ~59 — ROUND 11 MUST first read CORRECTNESS_r10,
# rotate every green row to the tail, and head the rows that missed
# the sample (all locally 3-SF verified regardless).
# The Engine.sql dispatch gained a CREATE TABLE LIKE branch (additive
# early-return; the managed head rows re-exercise Engine.sql), and
# curation_kcenter_coreset (already in the head) re-verified green after
# the _candidate_sims refactor.
WINDOW_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (third-session round-10 pipeline15 wave;
    #    each verified at sf0.001+0.01+0.1 in a fresh vanilla process;
    #    graph_community_connectivity's oracle was re-materialized at
    #    the same time — it sits in the pipeline14 block below) --
    "graph_leiden_refine",
    "curation_quota_sample",
    "managed_clone_materialize",
    # -- never driver-checked (third-session round-10 pipeline16 wave) --
    "events_haar_energy",
    "events_motif_topk",
    "text_textrank_keywords",
    "events_page_hinkley",
    "graph_closeness_centrality",
    "join_bloom_and_prefilter",
    "multimodal_image_histogram",
    "dedup_image_histogram_l1",
    "multimodal_image_gradients",
    "events_stream_page_hinkley",
    "sketch_stream_bloom_sliding",
    "multimodal_audio_tone",
    "events_binseg_changepoints",
    "events_weekly_spectrum",
    "emb_signbit_band_sweep",
    "curation_dedup_aware_sample",
    "managed_cherrypick_audit",
    "events_uplift_deciles",
    "text_boilerplate_ngrams",
    "events_ab_power_mde",
    "graph_assortativity",
    "events_dau_stickiness",
    "sketch_cms_heavy_change",
    "events_stream_dau_stickiness",
    "dedup_image_histogram_emd",
    "events_binseg_trace",
    "events_stickiness_by_type",
    "sketch_stream_cms_heavy_change",
    "events_srm_by_type",
    "text_vocab_overlap_pairs",
    "events_weekday_profile",
    # -- never driver-checked (round-10 pipeline12 wave) --
    "graph_louvain_trace",
    "multimodal_audio_snr",
    "curation_contamination_by_source",
    "managed_branch_rewrite",
    "text_rouge_overlap",
    "events_poisson_rate_ci",
    "dedup_ahash_hamming_pairs",
    "events_stream_cuped",
    "sketch_bloom_sliding",
    "managed_partitions_skew",
    "multimodal_image_dhash",
    "dedup_image_tier_eval",
    "managed_stream_add_files",
    "events_cuped_binary",
    "events_sequential_ab",
    "text_tokenizer_fertility",
    "text_rouge_by_source",
    # -- never driver-checked (round-10 pipeline13 wave) --
    "managed_add_files_hive_import",
    "managed_merge_cdc_ops",
    "managed_lineage_export",
    "graph_louvain_converge",
    "multimodal_image_phash",
    "dedup_image_phash_tier",
    "events_cuped_stratified",
    "events_lan_demets_ab",
    "managed_msck_repair",
    "dedup_phash_hamming_pairs",
    "events_srm_check",
    "events_bayesian_ab",
    "graph_louvain_coarsen",
    "curation_kcenter_coreset",
    "managed_branch_compare",
    "sketch_hll_intersection",
    "events_stream_srm",
    "graph_louvain_level2",
    "text_rake_keyphrases",
    # -- plan changed in round 10 (markov attribution: bounded-collect
    #    absorption loop replaces the per-step job loop; add_files:
    #    table bloom sizing + per-file footer schema guard) — re-check --
    "events_markov_attribution",
    "managed_add_files_import",
    "events_hill_tail_index",
    # -- never driver-checked (late-round-10 pipeline14 wave) --
    "managed_clone_table",
    "managed_expire_safety_audit",
    "multimodal_image_phash_dihedral",
    "dedup_phash_dihedral_tier",
    "multimodal_video_scene_cuts",
    "graph_modularity_trace",
    "events_cuped_sequential",
    "graph_louvain_weighted_converge",
    "events_sequential_stratified",
    "sketch_hll_jaccard_sweep",
    "events_stream_bayesian_ab",
    "dedup_rake_containment",
    "events_mann_kendall_trend",
    "multimodal_audio_clipping",
    "curation_kcenter_coverage",
    "events_cusum_split",
    "events_stream_mann_kendall",
    "emb_knn_graph_degree",
    "curation_source_quota",
    "emb_pq_distortion_by_m",
    "managed_show_partitions",
    "text_rake_source_profile",
    "multimodal_video_neardup",
    "sketch_bloom_and_intersection",
    "events_holt_winters",
    "dedup_image_pipeline",
    "events_srm_sequential",
    "events_stream_holt_winters",
    "graph_community_connectivity",
    "multimodal_shot_dedup",
    # -- plan changed late round 10: metadata views now emit JVM
    #    VALUES LocalRelations (joinable without Python-runner
    #    nested-loop storms) — every $view consumer re-checks --
    "managed_snapshot_diff",
    "managed_delete_files_audit",
    "managed_all_files_audit",
    "managed_snapshot_totals",
    "managed_branch_expiry",
    "managed_ref_retention",
    # -- oldest green rows (last driver-checked round 5) re-confirm --
    "text_idf_novelty",
    "sketch_linear_counting",
    "text_ngram_lm_perplexity",
    "emb_cluster_balance",
    "text_dedup_cascade",
    "events_interarrival_gaps",
    "emb_ivf_pq_topk",
    "events_cep_pattern",
    "events_funnel_time_to_convert",
    "curation_shard_packing",
    "agg_ks_drift",
    "graph_kcore_trace",
    "events_benford_digits",
    "events_session_windows",
    "events_resample_ohlc",
    "events_hopping_windows",
    "text_winnowing_fingerprints",
    "text_winnowing_neardup_pairs",
    "text_heavy_hitters",
    "text_bm25_scores",
    "text_repetition_signals",
    "pipeline_end_to_end",
    "sketch_kmv_distinct",
    "window_range_frame",
    "window_ntile_dist",
    "window_first_last_nth",
    "join_lateral_topn",
    "agg_regression_stats",
    "recursive_month_spine",
    "recursive_key_chain",
    "fn_date_trunc_ops",
    "fn_map_ops",
    "fn_string_ops2",
    "dedup_span_overlap",
    "text_domain_mix_report",
    "managed_rewrite_predicate_dv",
    "events_asof_nearest",
    "agg_weighted_quantiles",
    "text_minhash_containment",
    "join_skew_salted",
    "emb_matryoshka_recall",
    "events_markov_transitions",
    "events_twap_daily",
    "join_interval_overlap",
    "events_stream_attribution_join",
    "datasource_read_pruned",
    "managed_incremental_minhash",
    "events_stream_dedup",
    "events_anomaly_mad",
    "agg_histogram_quantiles",
    "graph_triangle_count",
    "dedup_cluster_canonical",
    "text_sliding_chunks",
    "text_vocab_topn",
    "sketch_hll_registers",
    "sketch_hll_estimate",
    "text_bigram_logprob",
    "basket_brand_lift",
    "events_click_purchase_follow",
    "emb_dimension_stats",
    "dedup_containment_pairs",
    "ann_knn_join",
    "ann_signbit_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_multiprobe_topk",
    "ann_bucket_histogram",
    "emb_neardup_pairs_lsh",
    "dedup_jaccard_dfcap_pairs",
    "dedup_connected_components",
    "dedup_char_shingle_jaccard",
    "dedup_edit_distance_pairs",
    "asof_join_click_purchase",
    "range_join_click_window",
    "multimodal_frame_sample",
    "multimodal_blob_features",
    "events_funnel",
    "events_cohort_retention",
    # -- round-6-green rows (driver-checked green in r6/r7; tail) --
    "events_user_gini",
    "text_zipf_fit",
    "dedup_rate_by_source",
    "events_rfm_segments",
    "sketch_bloom_fpr_audit",
    "events_session_stats",
    "sketch_join_size_estimate",
    "dedup_lsh_band_sweep",
    "multimodal_pixel_stats",
    "curation_train_val_split",
    "text_ttr_richness",
    "events_user_overlap",
    "events_decayed_counts",
    "events_ab_test_ztest",
    "curation_pareto_frontier",
    "events_burst_windows",
    "graph_label_propagation",
    "emb_cov_pairs",
    "emb_quantile_clip_bounds",
    "events_stream_decayed_counts",
    "text_bpe_pair_stats",
    "text_charset_profile",
    "sketch_kmv_intersection",
    "events_pit_feature_join",
    "curation_negative_sampling",
    "emb_int8_quantization_error",
    "dedup_minhash_calibration",
    "events_cusum_changepoint",
    "graph_common_neighbors",
    "text_source_tv_distance",
    "events_forecast_backtest",
    "agg_welch_ttest",
    "text_sentence_stats",
    "dedup_simhash_hamming_pairs",
    "events_stream_kmv_distinct",
    "multimodal_wav_stats",
    "events_rolling_entropy",
    "events_seasonal_decompose",
    "sketch_sliding_distinct",
    "events_autocorrelation",
    "events_holt_smoothing",
    "events_path_conversion",
    "events_stream_cep",
    "emb_pq_codes",
    "join_bloom_prefilter",
    "ann_bruteforce_topk_blas",
    # -- round-8-green rows (all green in CORRECTNESS_r08; tail) --
    "managed_merge_schema_evolution",
    "multimodal_resize_stats",
    "multimodal_feature_real",
    "multimodal_riff_frames",
    "events_stream_cusum",
    "events_stream_bursts",
    "dedup_simhash64_pairs",
    "text_source_js_divergence",
    "curation_reservoir_stratified",
    "multimodal_audio_decimate",
    "events_chi2_independence",
    "text_keyword_topk",
    "emb_pca_power_iteration",
    "multimodal_frame_pixels",
    "events_mann_whitney_u",
    "sketch_ams_f2",
    "graph_bfs_distance",
    "events_survival_km",
    "emb_random_projection_jl",
    "events_bootstrap_ci",
    "curation_quality_funnel",
    "graph_adamic_adar",
    "events_did_uplift",
    "text_heaps_law",
    "sketch_theta_difference",
    "events_cumulative_users",
    "events_stream_cumulative_users",
    "graph_clustering_coefficient",
    "sketch_hll_union",
    "events_spearman_corr",
    "events_ols_trend",
    "text_readability_score",
    "text_simpson_diversity",
    "events_stream_survival_km",
    "managed_mor_merge_cdc",
    "managed_eq_delete_cdc",
    "managed_streaming_eq_upsert",
    "managed_mor_churn_stress",
    "managed_merge_snapshot_sync",
    "multimodal_resize",
    "managed_compaction",
    "managed_tagged_travel",
    "text_lang_confidence",
    "dedup_semantic_centroid_pairs",
    "curation_dp_mixture",
    # -- round-9-green rows (all green in CORRECTNESS_r09; tail) --
    "events_cuped_adjustment",
    "graph_hits_scores",
    "events_bot_regularity",
    "managed_stream_wap",
    "multimodal_image_ahash",
    "curation_temperature_mix",
    "sketch_cms_sliding",
    "agg_winsorized_mean",
    "sketch_stream_hll_sliding",
    "events_stream_psi_drift",
    "multimodal_audio_vad",
    "sketch_hll_sliding",
    "graph_louvain_onelevel",
    "graph_neighbor_jaccard",
    "events_psi_drift",
    "events_stream_theil_sen",
    "curation_facility_location",
    "events_theil_sen",
    "sketch_sample_quantiles",
    "graph_personalized_pagerank",
    "dedup_tier_eval",
    "multimodal_keyframes",
    "curation_mmr_topk",
    "graph_modularity",
    "emb_whitening_audit",
    "text_burstiness",
    "events_gini_trend",
    "sketch_stream_sample_quantiles",
    "curation_importance_weights",
    "agg_trimmed_mean",
    "managed_metadata_count",
    "managed_wap_publish",
    "managed_branch_wap",
)


def load_all() -> None:
    """Import every plan module, then reorder REGISTRY to WINDOW_PRIORITY.

    Names in WINDOW_PRIORITY come first (in that order); everything else
    keeps its registration order after them.  Unknown names in the
    priority list are ignored so the list can name queries before their
    module lands.
    """
    import icebergsql_spark.plans.managed  # noqa: F401
    import icebergsql_spark.plans.curation  # noqa: F401
    import icebergsql_spark.plans.pipeline2  # noqa: F401
    import icebergsql_spark.plans.relational3  # noqa: F401
    import icebergsql_spark.plans.relational4  # noqa: F401
    import icebergsql_spark.plans.pipeline  # noqa: F401
    import icebergsql_spark.plans.relational  # noqa: F401
    import icebergsql_spark.plans.relational2  # noqa: F401
    import icebergsql_spark.plans.tpch  # noqa: F401
    import icebergsql_spark.plans.tpch2  # noqa: F401
    import icebergsql_spark.plans.tpch3  # noqa: F401
    import icebergsql_spark.plans.pipeline3  # noqa: F401
    import icebergsql_spark.plans.pipeline4  # noqa: F401
    import icebergsql_spark.plans.pipeline5  # noqa: F401
    import icebergsql_spark.plans.pipeline6  # noqa: F401
    import icebergsql_spark.plans.pipeline7  # noqa: F401
    import icebergsql_spark.plans.pipeline8  # noqa: F401
    import icebergsql_spark.plans.pipeline9  # noqa: F401
    import icebergsql_spark.plans.pipeline10  # noqa: F401
    import icebergsql_spark.plans.pipeline11  # noqa: F401
    import icebergsql_spark.plans.pipeline12  # noqa: F401
    import icebergsql_spark.plans.pipeline13  # noqa: F401
    import icebergsql_spark.plans.pipeline14  # noqa: F401
    import icebergsql_spark.plans.pipeline15  # noqa: F401
    import icebergsql_spark.plans.pipeline16  # noqa: F401
    import icebergsql_spark.plans.pipeline17  # noqa: F401

    ordered = {
        name: REGISTRY[name] for name in WINDOW_PRIORITY if name in REGISTRY
    }
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)
