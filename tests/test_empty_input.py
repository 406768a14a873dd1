"""Empty-input robustness battery.

The driver fixtures are never empty, but a library user's partitions
and incremental slices ARE — and empty input is exactly where engine
behaviors fork (the r6 grouping-sets probe found DuckDB and Spark
disagreeing on zero rows). This battery mirrors every fixture table as
an EMPTY parquet directory with the IDENTICAL schema and runs a
representative query from each major family through it: the contract
is no exception and a well-formed (usually 0-row) result.

Queries whose semantics *define* a non-empty result on empty input are
asserted as such (ungrouped aggregates return exactly one row of
count=0 / NULL sums — SQL semantics, not an accident).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("empty_sf")
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    ):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


# (query name, expected row count on empty input; None = "just no crash,
# any row count is fine" for queries whose empty-input cardinality is an
# engine-semantics question rather than a contract)
_CASES = [
    ("q6", 1),  # ungrouped agg: one row, NULL sum — SQL semantics
    ("q6_count", 1),
    ("q1_pricing_summary", 0),  # grouped agg: no groups
    ("q3_shipping_priority", 0),
    ("filter_predicates", 0),
    ("window_topk_per_group", 0),
    ("events_session_window", 0),
    ("events_asof_join", 0),
    ("events_session_dynamic_gap", 0),
    ("scd2_dimension_build", 0),
    ("dedup_exact", 0),
    ("dedup_minhash_lsh", 0),
    ("text_chunk_overlap", 0),
    ("text_token_stats", 0),
    ("corpus_drift_psi", 0),
    ("corpus_hash_split", 0),
    ("ann_cosine_topk", 0),
    ("ann_pq_codes", 0),
    ("multimodal_image_dhash", 0),
    ("rewrite_binned_range_join", 0),
    ("lakehouse_incremental_agg", 0),
    ("setop_union_all_counts", 0),
    ("join_inner_fact_fact", 0),
    # r7 additions
    ("ann_ivfpq_retrieval", 0),
    ("ann_ivfpq_residual", 0),
    ("ann_ivfpq_index_build", 0),
    ("rewrite_keyed_range_join", 0),
    ("lakehouse_merge_upsert", 0),
    ("dedup_connected_components", 0),
    # late-r9 additions
    ("dedup_simhash_hamming", 0),
    ("search_hybrid_rrf", 0),
    ("search_mmr_diversify", 0),
    ("mining_hard_negatives", 0),
    ("retrieval_eval_metrics", 0),
    ("corpus_token_budget_select", 0),
    ("dedup_rate_estimate", 1),  # ungrouped stats row (0-counts, NULL rates)
    ("corpus_quality_calibrated", 0),
    ("window_groups_frame", 0),
    ("join_interval_overlap", 0),
    ("lakehouse_incremental_join", 0),
    # this-session additions
    ("filter_skyline_2d", 0),
    ("lakehouse_cdc_apply", 0),
    ("events_seasonality_profile", 0),
    ("dedup_cross_source_matrix", 0),
    ("quality_k_anonymity", 0),
    ("events_seasonal_anomaly", 0),
    ("events_attribution_linear", 0),
    ("events_funnel_latency", 1),  # ungrouped agg row (0 count, NULL pcts)
    ("text_zipf_fit", 1),  # ungrouped agg row (0 vocab, NULL slope)
    ("events_rank_migration", 0),
    ("text_pmi_collocations", 0),
    ("agg_hll_intersection", 1),  # ungrouped envelope row
    ("agg_listagg_ordered", 0),
    ("embedding_pca_power_iteration", None),  # NULL-normalized iterate on empty corpus
    ("events_survival_curve", 0),
    ("embedding_threshold_sweep", 0),
    ("agg_benford_digit_audit", 0),
    ("events_autocorrelation", 0),
    ("dedup_minhash_estimator_error", 0),
    ("agg_gini_coefficient", 1),  # ungrouped stats row (0, NULL, NULL)
    ("agg_gini_bucketed", 1),  # ungrouped stats row (NULL, NULL, 0, ...)
    ("agg_percentile_disc", 0),
    ("agg_winsorized_stats", 0),
    ("streaming_seasonal_anomaly", 0),
    ("text_heaps_law_fit", 0),
    ("events_cohort_ltv_curve", 0),
    ("events_sequence_violations", 0),
    ("agg_conversion_wilson_ci", 1),  # ungrouped row (0, 0, NULL CIs)
    ("agg_poisson_bootstrap_ci", 0),  # no identity-replicate group on empty
    ("agg_chi_square_independence", 1),  # ungrouped row (NULL stats, dof 0)
    ("agg_ols_multifeature", 1),  # ungrouped row (0, NULL betas/r2)
    ("dedup_prefix_filter_join", 0),
    ("corpus_quantile_normalize", 0),  # no sources -> no mapping rows
    ("text_rake_keywords", 0),
    ("source_parquet_footer_audit", 4),  # one audit row per int column
    ("matching_fellegi_sunter", 0),  # no histogram -> no calibration rows
    ("matching_edit_distance_profile", 0),  # no parts -> no pairs
    ("quality_dp_noisy_release", 0),
    ("corpus_ngram_novelty", 0),
    ("corpus_chunk_windows", 0),  # no docs -> no chunks
    ("corpus_curriculum_interleave", 0),  # no docs -> empty schedule
    ("events_mann_kendall_trend", 0),  # no events -> no day pairs
    ("profile_key_skew", 0),  # empty tables -> integer-div guards moot, no key rows
    ("embedding_matryoshka_truncation", 0),
    ("profile_equi_depth_histogram", 0),
    ("agg_jackknife_ratio_se", 1),  # ungrouped fold row (0 orders, NULLs)
    ("text_bpe_merge_induction", 0),  # no vocab -> no merges
    ("agg_welch_ttest", 1),  # ungrouped pivot row, all NULLs
    ("events_diff_in_diff", 1),  # ungrouped pivot row (0 events, NULLs)
    ("events_uplift_by_decile", 0),
    ("multimodal_audio_downsample", 0),
    ("lakehouse_deletion_vectors", 1),  # ungrouped verdict row (0s, TRUE)
    ("events_markov_stationary", 0),
    ("agg_rfm_segmentation", 0),
    ("text_vocab_coverage_oov", 0),
    ("corpus_temperature_sampling_plan", 0),
    ("profile_join_cardinality_estimate", 1),  # 0-bucket est x 0 actual
    ("streaming_gdpr_erasure_filter", 0),
    ("embedding_centroid_drift", 0),
    ("agg_generalized_means", 0),
    ("embedding_outlier_mahalanobis", 0),
    ("text_keyness_loglikelihood", 0),
    ("corpus_rendezvous_sharding", 1),  # ungrouped fold row (0 docs)
    ("events_slo_burn_rate", 0),
    ("text_dispersion_gries_dp", 0),
    ("events_incident_mttr_mtbf", 1),  # ungrouped stats row (0, NULLs)
    ("window_peer_benchmark_loo", 0),
    ("lakehouse_clustering_depth", 2),  # one verdict row per layout
    ("window_max_drawdown", 1),  # ungrouped fold row (0 days, NULLs)
    ("events_session_gap_sweep", 0),
    ("scd2_as_of_lookup", 0),
    ("text_cooccurrence_matrix", 0),
    ("window_hampel_filter", 0),
    ("agg_mann_whitney_u", 1),  # ungrouped pivot row (0s, NULL stats)
    ("agg_mwu_bucketed", 1),  # ungrouped fold row (0s, NULL u1/z)
    ("agg_ks_bucketed", 1),  # ungrouped fold rows cross (0s, NULLs)
    ("join_bloom_prune_audit", 1),  # ungrouped audit row (0s, NULL rate)
    ("eval_auc_bucketed", 1),  # ungrouped fold row (0s, NULL auc)
    ("window_ewma_per_key", 0),  # no users -> no rows
    ("corpus_bucket_dedup_cross", 0),  # no docs -> no cross cells
    ("agg_mutual_information", 1),  # ungrouped folds cross (0s, NULLs)
    ("text_jsd_by_source", 0),  # no sources -> no rows
    ("events_sprt_sequential_test", 0),  # no arms -> no rows
    # ADVICE r11: the decile frame LEFT-joins the grid, so all 10
    # decile rows survive empty input (customers_cum=0, NULL share)
    ("agg_lorenz_curve", 10),
    ("agg_spearman_bucketed", 1),  # ungrouped fold row (0, 0, NULL rho)
    ("agg_countmin_heavy_hitters", 0),  # empty vocab -> no hitters
    ("source_python_datasource_sink", 0),  # 4 empty part files round-trip
    ("corpus_ccnet_quality_buckets", 0),  # no docs -> no tertiles
    ("events_holt_smoothing", 0),  # <3 days of series -> filtered out
    ("dedup_canonical_selection", 0),  # no docs -> empty manifest
    ("embedding_jl_projection", 1),  # ungrouped audit row (0 pairs, NULLs)
    ("eval_cluster_ari", 1),  # 1-row cross of empty grid folds, NULLs
    ("text_unigram_lm_perplexity", 1),  # 1x1 cross of empty folds, NULLs
    ("text_bigram_lm_perplexity", 1),  # 1x1x1 cross of empty folds, NULLs
    ("text_trigram_lm_perplexity", 1),  # 1x1x1 cross of empty folds, NULLs
    ("text_kn_bigram_perplexity", 1),  # 1x1x1x1 cross of empty folds, NULLs
    ("events_forecast_backtest", 3),  # one fold row per baseline model
    ("agg_ks_test_two_sample", 0),  # no values -> no (n1,n2) group
    ("lakehouse_write_audit_publish", 5),  # ledger always renders
    ("multimodal_video_fingerprint_dedup", 0),
    ("window_theil_sen_slope", 1),  # ungrouped medians row (0, NULLs)
    ("events_mcnemar_paired_test", 1),  # ungrouped 2x2 row (0s, NULL)
    ("text_langid_cohen_kappa", 1),  # ungrouped fold row (0, NULLs)
    ("agg_cochran_armitage_trend", 1),  # ungrouped fold row (0, NULL z)
    ("window_runs_test", 1),  # ungrouped fold row (0 moves, NULL z)
    ("agg_spearman_correlation", 1),  # ungrouped fold row (0, NULL rho)
    ("events_record_breaking_days", 1),  # ungrouped fold row (0, NULLs)
    ("eval_binary_classifier", 0),  # empty bins x metrics row -> 0
    ("dedup_sorted_neighborhood", 0),
    ("dedup_snm_multipass", 0),
    ("agg_theta_sketch_setops", 1),  # 0-count folds x empty-sketch ests
    ("agg_kll_quantile_sketch", 1),  # n=0, NULL quantiles/booleans
    ("events_interval_union", 0),
    ("events_interval_gaps", 0),  # no events -> no spans -> no rows
    ("corpus_priority_sample", 0),
    ("text_dispersion_topk", 0),
    ("agg_hdr_histogram_percentiles", 0),  # empty joins -> no quantile rows
    ("sql_scripting_threshold", 0),  # constant-grouped: zero groups
    ("sql_recursive_hierarchy", 0),  # no customers -> empty recursion
    ("source_python_stream_datasource", 7),  # synthetic source, input-independent
    ("streaming_python_sink", 5),  # synthetic source, input-independent
    ("events_cross_correlation", 0),  # no bounds -> empty day grid
    ("profile_functional_dependencies", 5),  # ungrouped row per candidate
    ("profile_inclusion_dependencies", 4),  # ungrouped row per candidate
    ("agg_benjamini_hochberg_dow", 0),  # empty dow grid -> no tests
    ("sql_session_variables", 2),  # two ungrouped probe rows (0s, NULLs)
    ("lakehouse_vacuum_plan", 0),  # empty ledger -> no status rows
    ("agg_empirical_bayes_rates", 0),  # no users -> no grid rows
    ("udf_iterator_batch_init", 0),  # no docs -> no rows
    ("text_chao1_vocabulary_richness", 0),  # no docs -> no lang rows
    ("events_max_revenue_burst", 0),  # empty day grid -> no burst
    ("join_allen_interval_relations", 0),  # no spans -> no pairs
    ("source_csv_permissive_corrupt", 1),  # ungrouped audit row (0s)
    ("quality_l_diversity", 0),  # empty join -> no classes
    ("events_isotonic_daily_trend", 0),  # empty day grid -> no fit
    # r14 additions
    ("matching_multibyte_edit_distance", 0),  # no parts -> no pairs
    ("source_csv_dropmalformed", None),  # empty text write: engine-
    # semantics question (no files to read back); contract = no crash
    ("join_allen_tolerance_bands", 0),  # no spans -> no pairs
    ("corpus_lincoln_petersen_vocab", 1),  # ungrouped presence fold
    ("events_burstiness_fano", 0),  # empty grid -> no types
    ("join_dynamic_partition_pruning", 0),  # empty dim -> no partitions
    ("events_hurst_rescaled_range", 0),  # empty day grid -> no scales
    # r16 additions
    ("geo_nearest_store", 0),  # empty store dim -> no output rows
    ("corpus_recency_weighted_sample", 0),  # no docs -> no batches
    ("quality_t_closeness", 0),  # empty join -> no classes
    ("agg_contingency_residuals", 0),  # empty join -> no cells
    ("agg_oneway_anova", 1),  # ungrouped pivot: one all-NULL/zero row
]


@pytest.mark.parametrize("name,expected", _CASES)
def test_query_survives_empty_tables(spark, empty_sf_dir, name, expected):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    if expected is not None:
        assert len(rows) == expected, (name, len(rows), rows[:3])
    # schema must still be well-formed (collectable + named columns)
    assert all(c for c in df.columns)
