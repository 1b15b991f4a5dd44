"""Query plans — the engine's user-facing query surface.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB-runnable ANSI SQL).  The driver
contract (`__spark_entry__.py`) aggregates them; tests replicate the
driver's DuckDB comparison locally.

Registration order matters: the correctness driver verifies roughly the
first 50 entries of the registry per round.  ``_PRIORITY`` below front-
loads the queries that have not yet earned a driver-green CORRECTNESS row
(round 1 verified registry positions 0-49, i.e. the first 50 relational
queries); everything verified in round 1 is appended afterwards in its
original module order so it stays registered (its green row from r01
stands).  Rotate this list each round until every query has a green row.
"""

from __future__ import annotations

# Round-3 window: the 16 queries with no driver CORRECTNESS row yet
# (the r2 tail + the newly-registered plans/embeddings.py), then the two
# queries whose r2 rows hash-failed on oracle typing (values verified
# identical; oracles fixed this round — re-verify), then any NEW round-3
# queries.  Everything with an existing green row from r01∪r02 is
# appended after _PRIORITY by all_queries() in module order and backfills
# the rest of the ~50-entry driver window.
_PRIORITY = [
    # never driver-executed (13 registered tail + 3 formerly-dead embeddings)
    "embedding_norm_stats",
    "embedding_nearest_seed",
    "embedding_quantize_int8",
    "text_contamination_overlap",
    "curation_split_assign",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "similarity_ivf_topk",
    "similarity_lsh_topk",
    "text_sequence_packing",
    "multimodal_image_pixel_stats",
    "multimodal_audio_rms",
    "multimodal_features",
    "abilities_parse_scaled",
    "pipeline_latest_abilities",
    # r2 hash-fail on oracle typing, oracle fixed this round — re-verify
    "flagship_pricing_under_cap",
    "events_sessionization",
    # -- new round-3 queries (plans/corpus.py and friends) --
    "text_chunk_windows",
    "corpus_token_budget",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "corpus_repeated_unit_removal",
    "profile_lineitem",
    "skew_heavy_hitter_report",
    "dedup_incremental_novel",
    "streaming_dedup_against_ledger",
    "profile_quantiles_lineitem",
    "corpus_source_report",
    "dedup_best_survivor",
    "curation_token_budget_fill",
    "text_lang_predict",
    "profile_quantiles_docs_by_lang",
    "corpus_snapshot_diff",
    "corpus_top_ngrams",
    "events_ordered_funnel",
    "events_cohort_retention",
    "events_type_transitions",
    "curation_length_outliers",
    "events_max_gap",
    "customers_rfm",
    "events_hourly_error_rate",
    "events_anomaly_mad",
    "scd2_user_tier",
    "curation_temporal_split",
    "curation_e2e_corpus",
    "dedup_shingle_containment",
    "similarity_int8_topk",
    "corpus_ppl_buckets",
    "cdc_apply_latest",
    # r4 backlog (registered + locally oracle-green, outside this round's
    # ~50-row driver window): events_top_paths, embedding_centroid_dist,
    # orders_monthly_growth, profile_corr_lineitem, text_kwic,
    # streaming_error_rate_alert, events_churned_users,
    # supplier_revenue_pareto, text_char_ngram_profile, events_dau_wau,
    # text_gopher_rules, dedup_semantic_int8, curation_leakage_safe_split,
    # curation_k_anonymity, curation_mix_temperature, curation_dp_release,
    # multimodal_phash_neardup, corpus_zipf_heaps, streaming_quality_gate,
    # streaming_embedding_assign, udaf_trimmed_mean_length,
    # dedup_duplicate_spans, curation_dsir_weights, curation_dsir_resample,
    # corpus_bigram_logprob, corpus_duplicate_span_removal,
    # text_bm25_topk, text_classifier_score, text_cdc_chunks,
    # graph_pagerank_nations, corpus_bpe_learn, events_lateness_audit,
    # curation_epoch_mix, multimodal_audio_segments,
    # profile_approx_quantiles_lineitem, dedup_incremental_neardup,
    # corpus_bpe_encode, orders_open_backlog, similarity_ann_recall_report,
    # dedup_lsh_quality_report, corpus_data_card, events_pit_enrich,
    # streaming_pit_enrich, text_langid_confusion, curation_gate_overlap,
    # integrity_report, dedup_lsh_verified, streaming_continuous_rollup,
    # events_gapfill_interpolate, retrieval_hybrid_rrf,
    # graph_triangle_count, hierarchy_rollup_closure,
    # scalar_null_semantics, streaming_interval_join_outer,
    # linkage_blocked_match, events_sketch_rollup,
    # similarity_pq_topk, events_hist_quantile_rollup,
    # events_countmin_topk, dedup_prefix_filter_pairs,
    # curation_contrastive_negatives, corpus_drift_psi,
    # events_rolling_range, curation_trainonly_scaler,
    # events_ab_wilson, profile_sample_estimate,
    # abilities_from_pysource, scalar_variant_extraction,
    # text_classifier_train, embedding_kmeans_train,
    # streaming_countmin_topk, lineitem_price_regression,
    # orders_market_basket, events_kaplan_meier,
    # embedding_covariance, embedding_pca_project,
    # events_exp_smoothing, events_isotonic_daily_rate,
    # lineitem_conformal_interval, lineitem_regression_cv,
    # profile_bootstrap_mean, events_ks_test, corpus_chi2_independence,
    # profile_benford_audit, corpus_loo_source_ablation,
    # text_compression_ratio, dedup_pair_evidence, graph_khop_distances
]


def all_queries():
    from dffoo_data_pipeline_spark import multimodal, streaming
    from dffoo_data_pipeline_spark.plans import (
        abilities,
        bt_ha,
        corpus,
        curation,
        embeddings,
        events,
        flagship,
        job,
        linkage,
        linkgraph,
        llm_ops,
        profile,
        relational,
        retrieval,
        selection,
    )

    merged_q: dict = {}
    merged_o: dict = {}
    for mod in (relational, flagship, events, llm_ops, curation, abilities, bt_ha, job, streaming, multimodal, embeddings, corpus, profile, selection, retrieval, linkgraph, linkage):
        merged_q.update(mod.QUERIES)
        merged_o.update(mod.ORACLES)

    q: dict = {}
    o: dict = {}
    for name in _PRIORITY:
        if name in merged_q:  # tolerate renames: stale priority entries are skipped
            q[name] = merged_q[name]
            if name in merged_o:
                o[name] = merged_o[name]
    for name, fn in merged_q.items():  # round-1-verified queries keep their slot at the tail
        if name not in q:
            q[name] = fn
            if name in merged_o:
                o[name] = merged_o[name]
    return q, o
