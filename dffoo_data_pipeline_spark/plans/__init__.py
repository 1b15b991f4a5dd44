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

# Round-6 window: finish the never-verified backlog.  The round-5 window
# front-loaded the first ~50 backlog entries (red-row re-verifies, the
# minhash family, the DECIMAL stats/ML family, the graph quartet, the
# showcase set); the 43 entries below are the remainder of the backlog —
# the streaming/events/corpus/profile long tail — and have never had a
# driver CORRECTNESS row.  Positions 44-50 re-front the seven
# highest-risk round-5 entries (the two rows red in r3/r4 whose fixes
# the driver may not yet have confirmed, the two new transactional-sink
# queries, and the measured-recall reports that retroactively justify
# the rows-only ANN/LSH adjudications) so they get a row even if the
# round-5 driver run never landed (no CORRECTNESS_r05.json exists in the
# repo).  Everything else from the round-5 window follows, then
# all_queries() appends the r01-r03-verified queries in module order.
_PRIORITY = [
    # ---- (a) never-verified backlog tail: 43 entries ----
    "embedding_centroid_dist",
    "text_classifier_score",
    "text_compression_ratio",
    "text_langid_confusion",
    "text_cdc_chunks",
    "events_top_paths",
    "orders_monthly_growth",
    "profile_corr_lineitem",
    "text_kwic",
    "streaming_error_rate_alert",
    "events_churned_users",
    "supplier_revenue_pareto",
    "text_char_ngram_profile",
    "events_dau_wau",
    "corpus_zipf_heaps",
    "streaming_quality_gate",
    "streaming_embedding_assign",
    "corpus_bigram_logprob",
    "corpus_duplicate_span_removal",
    "corpus_bpe_learn",
    "corpus_bpe_encode",
    "events_lateness_audit",
    "profile_approx_quantiles_lineitem",
    "orders_open_backlog",
    "corpus_data_card",
    "events_pit_enrich",
    "streaming_pit_enrich",
    "streaming_continuous_rollup",
    "events_gapfill_interpolate",
    "streaming_interval_join_outer",
    "events_hist_quantile_rollup",
    "events_countmin_topk",
    "streaming_countmin_topk",
    "corpus_drift_psi",
    "events_rolling_range",
    "events_ab_wilson",
    "profile_sample_estimate",
    "orders_market_basket",
    "events_kaplan_meier",
    "events_exp_smoothing",
    "events_isotonic_daily_rate",
    "profile_benford_audit",
    "corpus_loo_source_ablation",
    # ---- (b) highest-risk round-5 re-verifies (window edge ~50) ----
    "multimodal_feature_bins",  # new r6: hash-verifiable twin of the feature slot
    "curation_source_caps",  # new r6: skew-safe per-domain cap
    "multimodal_features",
    "pipeline_latest_abilities",
    "streaming_db_exactly_once",
    "pipeline_db_load",
    "dedup_lsh_quality_report",
    "similarity_ann_recall_report",
    "abilities_parse_scaled",
    # ---- (c) remainder of the round-5 window, original priority order ----
    "multimodal_audio_rms",
    "multimodal_image_pixel_stats",
    "dedup_lsh_verified",
    "dedup_incremental_neardup",
    "lineitem_price_regression",
    "text_classifier_train",
    "embedding_kmeans_train",
    "profile_bootstrap_mean",
    "events_ks_test",
    "corpus_chi2_independence",
    "lineitem_regression_cv",
    "lineitem_conformal_interval",
    "graph_pagerank_nations",
    "graph_triangle_count",
    "graph_khop_distances",
    "hierarchy_rollup_closure",
    "text_bm25_topk",
    "dedup_semantic_int8",
    "similarity_pq_topk",
    "curation_leakage_safe_split",
    "linkage_blocked_match",
    "events_sketch_rollup",
    "text_gopher_rules",
    "dedup_prefix_filter_pairs",
    "dedup_duplicate_spans",
    "dedup_pair_evidence",
    "multimodal_phash_neardup",
    "multimodal_audio_segments",
    "curation_k_anonymity",
    "curation_mix_temperature",
    "curation_dp_release",
    "curation_dsir_weights",
    "curation_dsir_resample",
    "curation_epoch_mix",
    "curation_gate_overlap",
    "curation_contrastive_negatives",
    "curation_trainonly_scaler",
    "udaf_trimmed_mean_length",
    "scalar_null_semantics",
    "scalar_variant_extraction",
    "abilities_from_pysource",
    "retrieval_hybrid_rrf",
    "integrity_report",
    "embedding_covariance",
    "embedding_pca_project",
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
