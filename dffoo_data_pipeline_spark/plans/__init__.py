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

# Round-12 window (50 slots + overflow).  The r11 window came back all
# green (fourth consecutive).  This rotation, per the r11 verdict:
# (a) first-certifies the 5 queries NEW this round — the quarantine /
# dead-letter gate family (operators/quality.py: per-rule violation
# report over lineitem with referential checks, per-row verdicts over
# orders, the streaming ingest gate, the embeddings vector-domain gate
# that enforces the finite-component contract, and the documents
# corpus-domain gate incl. the oversize rule);
# (b) RE-CERTIFIES every query whose semantics changed in the r12
# hostile-input packages (NULL user/ts/value + duplicate-timestamp
# total order on events; NULL-key rank/concat/map/count-distinct
# parity on the relational tables — all spelled identically in both
# engines) plus the de-trivialized events_kaplan_meier (1-day censor
# horizon; it had been vacuously green on 0 = 0 rows since r06) — 21
# queries, three of which (streaming error-rate/pit/rollup) were also
# r06-stale (the 8 relational-fix queries are certified fresh r08-r11
# and re-verified locally; they queue behind the staleness frontier);
# (c) retires the r06 oracled staleness frontier ENTIRELY: the
# remaining 21 r06 rows, in registry order;
# (d) spends the last 5 slots on rows-only freshness for the stalest
# r06 no-oracle entries (6 rounds stale).
# Overflow queues the remaining r06/r07 rows-only entries, the 8
# relational-fix re-certs, then the 45 r07-stale oracled rows in
# registry order — r13's window base.
# Everything previously verified follows in module order via
# all_queries()'s tail append, so its existing green row stands.
_PRIORITY = [
    # ---- (a) NEW this round: the quarantine / dead-letter gate ----
    "lineitem_quarantine_report",
    "orders_quarantine_verdicts",
    "streaming_quarantine_gate",
    "embeddings_quarantine_report",
    "documents_quarantine_report",
    # ---- (b) r12 hostile-events-fix re-certs + kaplan_meier ----
    "events_sessionization",
    "events_type_transitions",
    "events_top_paths",
    "events_dau_wau",
    "scd2_user_tier",
    "events_pit_enrich",
    "events_exp_smoothing",
    "events_isotonic_daily_rate",
    "events_gapfill_interpolate",
    "events_kaplan_meier",
    "window_lead_lag_gap",
    "window_rolling_frame",
    "join_asof_generic",
    "join_asof_last_click",
    "streaming_tumbling_hourly",
    "streaming_session_window",
    "streaming_custom_sessionizer",
    "streaming_stateful_user_totals",
    "streaming_error_rate_alert",
    "streaming_pit_enrich",
    "streaming_continuous_rollup",
    # ---- (b) the remaining 21 r06-stale oracled rows, registry order --
    "streaming_db_exactly_once",
    "streaming_quality_gate",
    "streaming_embedding_assign",
    "streaming_interval_join_outer",
    "streaming_countmin_topk",
    "multimodal_feature_bins",
    "embedding_centroid_dist",
    "corpus_zipf_heaps",
    "corpus_bigram_logprob",
    "corpus_data_card",
    "text_langid_confusion",
    "corpus_drift_psi",
    "corpus_loo_source_ablation",
    "profile_corr_lineitem",
    "profile_sample_estimate",
    "profile_benford_audit",
    "corpus_duplicate_span_removal",
    "text_classifier_score",
    "text_cdc_chunks",
    "events_hist_quantile_rollup",
    "events_countmin_topk",
    # ---- (d) rows-only freshness: the 3 stalest r06 no-oracle rows ----
    "dedup_lsh_quality_report",
    "text_compression_ratio",
    "multimodal_features",
    # ---- overflow: remaining rows-only freshness, the 8 relational-fix
    # re-certs, then the 45 r07-stale oracled rows in registry order
    # (r13's window base) ----
    "corpus_bpe_learn",
    "corpus_bpe_encode",
    "profile_approx_quantiles_lineitem",
    "dedup_incremental_neardup",
    "embedding_pca_project",
    "events_sketch_rollup",
    "similarity_ann_recall_report",
    "agg_skew_safe_count_distinct",
    "skew_heavy_hitter_report",
    "window_rank_top_orders",
    "scalar_string_functions",
    "scalar_map_functions",
    "orders_market_basket",
    "abilities_parse_scaled",
    # (scalar_null_semantics, also relational-fixed, sits in the r07
    # block below)
    "scalar_variant_extraction",
    "integrity_report",
    "scalar_null_semantics",
    "events_ks_test",
    "dedup_prefix_filter_pairs",
    "text_sequence_packing",
    "similarity_lsh_topk",
    "text_gopher_rules",
    "udaf_trimmed_mean_length",
    "curation_gate_overlap",
    "dedup_lsh_verified",
    "curation_leakage_safe_split",
    "curation_k_anonymity",
    "curation_mix_temperature",
    "curation_dp_release",
    "curation_epoch_mix",
    "curation_contrastive_negatives",
    "curation_trainonly_scaler",
    "abilities_from_pysource",
    "multimodal_phash_neardup",
    "multimodal_audio_segments",
    "dedup_semantic_int8",
    "similarity_pq_topk",
    "embedding_kmeans_train",
    "embedding_covariance",
    "corpus_chi2_independence",
    "lineitem_price_regression",
    "lineitem_conformal_interval",
    "lineitem_regression_cv",
    "profile_bootstrap_mean",
    "dedup_duplicate_spans",
    "curation_dsir_weights",
    "curation_dsir_resample",
    "dedup_pair_evidence",
    "text_bm25_topk",
    "retrieval_hybrid_rrf",
    "text_classifier_train",
    "graph_pagerank_nations",
    "graph_triangle_count",
    "hierarchy_rollup_closure",
    "graph_khop_distances",
    "linkage_blocked_match",
    "bt_labeling_corrections",
    "abilities_followups_enriched",
    "abilities_effective_cap",
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
        manual_tables,
        profile,
        quality,
        relational,
        retrieval,
        selection,
    )

    merged_q: dict = {}
    merged_o: dict = {}
    for mod in (relational, flagship, events, llm_ops, curation, abilities, bt_ha, job, streaming, multimodal, embeddings, corpus, profile, selection, retrieval, linkgraph, linkage, manual_tables, quality):
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
