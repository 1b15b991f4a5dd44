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

# Round-13 window (50 slots + overflow).  The r12 window came back all
# green (47 oracled PASS + 3 rows-only, CORRECTNESS_r12.json).  This
# rotation, per the r12 verdict item 9 (keep the rotation running; the
# r07-stale oracled rows are next):
# (a) first-certifies the 1 query NEW this round — similarity_pq_indexed,
# the PQ persisted-codes steady-state path (r12 verdict item 6; same
# oracle as similarity_pq_topk, so the driver value-checks that
# persisting the codes changes nothing);
# (b) promotes the r12 overflow queue IN ORDER: the remaining rows-only
# freshness entries, the 8 relational-fix re-certs, then the r07-stale
# oracled rows in registry order.
# The last 10 overflow entries queue as r14's window base.  Everything
# previously verified follows in module order via all_queries()'s tail
# append, so its existing green row stands.
_PRIORITY = [
    # ---- (a) NEW this round: the PQ persisted-codes path ----
    "similarity_pq_indexed",
    # ---- (b) the r12 overflow queue, promoted in order ----
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
