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

# Round-7 window: the final rotation.  After six rounds, 196 of 240
# registered queries have a driver CORRECTNESS row; the 44 below are the
# complete remainder (registry minus the union of CORRECTNESS_r01-r06
# keys) — all locally oracle-green, never yet inside a driver window.
# They are front-loaded in their original registry order; positions
# 45-50 are reserved for this round's NEW queries (manual-table
# enrichment, effective-cap library, oracle upgrades), appended by their
# defining modules via _ROUND7_NEW below.  Everything previously
# verified follows in module order via all_queries()'s tail append, so
# its green row from earlier rounds stands.
_PRIORITY = [
    # ---- (a) the last 44 never-driver-checked queries ----
    "similarity_ann_recall_report",
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
    # ---- (b) round-7 new queries (window edge ~50): defined in their
    # modules this round, listed here so the driver certifies them now ----
    "abilities_followups_enriched",
    "abilities_effective_cap",
    "bt_labeling_corrections",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "text_sequence_packing",
    # ---- (c) past the ~50-entry window edge: round-7 portable-hash
    # dedup twins (locally oracle-green; first in line for the r8
    # window if the driver stops at 50) ----
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "dedup_incremental_portable",
    "streaming_neardup_probe",
    "dedup_portable_quality_report",
    "similarity_lsh_recall_report",
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
        relational,
        retrieval,
        selection,
    )

    merged_q: dict = {}
    merged_o: dict = {}
    for mod in (relational, flagship, events, llm_ops, curation, abilities, bt_ha, job, streaming, multimodal, embeddings, corpus, profile, selection, retrieval, linkgraph, linkage, manual_tables):
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
