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

# Round-9 window (50 slots).  The r8 window came back 50/50 green, so the
# only remaining map work is drift re-certification.  This rotation:
# (a) certifies the 1 never-driver-checked query (registered past the r8
# window edge), (b) re-certifies the 3 queries whose registered plan or
# operator CHANGED this round (the sampled prefix-filter audit's widened
# md5 cutoff "1000"→"4000" so its green row evidences a non-empty result,
# and the two int-ANN queries whose global merge now orders on the
# kernel's exact rank key — r8 ADVICE), and (c) spends the remaining 46
# slots on the STALEST green rows in registry order — all 13 r01
# leftovers plus the first 33 of the 48 r02 rows; the 15 r02 overflow
# (abilities_full_pipeline .. multimodal_modality_zscore) roll to the r10
# window, which closes drift re-certification entirely.  Everything
# previously verified follows in module order via all_queries()'s tail
# append, so its existing green row stands.  The 14 queries NEW this
# round (similarity_lsh_probe_topk, streaming_ann_probe,
# dedup_prefix_filter_rotated, similarity_lsh_probe_recall_report,
# similarity_lsh_probe_indexed, dedup_bloom_prefilter_novel,
# similarity_pq_rerank_topk, similarity_ivfpq_topk,
# streaming_bloom_dedup, similarity_ivfpq_recall_report,
# pipeline_ingest_day, streaming_ingest_day,
# similarity_ivfpq_rerank_topk, similarity_ivfpq_rerank_recall_report
# — all locally
# oracle-green) register past
# the window edge in the tail and queue for r10 alongside the overflow.
_PRIORITY = [
    # ---- (a) never driver-checked: late round-8 addition ----
    "similarity_lsh_recall_sampled",
    # ---- (b) changed this round: plan widened / merge-key fix ----
    "dedup_prefix_filter_sampled",
    "similarity_lsh_multiprobe_topk",
    "similarity_ivf_topk",
    # ---- (c) drift re-certification: 13 r01 + 33 r02 stalest green
    # rows, registry order (code refactored across up to 7 rounds since
    # their only driver row; a fresh green row proves the CURRENT code) --
    "q12_shipmode_priority",
    "q14_promo_revenue_ratio",
    "window_distribution_analytics",
    "agg_exact_percentiles",
    "text_edit_distance_pairs",
    "q2_min_cost_supplier",
    "q10_returned_item_reporting",
    "scalar_map_functions",
    "join_asof_generic",
    "q18_large_volume_customer",
    "q19_disjunctive_predicates",
    "scalar_variant_json",
    "q13_customer_order_distribution",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "q15_top_supplier_view",
    "q16_not_in_suppliers",
    "q4_order_priority_check",
    "q7_nation_volume_shipping",
    "q11_important_stock",
    "q8_market_share",
    "q9_product_type_profit",
    "q17_small_quantity_revenue",
    "q20_dominant_supplier",
    "events_tumbling_hourly",
    "events_sliding_window",
    "dedup_exact_groups",
    "dedup_exact_keep_first",
    "doc_fingerprint",
    "text_token_stats",
    "text_quality_score",
    "text_bpe_token_stats",
    "text_lang_signal",
    "text_repetition_signals",
    "text_sentences_udtf",
    "dedup_ngram_jaccard_pairs",
    "dedup_near_dup_survivors",
    "dedup_connected_clusters",
    "similarity_cosine_topk",
    "dedup_embedding_cosine",
    "curation_sample_stratified",
    "curation_weighted_mix",
    "curation_pii_redaction",
    "curation_funnel",
    "abilities_parse",
    "abilities_attributes",
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
