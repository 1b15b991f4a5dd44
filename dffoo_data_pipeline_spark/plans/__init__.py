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

# Queries without a driver CORRECTNESS row yet, most valuable first:
# reference-parity core (flagship/abilities/BT/HA), the remaining TPC-H
# shapes, the oracled LLM-ops surface, events/streaming, multimodal, then
# the rows-only checks that still deserve a driver execution record.
_PRIORITY = [
    "flagship_pricing_under_cap",
    "abilities_parse",
    "abilities_full_pipeline",
    "abilities_attributes",
    "abilities_attribute_list_parity",
    "bt_effects_parse",
    "ha_caps_parse",
    "q4_order_priority_check",
    "q7_nation_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q15_top_supplier_view",
    "q16_not_in_suppliers",
    "q17_small_quantity_revenue",
    "q20_dominant_supplier",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "dedup_exact_groups",
    "dedup_exact_keep_first",
    "doc_fingerprint",
    "text_token_stats",
    "text_quality_score",
    "text_bpe_token_stats",
    "text_lang_signal",
    "text_sentences_udtf",
    "text_repetition_signals",
    "dedup_ngram_jaccard_pairs",
    "dedup_near_dup_survivors",
    "dedup_connected_clusters",
    "similarity_cosine_topk",
    "dedup_embedding_cosine",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_sessionization",
    "streaming_tumbling_hourly",
    "streaming_session_window",
    "streaming_interval_join",
    "streaming_custom_sessionizer",
    "streaming_dedup_events",
    "streaming_stateful_user_totals",
    "streaming_enrich_static",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "multimodal_arrow_byte_len",
    "multimodal_modality_zscore",
    "curation_sample_stratified",
    "curation_weighted_mix",
    "curation_pii_redaction",
    "curation_funnel",
    # -- anything below here is outside a 50-entry driver window;
    #    rotate into the window in later rounds (rows-only checks moved
    #    below in round 2 to make room for new oracled queries; the two
    #    oracled round-2 additions below are first in line for round 3) --
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
]


def all_queries():
    from dffoo_data_pipeline_spark import multimodal, streaming
    from dffoo_data_pipeline_spark.plans import (
        abilities,
        bt_ha,
        curation,
        events,
        flagship,
        job,
        llm_ops,
        relational,
    )

    merged_q: dict = {}
    merged_o: dict = {}
    for mod in (relational, flagship, events, llm_ops, curation, abilities, bt_ha, job, streaming, multimodal):
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
