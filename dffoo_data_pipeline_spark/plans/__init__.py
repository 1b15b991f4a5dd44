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

# Round-8 window.  After seven rounds every §2 component is implemented
# and 243/249 queries have a driver row; this rotation (a) certifies the
# last 6 never-driver-checked queries (the round-7 portable-hash family,
# registered after the r7 window froze), (b) re-certifies the 3 queries
# whose driver row is a stale `no_oracle` from before their oracle
# upgrade, (c) certifies this round's 2 NEW queries (the sampled
# prefix-filter audit and the IVF recall report), and (d) spends the
# window's remaining ~39 slots re-certifying the STALEST green rows —
# r01-verified relational queries, five rounds of refactors ago — so no
# green row's evidence predates the current code.  Everything previously
# verified follows in module order via all_queries()'s tail append, so
# its existing green row stands.
_PRIORITY = [
    # ---- (a) never driver-checked: round-7 portable-hash family ----
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "dedup_incremental_portable",
    "streaming_neardup_probe",
    "dedup_portable_quality_report",
    "similarity_lsh_recall_report",
    # ---- (b) stale no_oracle rows predating their oracle upgrade ----
    "abilities_parse_scaled",
    "multimodal_audio_rms",
    "multimodal_image_pixel_stats",
    # ---- (c) new this round ----
    "dedup_prefix_filter_sampled",
    "similarity_ivf_recall_report",
    "similarity_lsh_multiprobe_topk",
    "similarity_lsh_multiprobe_recall_report",
    "dedup_incremental_indexed",
    # ---- (d) drift re-certification: stalest r01 green rows, registry
    # order (their code has been refactored across r02-r08; a fresh green
    # row proves the CURRENT code passes, not round-1 code) ----
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scan_filter_pushdown",
    "typed_projection",
    "derived_columns",
    "regex_line_gates",
    "join_broadcast_correction",
    "join_semi",
    "join_anti_skip_parsed",
    "join_outer_full",
    "join_range_buckets",
    "join_asof_last_click",
    "window_rank_top_orders",
    "window_lead_lag_gap",
    "window_rolling_frame",
    "sort_global_topk",
    "agg_rollup_date",
    "agg_cube_flags",
    "agg_count_distinct",
    "set_union_distinct_routing",
    "set_intersect_except",
    "explode_row_split",
    "scalar_string_functions",
    "scalar_date_functions",
    "scalar_math_case_ladder",
    "scalar_json_extraction",
    "array_functions_agg",
    "agg_salted_hot_keys",
    "agg_skew_safe_count_distinct",
    "subquery_small_qty_revenue",
    "subquery_exists_open_orders",
    "window_range_frame_trailing_hour",
    "agg_pivot_status",
    "agg_grouping_sets",
    "q6_forecast_revenue",
    # ---- (e) past the ~50-entry window edge: late round-8 addition
    # (locally oracle-green; first in line for the r9 window) ----
    "similarity_lsh_recall_sampled",
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
