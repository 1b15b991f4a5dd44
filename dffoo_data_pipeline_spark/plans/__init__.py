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

# Round-11 window (50 slots + 24 overflow).  The r10 window came back
# 50/50 green (third consecutive).  This rotation, per the r10 verdict:
# (a) first-certifies the 4 queries NEW this round — the portable (md5)
# sharded Bloom triple (artifact word-for-word + membership flags +
# end-to-end novel; the router the r10 build deferred) plus the sharded
# prefilter's streaming twin;
# (b) retires the r04 staleness frontier ENTIRELY: all 22 oracled rows
# whose newest green is r04 (curation_e2e_corpus ..
# profile_quantiles_docs_by_lang), in registry order;
# (c) re-certifies the 20 stalest r06 oracled rows in registry order
# (orders_monthly_growth .. pipeline_db_load);
# (d) spends the window's last 4 slots on rows-only freshness checks
# for the stalest no-oracle queries (verdict item 5):
# agg_approx_distinct (no driver row since r01!) and the r04
# minhash/simhash trio — rows-only, but a stable spark_rows under the
# current registry is the only freshness signal these can get.
# Positions 51-74 queue the REMAINING 24 r06 oracled rows (insurance if
# the driver checks past 50; otherwise they are r12's window, leaving
# nothing oracled older than r07 after that round).
# Everything previously verified follows in module order via
# all_queries()'s tail append, so its existing green row stands.
_PRIORITY = [
    # ---- (a) NEW this round: the portable sharded Bloom triple + the
    # sharded prefilter's streaming twin ----
    "dedup_bloom_sharded_portable",
    "dedup_bloom_sharded_portable_flags",
    "dedup_bloom_sharded_portable_novel",
    "streaming_bloom_dedup_sharded",
    # ---- (b) the 22 r04-stale oracled rows, registry order ----
    "curation_e2e_corpus",
    "streaming_dedup_against_ledger",
    "embedding_norm_stats",
    "embedding_nearest_seed",
    "embedding_quantize_int8",
    "similarity_int8_topk",
    "text_chunk_windows",
    "corpus_token_budget",
    "text_tfidf_top_terms",
    "curation_length_outliers",
    "corpus_snapshot_diff",
    "corpus_top_ngrams",
    "text_lang_predict",
    "corpus_source_report",
    "corpus_repeated_unit_removal",
    "dedup_best_survivor",
    "curation_token_budget_fill",
    "text_unigram_logprob",
    "corpus_ppl_buckets",
    "profile_lineitem",
    "profile_quantiles_lineitem",
    "profile_quantiles_docs_by_lang",
    # ---- (c) the 20 stalest r06 oracled rows, registry order ----
    "orders_monthly_growth",
    "supplier_revenue_pareto",
    "orders_open_backlog",
    "orders_market_basket",
    "events_top_paths",
    "events_churned_users",
    "events_dau_wau",
    "events_lateness_audit",
    "events_pit_enrich",
    "events_gapfill_interpolate",
    "events_rolling_range",
    "events_ab_wilson",
    "events_kaplan_meier",
    "events_exp_smoothing",
    "events_isotonic_daily_rate",
    "text_kwic",
    "text_char_ngram_profile",
    "curation_source_caps",
    "pipeline_latest_abilities",
    "pipeline_db_load",
    # ---- (d) rows-only freshness tail (no oracle possible) ----
    "agg_approx_distinct",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    # ---- overflow: remaining 24 r06 rows (r12's window if unreached) --
    "streaming_db_exactly_once",
    "streaming_error_rate_alert",
    "streaming_quality_gate",
    "streaming_embedding_assign",
    "streaming_pit_enrich",
    "streaming_continuous_rollup",
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
