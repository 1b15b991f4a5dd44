#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced through the `noop` sink (full execution, no driver
collect) — the number measures the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dffoo_data_pipeline_spark.plans import all_queries  # noqa: E402
from dffoo_data_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: one per major operator family (SURVEY.md §2).
HEADLINE = [
    "flagship_pricing_under_cap",  # classification + agg + broadcast fix + explode
    "q1_pricing_summary",          # wide conditional aggregation
    "q3_shipping_priority",        # multi-join + top-k
    "q5_local_supplier_volume",    # star join
    "window_rank_top_orders",      # window functions
    "join_asof_last_click",        # as-of via ordered window
    "events_sessionization",       # gap sessionization
    "events_sliding_window",       # overlapping event-time windows
    "dedup_exact_groups",          # content-hash dedup
    "dedup_minhash_lsh",           # MinHash-LSH near-dup candidates
    "similarity_cosine_topk",      # brute-force ANN baseline
    "text_quality_score",          # text analysis battery
    "text_bpe_token_stats",        # regex pre-tokenizer counting
    "multimodal_frame_sample",     # binary frame sampling (JVM)
    "multimodal_features",         # Arrow-batched byte features
    "agg_salted_hot_keys",         # two-phase skew-safe aggregation
    "abilities_parse_scaled",      # flagship parse at ~1.4M lines
]

# round-1/2 comparable set ends above; round-3 additions below (the
# legacy subtotal is reported separately so cross-round comparison of
# the original 17 stays apples-to-apples)
_N_LEGACY = len(HEADLINE)
HEADLINE += [
    "text_tfidf_top_terms",          # tf/df shuffles + vocab join + top-k
    "corpus_repeated_unit_removal",  # count + anti-ish join + ordered reassembly
    "text_unigram_logprob",          # vocab build + tf-weighted join + DECIMAL agg
    "curation_e2e_corpus",           # score→gate→dedup→length-gate→split, one plan
    "similarity_int8_topk",          # quantized-index ANN scoring
    "dedup_semantic_int8",           # SemDeDup: cluster-bucketed int8 pair test
    "curation_leakage_safe_split",   # pair graph → subgraph CC → cluster-hash split
    "dedup_duplicate_spans",         # stride-1 window-hash suffix-array relaxation
    "curation_dsir_resample",        # hashed-unigram LM weights + Gumbel top-k
    "text_bm25_topk",                # inverted-index stats + broadcast query probe
    "graph_pagerank_nations",        # iterative integer PageRank over q7-shaped join
    "text_classifier_score",         # hashed features + broadcast weight dim
    "text_cdc_chunks",               # content-defined chunking (window hash + islands)
    "events_gapfill_interpolate",    # time-grid densify + LOCF/linear fill
    "retrieval_hybrid_rrf",          # sparse+dense fusion (RRF) per seed doc
    "graph_triangle_count",          # oriented 2-path + closing-edge join
    "hierarchy_rollup_closure",      # unrolled recursive-CTE subtree rollup
    "linkage_blocked_match",         # blocked fuzzy record linkage
    "events_sketch_rollup",          # mergeable HLL distinct rollup
    "similarity_pq_topk",            # product-quantization ADC ANN
    "events_hist_quantile_rollup",   # mergeable histogram quantiles
    "dedup_prefix_filter_pairs",     # lossless prefix-filtered all-pairs
]

# round-9+ additions: measured and reported per-query + as their own
# subtotal (`additions_total`), EXCLUDED from value/median_total/
# value_idle so those stay comparable with rounds 3-8 (same rationale
# as legacy17_total; the emitted `comparable_queries` list is the
# authoritative comparable set)
_N_COMPARABLE = len(HEADLINE)
HEADLINE += [
    "dedup_bloom_prefilter_novel",   # broadcast-Bloom prefiltered ledger anti-join
    "similarity_pq_rerank_topk",     # PQ ADC shortlist + exact float rerank
    "similarity_ivfpq_topk",         # coarse-cell-bounded ADC (IVFADC)
    "pipeline_ingest_day",           # bloom -> gopher -> band-probe E2E
    # round-10: the remaining ANN routing-table paths, benched so the
    # README recall/cost frontier cites one measured number per path
    "similarity_lsh_topk",           # single-probe int-LSH (cheapest linear path)
    "similarity_lsh_multiprobe_topk",  # +2 bit-flip probes (2x recall)
    "similarity_ivf_topk",           # seeded IVF (best oracled recall)
    "similarity_lsh_probe_topk",     # asymmetric search(queries, index)
    "similarity_ivfpq_rerank_topk",  # IVFADC+R full stack
    # round-11: the sharded Bloom prefilter, both hash families — the
    # pair measures the portability premium (md5 routing+positions vs
    # JVM xxhash64) for the past-the-broadcast-ceiling ledger shape
    "dedup_bloom_sharded_novel",     # xx64 sharded bloom ledger anti-join
    "dedup_bloom_sharded_portable_novel",  # md5 (cross-engine) sharded bloom
    # round-12: the quarantine / dead-letter gate family — the rule
    # battery's map-side cost and the presence-join shapes (2 broadcast
    # + 1 fact-fact shuffle) are what the numbers certify
    "lineitem_quarantine_report",    # 11-rule battery + 3 referential joins
    "orders_quarantine_verdicts",    # per-row verdicts, corpus-wide
    "streaming_quarantine_gate",     # the battery as an ingest stream gate
    "embeddings_quarantine_report",  # vector finite-domain gate (HOFs, no UDF)
    "documents_quarantine_report",   # corpus-domain gate incl. oversize rule
    # round-13: the PQ persisted-codes steady-state path (r12 verdict
    # item 6) — same output/oracle as similarity_pq_topk, but the
    # codebook + codes are built and PERSISTED in-query and the probe
    # scans `embeddings` exactly once; the number certifies the
    # build+probe cost against the 3-scan in-query sibling above
    "similarity_pq_indexed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    # SPARK_GRAFT_BENCH_SKIP (comma-separated names): for LOCAL
    # measurement runs at foreign scale factors ONLY — e.g. the r13 sf1
    # ranking runs, where the bloom family's fixed in-query bitmap
    # capacity (pinned by its sf0.01 oracle) saturates on a 10× ledger
    # and its loud assert_true guard aborts the whole bench process (by
    # design: a saturated prefilter prunes nothing).  Unset — the
    # driver's case — behavior is byte-identical to r12: every HEADLINE
    # query runs.  Skipped names are recorded in the artifact.
    skip = {s for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if s}
    headline = [n for n in HEADLINE if n not in skip]
    n_comparable = len([n for n in HEADLINE[:_N_COMPARABLE] if n not in skip])
    n_legacy = len([n for n in HEADLINE[:_N_LEGACY] if n not in skip])
    spark = get_spark("bench")
    queries, _ = all_queries()

    # warm the JVM + file listings once so query timings measure the
    # engine, not session startup
    from dffoo_data_pipeline_spark.sources.readers import load_table

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # pre-fork the Python UDF workers (one-time per-executor cost, not an
    # engine cost) with a trivial Arrow round-trip
    import pandas as _pd

    spark.range(64).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.mode("overwrite").format("noop").save()

    # Timed executions per query; report BOTH min and median.  The warm
    # pass absorbs JIT/codegen compilation; the min is the steady-state
    # engine number (what scales to a long-lived cluster), and
    # min-vs-median spread is the noise diagnostic.
    #
    # Co-tenancy-proofing (round-6 lesson: the driver box showed 2-4.7×
    # per-query inflation that did not reproduce in isolation):
    #   1. Reps are INTERLEAVED round-robin across queries — a noisy host
    #      window spreads over every query's sample set instead of
    #      concentrating on whichever query was running back-to-back.
    #   2. loadavg is recorded around every rep, so a hot host is visible
    #      IN the artifact instead of being inferred afterwards.
    #   3. Queries whose best time is still >= 2 s get extra interleaved
    #      reps — the slow tail is where one bad rep distorts the min.
    #   4. A PAIRED-HOT tail: two consecutive reps per query after the
    #      interleaved rounds.  Interleaving alone inflates min-of-N
    #      ~20-50% (measured round 7: 38 queries round-robin evict each
    #      other's JIT/code-cache/arrow-worker warmth, cdc_chunks 0.96s
    #      hot → 1.57s interleaved with plans unchanged), which would
    #      read as a fake round-over-round regression.  The second rep
    #      of a back-to-back pair restores same-query adjacency, so the
    #      reported min stays the steady-state engine floor (what a
    #      long-lived cluster sees) while the interleaved samples keep
    #      the co-tenancy defense.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    extra_slow_reps = int(os.environ.get("SPARK_GRAFT_BENCH_SLOW_REPS", "2"))
    hot_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_HOT_PAIRS", "1"))

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        # plan construction INSIDE the timer: queries that eagerly
        # materialize a sub-result (localCheckpoint in the iterative
        # ops) do real work at construction — timing only the final
        # write under-reports them (leakage split measured 0.02s
        # with construction untimed vs ~3s honest)
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    runs: dict[str, list[float]] = {n: [] for n in headline}
    loads: list[float] = []
    # execution-order (query, elapsed, loadavg_before, ext_busy_before)
    # quadruples: lets a reader correlate an individual slow rep with a
    # co-tenant load spike directly from the artifact, without re-running
    rep_trace: list[tuple[str, float, float, float]] = []

    def ext_busy(window: float = 0.15) -> float:
        """Fraction of machine CPU busy during a brief window in which
        THIS process tree sleeps — a direct external-contention gauge.
        loadavg cannot separate the bench's own local[32] load from
        co-tenants (measured r8: even an idle-host run floats loadavg
        1.6-15 as reps accumulate, so a loadavg<2 gate covers only 17/39
        queries); between reps the only busy CPU is other tenants' (plus
        a few % of idle-JVM background), so this gate self-normalizes."""

        def snap() -> tuple[int, int]:
            with open("/proc/stat") as fh:
                vals = [int(x) for x in fh.readline().split()[1:]]
            return sum(vals), vals[3] + vals[4]  # total, idle+iowait

        try:
            t0, i0 = snap()
            time.sleep(window)
            t1, i1 = snap()
        except OSError:
            return -1.0  # /proc unavailable: gate disabled, reps still run
        dt = t1 - t0
        return 0.0 if dt <= 0 else 1.0 - (i1 - i0) / dt

    def run_rep(name: str) -> None:
        load = os.getloadavg()[0]
        loads.append(load)
        ext = ext_busy()
        elapsed = timed(name)
        runs[name].append(elapsed)
        rep_trace.append((name, round(elapsed, 3), round(load, 2), round(ext, 3)))

    # The full protocol (interleave -> slow extras -> paired-hot tail)
    # runs PER TIER: the comparable set interleaves only among itself,
    # exactly as it did in rounds 3-9, and the additions tier runs
    # afterwards in its own pass.  Round-10 lesson: growing the additions
    # tier to 9 queries and interleaving it WITH the 39 comparables
    # inflated every comparable floor a uniform ~25% (two runs, ext-busy
    # gate green throughout, untouched plans included) — the r7
    # code-cache/JIT-eviction effect scales with the number of co-
    # interleaved plans, so cross-round floor comparability requires the
    # comparable tier's interleave set to stay fixed, not just its
    # membership.
    for tier in (headline[:n_comparable], headline[n_comparable:]):
        for name in tier:
            queries[name](spark, sf_dir)  # warm: file listing, codegen, UDF fork
        for _ in range(reps):
            for name in tier:
                run_rep(name)
        slow = [n for n in tier if min(runs[n]) >= 2.0]
        for _ in range(extra_slow_reps):
            for name in slow:
                run_rep(name)
        for _ in range(hot_pairs):
            for name in tier:
                run_rep(name)  # re-warm adjacency
                run_rep(name)  # the hot rep
    loads.append(os.getloadavg()[0])

    timings = {n: round(min(r), 3) for n, r in runs.items()}
    medians = {n: round(sorted(r)[len(r) // 2], 3) for n, r in runs.items()}

    # Load-gated floors (r8 verdict ask): per-query min over only the
    # reps that started with no external contention, so round-over-round
    # floor comparisons self-normalize instead of relying on prose
    # adjudication of host noise.  Two gates are derived: ext_busy<0.20
    # (the quiesce-window co-tenant gauge — the usable one) and the
    # literal loadavg<2.0 (kept for the audit trail; self-load makes it
    # under-cover, see ext_busy docstring).  null = no gated rep.
    def gated(pred) -> dict[str, float | None]:
        out: dict[str, float | None] = {}
        for n in headline:
            xs = [t[1] for t in rep_trace if t[0] == n and pred(t)]
            out[n] = round(min(xs), 3) if xs else None
        return out

    queries_idle = gated(lambda t: 0.0 <= t[3] < 0.20)
    idle_vals = [
        v for n, v in queries_idle.items()
        if v is not None and n in headline[:n_comparable]
    ]
    value_idle = round(sum(idle_vals), 3) if idle_vals else None
    idle_loadgate = gated(lambda t: t[2] < 2.0)

    total = round(sum(timings[n] for n in headline[:n_comparable]), 3)
    legacy17 = round(sum(timings[n] for n in headline[:n_legacy]), 3)
    additions = round(sum(timings[n] for n in headline[n_comparable:]), 3)
    result = {
        "metric": "headline_query_wall_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "median_total": round(
            sum(medians[n] for n in headline[:n_comparable]), 3
        ),
        "legacy17_total": legacy17,
        # named r9_additions_total through round 9; the tier now also
        # carries the round-10 ANN-path additions, so the stable name is
        # additions_total (sum over every query NOT in comparable_queries)
        "additions_total": additions,
        # value/median_total/value_idle sum over EXACTLY this subset of
        # `queries` (the cross-round-comparable set; the r9 additions are
        # measured but subtotaled separately) — emitted so a consumer
        # re-deriving the total from `queries` agrees with `value`
        # without reading the comment above HEADLINE (r9 ADVICE)
        "comparable_queries": headline[:n_comparable],
        "reps": reps,
        "sf": sf,
        "loadavg_min": round(min(loads), 2),
        "loadavg_max": round(max(loads), 2),
        "value_idle": value_idle,
        "idle_coverage": [len(idle_vals), n_comparable],
    }
    if skip:
        result["skipped_queries"] = sorted(skip)
    print(json.dumps(result))

    # Complete local artifact (driver BENCH_r{N}.json tails get truncated
    # at 2000 chars): full per-query rep lists + the loadavg trace.
    # Named for SPARK_GRAFT_BENCH_TAG when set (the close-out ritual sets
    # e.g. r10_closeout so the artifact is unambiguous), else for the
    # round inferred from the checked-in driver artifacts — which is
    # WRONG for a close-out run after the driver has already written the
    # current round's CORRECTNESS file (the r9 close-out landed in
    # BENCH_local_r10.json this way; r9 verdict hygiene note).
    try:
        tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
        if tag:
            fname = f"BENCH_local_{tag}.json"
        else:
            nxt = 1 + max(
                (
                    int(p.stem.rsplit("r", 1)[-1])
                    for p in Path(_REPO).glob("CORRECTNESS_r*.json")
                ),
                default=0,
            )
            fname = f"BENCH_local_r{nxt:02d}.json"
        local = dict(
            result,
            queries_runs={n: [round(x, 3) for x in r] for n, r in runs.items()},
            loadavg_trace=[round(x, 2) for x in loads],
            rep_trace=[list(t) for t in rep_trace],
            queries_idle=queries_idle,
            queries_idle_loadgate=idle_loadgate,
        )
        with open(Path(_REPO) / fname, "w") as fh:
            json.dump(local, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout line is still the contract


if __name__ == "__main__":
    main()
