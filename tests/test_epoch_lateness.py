"""Semantics for the epoch-mix planner and the watermark lateness audit."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.curation import MAX_EPOCHS, curation_epoch_mix
from dffoo_data_pipeline_spark.plans.events import (
    LATENESS_DELAYS_S,
    events_lateness_audit,
)


def _priority(source: str) -> int:
    return 10 + int(hashlib.md5(source.encode()).hexdigest()[:8], 16) % 41


def test_epoch_mix_invariants(spark, sf_dir):
    rows = curation_epoch_mix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.planned_tokens <= r.ideal_tokens
        assert r.planned_tokens <= MAX_EPOCHS * r.avail_tokens
        assert 0 <= r.epochs_milli <= MAX_EPOCHS * 1000
        assert r.priority == _priority(r.source)
    # floor division only UNDER-allocates: the idealized grants never
    # exceed the budget of 2x the corpus
    tot = sum(r.avail_tokens for r in rows)
    assert sum(r.ideal_tokens for r in rows) <= 2 * tot


def test_epoch_cap_binds_for_small_high_priority_source(spark, tmp_path_factory):
    # choose source names so the md5-derived priority is known: a tiny
    # high-priority source must be clamped at MAX_EPOCHS, a huge
    # low-priority one must absorb the rest below 1 epoch
    names = {f"s{i}": _priority(f"s{i}") for i in range(50)}
    hi = max(names, key=names.get)
    lo = min(names, key=names.get)
    rows = [(1, "tiny corpus high priority", "en", hi, 0)] + [
        (2 + i, " ".join(["word"] * 40), "en", lo, 0) for i in range(30)
    ]
    d = tmp_path_factory.mktemp("epoch_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    got = {r.source: r for r in curation_epoch_mix(spark, str(d)).collect()}
    assert got[hi].epochs_milli == MAX_EPOCHS * 1000  # clamped exactly at the cap
    assert got[hi].planned_tokens == MAX_EPOCHS * got[hi].avail_tokens
    assert got[hi].ideal_tokens > got[hi].planned_tokens  # the cap actually bound
    assert got[lo].epochs_milli < 1000  # big source runs under one epoch


def test_lateness_audit_monotone_and_bounded(spark, sf_dir):
    rows = {r.delay_s: r for r in events_lateness_audit(spark, sf_dir).collect()}
    assert set(rows) == set(LATENESS_DELAYS_S)
    ordered = [rows[d] for d in sorted(rows)]
    for a, b in zip(ordered, ordered[1:]):
        assert a.n_late >= b.n_late  # larger delay can only drop fewer events
    for r in ordered:
        assert 0 <= r.late_frac <= 1


@pytest.mark.parametrize("sf01", ["/root/testdata/sf0.01"])
def test_lateness_audit_detects_simulated_disorder(spark, sf01):
    # at sf0.01 the 2h jitter over 8 shards must actually create late
    # events — an always-zero audit would be a vacuous operator
    rows = {r.delay_s: r for r in events_lateness_audit(spark, sf01).collect()}
    assert rows[0].n_late > 0
    assert rows[max(LATENESS_DELAYS_S)].n_late < rows[0].n_late
