"""Tests for operators/contamination.py — the explicit-benchmark
contamination operator (the registered query's % 100 proxy is only one
caller; the operator contract is benchmark-as-its-own-DataFrame)."""

from __future__ import annotations

import pytest

from dffoo_data_pipeline_spark.operators.contamination import (
    BenchmarkTooLargeError,
    contamination_overlap,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            # doc 1: 4 tokens -> 2 distinct trigrams, one contaminated
            (1, "the quick brown fox"),
            # doc 2: fully contained in the benchmark doc
            (2, "lazy dogs sleep all day"),
            # doc 3: no overlap at all
            (3, "completely unrelated words here now"),
        ],
        "doc_id bigint, text string",
    )


def _benchmark(spark):
    return spark.createDataFrame(
        [("eval1", "the quick brown cat"), ("eval2", "lazy dogs sleep all day long")],
        "bench_id string, text string",
    )


def test_overlap_against_separate_benchmark_frame(spark):
    out = contamination_overlap(
        _corpus(spark), _benchmark(spark), n=3, max_shingles=None
    ).collect()
    got = {r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_frac) for r in out}
    # doc 1 trigrams: {the quick brown, quick brown fox}; benchmark has
    # {the quick brown, quick brown cat, ...} -> 1 of 2 contaminated
    assert got[1] == (2, 1, 0.5)
    # doc 2: 3 trigrams, all inside "lazy dogs sleep all day long"'s 4
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 0, 0.0)


def test_benchmark_bound_probe_raises(spark):
    with pytest.raises(BenchmarkTooLargeError):
        contamination_overlap(
            _corpus(spark), _benchmark(spark), n=3, max_shingles=2
        )


def test_bound_probe_passes_when_under(spark):
    out = contamination_overlap(
        _corpus(spark), _benchmark(spark), n=3, max_shingles=100
    )
    assert out.count() == 3
