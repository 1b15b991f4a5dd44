"""Broadcast-index ceiling + auto-routing for the cosine operators.

The registered cosine queries must never reach an unbounded driver
collect: under the ceiling they run the exact broadcast kernel, beyond it
they route to the LSH-bucketed partitioned index (VERDICT r1 fix #2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators import similarity
from dffoo_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_bruteforce_raises_past_ceiling(emb):
    with pytest.raises(similarity.IndexTooLargeError):
        similarity.cosine_topk_bruteforce(
            emb, "vec_id", "embedding", k=5, max_index_rows=10
        )
    with pytest.raises(similarity.IndexTooLargeError):
        similarity.cosine_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.35, max_index_rows=10
        )


def test_auto_topk_exact_under_ceiling(emb):
    exact = similarity.cosine_topk_bruteforce(emb, "vec_id", "embedding", k=5)
    auto = similarity.cosine_topk_auto(emb, "vec_id", "embedding", k=5)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, exact.collect()))


def test_auto_topk_routes_to_lsh_past_ceiling(emb):
    routed = similarity.cosine_topk_auto(
        emb, "vec_id", "embedding", k=5, max_index_rows=10
    )
    lsh = similarity.lsh_topk(emb, "vec_id", "embedding", k=5)
    assert sorted(map(tuple, routed.collect())) == sorted(map(tuple, lsh.collect()))


def test_auto_neardup_routes_and_verifies(emb):
    exact = similarity.cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=0.35)
    routed = similarity.cosine_neardup_auto(
        emb, "vec_id", "embedding", threshold=0.35, max_index_rows=10
    )
    exact_pairs = {(r.doc_a, r.doc_b): r.cos_sim for r in exact.collect()}
    routed_pairs = {(r.doc_a, r.doc_b): r.cos_sim for r in routed.collect()}
    # LSH candidates are a subset of the exact pairs, with identical sims
    assert set(routed_pairs) <= set(exact_pairs)
    for p, sim in routed_pairs.items():
        assert sim == exact_pairs[p]
    # ordering/dedup invariants
    bad = similarity.lsh_neardup_pairs(emb, "vec_id", "embedding", threshold=0.35)
    assert bad.where(F.col("doc_a") >= F.col("doc_b")).count() == 0
