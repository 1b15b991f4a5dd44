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


def test_exact_int_kernel_breaks_boundary_ties_by_id():
    """Exactly-tied ranking keys at the k-boundary (plausible with integer
    dot products, e.g. orthogonal codes -> key 0) must resolve to the
    LOWEST neighbor ids — the oracle's ORDER BY key DESC, neighbor_id —
    regardless of the input row order (ADVICE r7: argpartition picked
    arbitrarily among ties)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from dffoo_data_pipeline_spark.operators.similarity import _exact_cos_topk_kernel

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    # ids deliberately scrambled; vecs 2..5 are all orthogonal to vec 1
    # (key exactly 0.0 — a four-way tie straddling the k=3 boundary)
    rows = [
        (5, [0, 1]), (1, [1, 0]), (3, [0, 1]), (7, [-1, 0]),
        (2, [0, 1]), (6, [1, 0]), (4, [0, 1]),
    ]
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "c": [np.array(r[1], dtype=np.int64) for r in rows],
            "n2": [1] * len(rows),
            "is_probe": [False] * len(rows),
        }
    )
    out = _exact_cos_topk_kernel("vec_id", 3, out_schema)(pdf)
    got_q1 = out[out["query_id"] == 1]["neighbor_id"].tolist()
    # key ranking for query 1: 6 (dot 1), then the 0-ties {2,3,4,5} ->
    # lowest ids 2, 3 fill the remaining two slots; 7 (dot -1) never
    assert got_q1 == [6, 2, 3]
    # and for a tied-at-top query (vec 2): ties {3,4,5} at cos 1.0 plus
    # {1,6,7} at 0/-1; k=3 must take 3, 4, 5 in id order
    got_q2 = out[out["query_id"] == 2]["neighbor_id"].tolist()
    assert got_q2 == [3, 4, 5]


def test_multiprobe_lsh_superset_and_recall_lift(spark):
    """Multi-probe candidates are a strict superset of single-probe ones
    (membership unchanged, query side adds flipped buckets), so recall@k
    vs the exact ranking is monotonically >= — and on the synthetic
    embeddings the 2-flip schedule must deliver a REAL lift, not a tie."""
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.operators import similarity
    from dffoo_data_pipeline_spark.plans.embeddings import int8_codes
    from dffoo_data_pipeline_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    codes = int8_codes(load_table(spark, sf, "embeddings")).localCheckpoint(eager=False)
    single = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk_int(codes, k=5).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_multiprobe_topk_int(codes, k=5, n_flip=2).collect()
    }
    # exact truth: brute-force integer ranking over the same codes
    live = codes.where(F.col("n2") > 0)
    a = live.select(F.col("vec_id").alias("q"), F.col("c").alias("ca"), F.col("n2").alias("na2"))
    b = live.select(F.col("vec_id").alias("n"), F.col("c").alias("cb"), F.col("n2").alias("nb2"))
    d = F.aggregate(F.zip_with("ca", "cb", lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    key = (F.col("d") * F.abs("d")).cast("double") / (F.col("na2") * F.col("nb2")).cast("double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("q").orderBy(F.desc(key), F.col("n"))
    truth = {
        (r.q, r.n)
        for r in a.crossJoin(F.broadcast(b)).where(F.col("q") != F.col("n"))
        .select("q", "n", d.alias("d"), "na2", "nb2")
        .withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)
        .select("q", "n").collect()
    }
    hits_single = len(single & truth)
    hits_multi = len(multi & truth)
    assert hits_multi >= hits_single  # monotone by candidate-superset
    assert hits_multi > hits_single   # and a real lift on this data
    # each emitted per-query list stays capped at k
    from collections import Counter

    assert max(Counter(q for q, _ in multi).values()) <= 5


def test_lsh_probe_asymmetric_contract(spark):
    """search(queries, index) semantics: every emitted query_id comes
    from the QUERY side, every neighbor_id from the INDEX side — a query
    is never ranked into, an index vector never ranks.  The probe's
    candidate set per query is the union of its own bucket and its flip
    buckets' index members, so results agree with the symmetric
    multiprobe ranking restricted to cross-slice pairs is NOT asserted
    (buckets differ per slice); exactness is the DuckDB oracle's job
    (similarity_lsh_probe_topk)."""
    import pytest
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.operators import similarity
    from dffoo_data_pipeline_spark.plans.embeddings import int8_codes
    from dffoo_data_pipeline_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    codes = int8_codes(load_table(spark, sf, "embeddings")).localCheckpoint(
        eager=False
    )
    qcodes = codes.where(F.col("vec_id") % 10 == 0)
    icodes = codes.where(F.col("vec_id") % 10 != 0)
    out = similarity.lsh_probe_topk_int(qcodes, icodes, k=5, n_flip=2).collect()
    assert len(out) > 0
    qids = {r.vec_id for r in qcodes.collect()}
    iids = {r.vec_id for r in icodes.collect()}
    assert {r.query_id for r in out} <= qids
    assert {r.neighbor_id for r in out} <= iids
    # per-query cap at k, ranked descending with id tie-break
    from collections import Counter

    assert max(Counter(r.query_id for r in out).values()) <= 5
    # n_flip=0 is the single-bucket subset: its (q, n) pairs are a
    # subset of the multiprobe candidates' output universe per query
    out0 = similarity.lsh_probe_topk_int(qcodes, icodes, k=50, n_flip=0).collect()
    out_wide = similarity.lsh_probe_topk_int(qcodes, icodes, k=50, n_flip=2).collect()
    assert {(r.query_id, r.neighbor_id) for r in out0} <= {
        (r.query_id, r.neighbor_id) for r in out_wide
    }
    # exactly one of index_codes / indexed
    with pytest.raises(ValueError, match="exactly one"):
        similarity.lsh_probe_topk_int(qcodes, icodes, indexed=icodes)
    with pytest.raises(ValueError, match="exactly one"):
        similarity.lsh_probe_topk_int(qcodes)
