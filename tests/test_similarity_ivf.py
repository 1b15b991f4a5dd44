"""IVF ANN: recall against brute force, and the n_probe recall knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators import similarity
from dffoo_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ivf_recall_vs_bruteforce(spark, emb):
    exact = _pairs(similarity.cosine_topk_bruteforce(emb, "vec_id", "embedding", k=5))
    approx = similarity.ivf_topk(emb, "vec_id", "embedding", k=5, n_cells=8, n_probe=4)
    got = _pairs(approx)
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall  # near-random 64-dim vectors: ANN floor
    # shape invariants: <=k neighbors per query, no self matches
    per_q = approx.groupBy("query_id").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 5
    assert approx.where(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_more_probes_more_recall(spark, emb):
    exact = _pairs(similarity.cosine_topk_bruteforce(emb, "vec_id", "embedding", k=5))
    r = {}
    for probes in (1, 4):
        got = _pairs(
            similarity.ivf_topk(emb, "vec_id", "embedding", k=5, n_cells=8, n_probe=probes)
        )
        r[probes] = len(got & exact) / len(exact)
    assert r[4] >= r[1], r


def test_ann_recall_report_contract(spark, sf_dir):
    """The self-audit query must cover every corpus vector for every
    method and report recalls in [0, 1] with p10 <= mean."""
    import duckdb

    from dffoo_data_pipeline_spark.plans.llm_ops import similarity_ann_recall_report

    n_vecs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    rows = {r.method: r for r in similarity_ann_recall_report(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert r.n_queries == n_vecs  # left join keeps empty-bucket queries
        assert 0 <= r.min_recall <= r.p10_recall <= r.mean_recall <= 1
        assert r.k == 5
