"""Sequence-packing invariants: budget respected, all docs packed once,
offsets consistent, packing efficiency reasonable."""

from __future__ import annotations

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions import text as TX
from dffoo_data_pipeline_spark.operators.packing import pack_sequences
from dffoo_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

BUDGET = 512


def test_packing_invariants(spark):
    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", TX.token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(d, "doc_id", "n_tokens", budget=BUDGET).cache()

    # every document packed exactly once
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()

    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
        F.max(F.col("offset") + F.col("n_tokens")).alias("end"),
    )
    # no bin over budget (except dedicated oversize-doc bins)
    over = per_bin.join(packed, "bin_id").where(
        (F.col("fill") > BUDGET) & (F.col("n_docs") > 1)
    )
    assert over.count() == 0
    # offsets tile the bin without overlap: max(offset+len) == fill for
    # normal bins
    bad = per_bin.where((F.col("end") != F.col("fill")) & (F.col("n_docs") > 1))
    assert bad.count() == 0

    # efficiency: average fill of multi-doc bins above 70% of budget
    eff = (
        per_bin.where(F.col("n_docs") > 1)
        .agg(F.avg("fill"))
        .collect()[0][0]
    )
    assert eff is None or eff >= 0.7 * BUDGET, eff


def test_packing_properties_random_lengths(spark):
    """Property-style: random length distributions keep the invariants."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(lens=st.lists(st.integers(min_value=1, max_value=700),
                         min_size=1, max_size=200))
    def check(lens):
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
        )
        packed = pack_sequences(df, "doc_id", "n_tokens", budget=BUDGET)
        rows = packed.collect()
        assert len(rows) == len(lens)
        fills: dict = {}
        for r in rows:
            fills.setdefault(r.bin_id, []).append(r)
        for rs in fills.values():
            if len(rs) > 1:
                assert sum(r.n_tokens for r in rs) <= BUDGET
                # offsets tile without overlap
                spans = sorted((r.offset, r.offset + r.n_tokens) for r in rs)
                for (s1, e1), (s2, _) in zip(spans, spans[1:]):
                    assert e1 <= s2

    check()
