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
