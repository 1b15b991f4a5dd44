"""Streaming CDC merge sink: changelog files → keyed parquet table,
incremental across restarts, idempotent under replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.streaming.jobs import run_cdc_stream_to_table

_SCHEMA = "k long, op string, val string, seq long"


def _changes_stream(spark, src_dir):
    return (
        spark.readStream.schema(_SCHEMA).format("parquet").load(src_dir)
    )


def _table(spark, path):
    return {
        r.k: (r.val, r.seq)
        for r in spark.read.parquet(path).collect()
    }


def test_cdc_stream_merges_incrementally_and_exactly_once(spark, tmp_path):
    src = str(tmp_path / "changes")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two inserts and an in-batch update (seq 3 supersedes seq 1)
    spark.createDataFrame(
        [(1, "I", "a0", 1), (2, "I", "b0", 2), (1, "U", "a1", 3)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run_cdc_stream_to_table(_changes_stream(spark, src), table, ckpt, ["k"])
    assert _table(spark, table) == {1: ("a1", 3), 2: ("b0", 2)}

    # batch 2 (new file, SAME checkpoint): update key 2, delete key 1, insert 3
    spark.createDataFrame(
        [(2, "U", "b1", 4), (1, "D", None, 5), (3, "I", "c0", 6)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run_cdc_stream_to_table(_changes_stream(spark, src), table, ckpt, ["k"])
    assert _table(spark, table) == {2: ("b1", 4), 3: ("c0", 6)}

    # restart with nothing new: a no-op, table untouched
    run_cdc_stream_to_table(_changes_stream(spark, src), table, ckpt, ["k"])
    assert _table(spark, table) == {2: ("b1", 4), 3: ("c0", 6)}


def test_cdc_batch_apply_is_idempotent(spark, tmp_path):
    from dffoo_data_pipeline_spark.streaming.jobs import apply_cdc_batch

    table = str(tmp_path / "t")
    b = spark.createDataFrame(
        [(1, "I", "x", 1), (2, "I", "y", 2), (2, "D", None, 3)], _SCHEMA
    )
    apply_cdc_batch(spark, b, table, ["k"])
    first = _table(spark, table)
    apply_cdc_batch(spark, b, table, ["k"])  # replay: same result
    assert _table(spark, table) == first == {1: ("x", 1)}
