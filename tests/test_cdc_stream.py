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


def test_incremental_rollup_converges_to_batch_aggregate(spark, tmp_path):
    """Continuous-aggregate maintenance: after incrementally processing
    the event files in two separate runs (durable checkpoint, second
    run's windows arbitrarily 'late' relative to the first), the rollup
    must equal the one-shot batch aggregate of ALL events — bit-exact,
    because totals ride integer cents."""
    from dffoo_data_pipeline_spark.functions import numeric as N
    from dffoo_data_pipeline_spark.sources.readers import load_table
    from dffoo_data_pipeline_spark.streaming.jobs import (
        read_rollup,
        run_incremental_rollup,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    src = str(tmp_path / "src")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    first, second = (
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1),
    )

    def stream():
        return spark.readStream.schema(ev.schema).format("parquet").load(src)

    first.coalesce(1).write.mode("append").parquet(src)
    run_incremental_rollup(spark, stream(), rollup, ckpt)
    second.coalesce(1).write.mode("append").parquet(src)
    run_incremental_rollup(spark, stream(), rollup, ckpt)
    # a third run with nothing new must be a no-op
    run_incremental_rollup(spark, stream(), rollup, ckpt)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_rollup(spark, rollup).collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum((N.dec2("value") * 100).cast("bigint")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
        .collect()
    }
    assert got == expected
