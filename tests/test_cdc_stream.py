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


def test_cdc_batch_malformed_rows_and_equal_seq_ties(spark, tmp_path):
    """A NULL-op row must be IGNORED, not act as a silent delete (it
    passes neither the upsert filter nor the delete branch, but its key
    would still anti-join out of the table); equal-seq ties must break
    deterministically (upsert beats delete), so a crash replay picks the
    same winner."""
    from dffoo_data_pipeline_spark.streaming.jobs import apply_cdc_batch

    table = str(tmp_path / "t")
    apply_cdc_batch(
        spark,
        spark.createDataFrame([(7, "I", "live", 1), (8, "I", "b", 1)], _SCHEMA),
        table,
        ["k"],
    )
    # malformed row for key 7 wins the window by seq — must be dropped,
    # key 7 stays; key 8's equal-seq U/D tie resolves to the upsert
    b = spark.createDataFrame(
        [(7, None, None, 99), (8, "U", "b1", 9), (8, "D", None, 9)], _SCHEMA
    )
    apply_cdc_batch(spark, b, table, ["k"])
    got = _table(spark, table)
    assert got[7] == ("live", 1)  # not deleted by the malformed row
    assert got[8] == ("b1", 9)  # upsert beat delete on the seq tie
    apply_cdc_batch(spark, b, table, ["k"])  # replay: same winner
    assert _table(spark, table) == got


def test_cdc_batch_recovers_interrupted_swap(spark, tmp_path):
    """Crash window between _swap_in's two renames: the table dir is
    absent and `.__old__` holds the only committed copy.  The next apply
    must RESTORE it and merge on top — not rebuild the table from the
    replayed batch alone (which silently discards every other key)."""
    import os

    from dffoo_data_pipeline_spark.streaming.jobs import apply_cdc_batch

    table = str(tmp_path / "t")
    apply_cdc_batch(
        spark,
        spark.createDataFrame([(1, "I", "a", 1), (2, "I", "b", 2)], _SCHEMA),
        table,
        ["k"],
    )
    os.rename(table, f"{table}.__old__")  # simulate the crash window
    apply_cdc_batch(
        spark, spark.createDataFrame([(3, "I", "c", 3)], _SCHEMA), table, ["k"]
    )
    assert _table(spark, table) == {1: ("a", 1), 2: ("b", 2), 3: ("c", 3)}


def test_incremental_rollup_recovers_interrupted_swap(spark, tmp_path):
    """Same crash window for the rollup root: the replayed batch must
    merge into the RESTORED rollup (ledger consulted), not re-create a
    rollup holding only its own partials."""
    import os

    from dffoo_data_pipeline_spark.sources.readers import load_table
    from dffoo_data_pipeline_spark.streaming.jobs import run_incremental_rollup
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "events_src")
    events = load_table(spark, SF_SMOKE, "events")
    events.limit(200).coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(events.schema).format("parquet").load(src)
    )
    run_incremental_rollup(spark, stream, root, ckpt)
    before = {
        (r.window_start, r.event_type): (r.n_events, r.total_cents)
        for r in spark.read.parquet(f"{root}/data").collect()
    }

    os.rename(root, f"{root}.__old__")  # simulate the crash window
    # new file arrives; the resumed run must first restore the root
    events.limit(300).coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(events.schema).format("parquet").load(src)
    )
    run_incremental_rollup(spark, stream2, root, ckpt)
    after = {
        (r.window_start, r.event_type): (r.n_events, r.total_cents)
        for r in spark.read.parquet(f"{root}/data").collect()
    }
    # totals grew on top of the restored state (300 more event rows
    # folded in), never shrank below the pre-crash rollup
    assert sum(v[0] for v in after.values()) == sum(v[0] for v in before.values()) + 300


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
