"""Structured Streaming tests.

The driver's oracle check already proves stream==DuckDB on the single-file
source; these tests prove the *incremental* path: the same computations
stay correct when the source arrives as multiple files processed one per
micro-batch (maxFilesPerTrigger=1), i.e. state genuinely carries across
batches and update-mode re-emissions are reconciled.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from dffoo_data_pipeline_spark.functions import numeric as N
from dffoo_data_pipeline_spark.sources.readers import load_table
from dffoo_data_pipeline_spark.streaming import jobs
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chunked_events_dir(spark):
    """events.parquet split into 4 files so availableNow runs 4 batches."""
    d = tempfile.mkdtemp(prefix="sg_chunked_events_")
    # keep raw long-nanos ts shape identical to the testdata file
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream_raw(spark, src_dir):
    return (
        spark.readStream.schema(jobs._EVENTS_RAW)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


def test_multibatch_tumbling_matches_batch(spark, chunked_events_dir):
    stream = (
        _stream_raw(spark, chunked_events_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(N.dec2("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    got = jobs.run_stream_to_table(stream, "complete")

    e = load_table(spark, SF_SMOKE, "events")
    want = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(N.dec2("value")).cast("double").alias("total_value"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multibatch_stateful_totals_match_batch(spark, chunked_events_dir):
    updates = (
        _stream_raw(spark, chunked_events_dir)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            jobs._user_totals_fn,
            outputStructType=jobs._USER_TOTALS_SCHEMA,
            stateStructType=jobs._USER_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    emitted = jobs.run_stream_to_table(updates, "update")
    # update mode re-emits a key per batch it appears in: >1 row per key
    n_users = emitted.select("user_id").distinct().count()
    assert emitted.count() > n_users, "expected multi-batch re-emissions"

    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "total_value", "first_ts", "last_ts"), "n_events"
            ).alias("s")
        )
        .select("user_id", "s.n_events", "s.total_value", "s.first_ts", "s.last_ts")
    )
    e = load_table(spark, SF_SMOKE, "events")
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(N.dec2("value")).cast("double").alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))


def test_session_window_matches_gap_sessionization(spark):
    got = jobs.streaming_session_window(spark, SF_SMOKE)
    from dffoo_data_pipeline_spark.plans.events import events_sessionization

    want = events_sessionization(spark, SF_SMOKE).select(
        "user_id",
        F.col("session_start"),
        "n_events",
        F.col("session_value"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
