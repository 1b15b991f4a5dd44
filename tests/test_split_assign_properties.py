"""Property tests for curation_split_assign (train/val/test by hash-of-id)
and the empty-input edge of events_sessionization.

The split contract: membership is a pure function of doc_id (stable under
repartitioning and corpus growth), the three splits partition the corpus,
and the realized ratios track the designed 75/12.5/12.5 cutoffs within
binomial noise.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.curation import curation_split_assign
from dffoo_data_pipeline_spark.plans.events import events_sessionization

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def split_sf01(spark):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    return curation_split_assign(spark, SF01).cache()


def test_splits_partition_the_corpus(split_sf01, spark):
    from dffoo_data_pipeline_spark.sources.readers import load_table

    n_docs = load_table(spark, SF01, "documents").count()
    counts = {r["split"]: r["n"] for r in split_sf01.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n_docs
    # every doc appears exactly once
    assert split_sf01.select("doc_id").distinct().count() == n_docs


def test_ratios_within_binomial_noise(split_sf01):
    n = split_sf01.count()
    counts = {r["split"]: r["n"] for r in split_sf01.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # designed p: train 12/16, val 2/16, test 2/16; allow 4 binomial sigma
    for split, p in (("train", 0.75), ("val", 0.125), ("test", 0.125)):
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(counts[split] - n * p) <= 4 * sigma, (split, counts[split], n * p)


def test_membership_stable_under_repartition(split_sf01, spark):
    """Hash-of-id means the assignment must be identical on any partition
    layout — the property row_number()/rand() schemes violate."""
    base = {r.doc_id: r.split for r in split_sf01.collect()}
    reparted = (
        curation_split_assign(spark, SF01)
        .repartition(7, "lang")
        .collect()
    )
    assert {r.doc_id: r.split for r in reparted} == base


def test_membership_stable_under_corpus_subset(split_sf01, spark):
    """Growing/shrinking the corpus must not move surviving docs between
    splits (no dependence on global order or counts)."""
    base = {r.doc_id: r.split for r in split_sf01.collect()}
    subset = (
        curation_split_assign(spark, SF01)
        .where(F.col("doc_id") % 3 == 0)
        .collect()
    )
    for r in subset:
        assert base[r.doc_id] == r.split


def test_events_sessionization_empty_input(spark, tmp_path):
    """Gap sessionization on an empty events table: the lag() is NULL for
    a first row, but with zero rows the query must return zero rows with
    the full schema (no NPE, no isNull-gap misfire)."""
    empty = spark.createDataFrame(
        [],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "empty_sf")
    empty.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    out = events_sessionization(spark, d)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "session_no",
        "n_events",
        "session_start",
        "session_end",
        "session_value",
    ]


def test_temporal_split_partitions_and_leakage_bounds(spark, sf_dir):
    """The three splits must partition the event set exactly, per-split
    user counts can never exceed the global user count, and
    train-overlap is bounded by the split's own user count."""
    import duckdb

    from dffoo_data_pipeline_spark.plans.curation import QUERIES

    rows = {r.split: r for r in QUERIES["curation_temporal_split"](spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    con = duckdb.connect()
    n_events, n_users = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert sum(r.n_events for r in rows.values()) == n_events
    # 80/10/10 by exact quantile: train gets ~80% of events (quantile
    # interpolation can move a handful of boundary events either way)
    assert abs(rows["train"].n_events - 0.8 * n_events) <= max(2, 0.01 * n_events)
    for r in rows.values():
        assert r.n_users <= n_users
        assert r.n_users_seen_in_train <= r.n_users
    assert rows["train"].n_users_seen_in_train == rows["train"].n_users
