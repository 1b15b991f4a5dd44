"""Structural invariants for the dimension-history and CDC operators —
properties the oracle's value-compare can't articulate: validity ranges
must tile each user's timeline, exactly one row may be current, and a
trailing delete must actually remove the key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.events import QUERIES


@pytest.fixture(scope="module")
def scd2(spark, sf_dir):
    df = QUERIES["scd2_user_tier"](spark, sf_dir).cache()
    yield df
    df.unpersist()  # keep the no-cached-RDDs-left-behind invariant


def test_scd2_exactly_one_current_per_user(scd2):
    bad = (
        scd2.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .where(F.col("n_current") != 1)
    )
    assert bad.count() == 0


def test_scd2_ranges_are_ordered_and_contiguous(scd2):
    # valid_to of row k must equal valid_from of row k+1 (no gaps, no
    # overlaps) and ranges must be strictly forward in time
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    nxt = scd2.withColumn("next_from", F.lead("valid_from").over(w))
    broken = nxt.where(
        (F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from")))
        | (F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from")))
    )
    assert broken.count() == 0


def test_scd2_adjacent_tiers_differ(scd2):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    same = scd2.withColumn("prev_tier", F.lag("tier").over(w)).where(
        F.col("tier") == F.col("prev_tier")
    )
    assert same.count() == 0  # change-point compression means no repeats


def test_cdc_delete_removes_key(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10, "signup", 5.0, "{}"),
        (2, "2024-01-01 01:00:00", 10, "purchase", 7.0, "{}"),
        (3, "2024-01-01 02:00:00", 10, "error", 0.0, "{}"),   # trailing delete
        (4, "2024-01-01 00:00:00", 20, "signup", 1.0, "{}"),
        (5, "2024-01-01 01:00:00", 20, "error", 0.0, "{}"),
        (6, "2024-01-01 02:00:00", 20, "view", 9.0, "{}"),    # re-created after delete
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import dffoo_data_pipeline_spark.plans.events as EV

    orig = EV.load_table
    EV.load_table = lambda *a, **k: df
    try:
        snap = {r.user_id: r for r in EV.QUERIES["cdc_apply_latest"](spark, "x").collect()}
    finally:
        EV.load_table = orig
    assert 10 not in snap              # last op was D → key gone
    assert snap[20].current_value == 9.0 and snap[20].n_changes == 3


def test_scd2_same_microsecond_tier_changes_are_deterministic(spark):
    """Two tier changes in the SAME microsecond (r10 self-review): both
    windows tiebreak on event_id, so the change rows get deterministic
    valid_to chaining — event 1 ('low') closed by event 2 ('mid'),
    which is current.  Without the second window's tiebreak the
    valid_to/is_current assignment between the two identical-valid_from
    rows was nondeterministic run-to-run and engine-to-engine."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, "view", 10.0, "{}"),    # low
        (2, "2024-01-01 00:00:00", 10, "view", 100.0, "{}"),   # mid, same us
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import dffoo_data_pipeline_spark.plans.events as EV

    orig = EV.load_table
    EV.load_table = lambda *a, **k: df
    try:
        got = sorted(
            (r.tier, r.valid_to is None, r.is_current)
            for r in EV.QUERIES["scd2_user_tier"](spark, "x").collect()
        )
    finally:
        EV.load_table = orig
    # deterministic: 'low' (event 1) is closed by 'mid' (event 2)
    assert got == [("low", False, False), ("mid", True, True)]


def test_ordered_funnel_excludes_null_users(spark):
    """Anonymous (NULL user_id) events are excluded from every funnel
    step in the Spark plan, matching the oracle where inner equi-joins
    drop NULL keys after step 1 (r10 self-review: a window partitionBy
    treats NULL as a normal group, so a NULL user's view>click>purchase
    chain counted toward steps 2/3 in Spark only)."""
    rows = [
        (1, "2024-01-01 00:00:00", None, "view", 1.0, "{}"),
        (2, "2024-01-01 01:00:00", None, "click", 1.0, "{}"),
        (3, "2024-01-01 02:00:00", None, "purchase", 1.0, "{}"),
        (4, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
        (5, "2024-01-01 01:00:00", 7, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import dffoo_data_pipeline_spark.plans.events as EV

    orig = EV.load_table
    EV.load_table = lambda *a, **k: df
    try:
        got = {r.step: r.n_users for r in EV.QUERIES["events_ordered_funnel"](spark, "x").collect()}
    finally:
        EV.load_table = orig
    assert got == {1: 1, 2: 1, 3: 0}  # only user 7; the NULL chain contributes nowhere
