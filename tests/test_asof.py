"""As-of join operator modes (operators/asof.py): backward/forward,
tolerance, same-timestamp inclusion, unmatched nulls."""

from __future__ import annotations

import datetime as dt

from dffoo_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)

def _mk(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "v", _ts(5))],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(8), 1.0), ("u", _ts(10), 2.0), ("u", _ts(40), 3.0)],
        "user string, ts timestamp, px double",
    )
    return left, right


def test_backward_includes_equal_ts(spark):
    left, right = _mk(spark)
    got = {r.event_id: (r.ts_right, r.px_right) for r in asof_join(
        left, right, on="ts", by=["user"], value_cols=["px"]).collect()}
    assert got[1] == (_ts(10), 2.0)   # equal-ts right row matches
    assert got[2] == (_ts(10), 2.0)   # latest preceding
    assert got[3] == (None, None)     # no right rows for key v


def test_null_right_time_never_matches(spark):
    """A right row with a NULL time cannot participate in as-of ordering;
    it must not be carried into early left rows (asc sorts NULLs first,
    where last(ignorenulls) would pick its payload up)."""
    left, right = _mk(spark)
    right_with_null = right.union(
        spark.createDataFrame([("u", None, 99.0)], right.schema)
    )
    early = spark.createDataFrame(
        [(9, "u", _ts(1))], "event_id long, user string, ts timestamp"
    )
    got = {r.event_id: (r.ts_right, r.px_right) for r in asof_join(
        early, right_with_null, on="ts", by=["user"], value_cols=["px"]).collect()}
    assert got[9] == (None, None)  # not (None, 99.0)


def test_equal_time_right_rows_tie_deterministically(spark):
    """Two right rows at the same (by, on) instant: the carried match must
    be the same every run (struct-max payload), not whichever tied row
    the shuffle sorted last."""
    left = spark.createDataFrame(
        [(1, "u", _ts(20))], "event_id long, user string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 1.0), ("u", _ts(10), 2.0)],
        "user string, ts timestamp, px double",
    )
    for _ in range(3):
        got = asof_join(
            left, right, on="ts", by=["user"], value_cols=["px"]
        ).collect()[0]
        assert got.px_right == 2.0  # struct-largest payload, every run


def test_forward_direction(spark):
    left, right = _mk(spark)
    got = {r.event_id: (r.ts_right, r.px_right) for r in asof_join(
        left, right, on="ts", by=["user"], value_cols=["px"],
        direction="forward").collect()}
    assert got[1] == (_ts(10), 2.0)   # equal ts still matches
    assert got[2] == (_ts(40), 3.0)   # nearest following
    assert got[3] == (None, None)


def test_backward_with_tolerance(spark):
    left, right = _mk(spark)
    got = {r.event_id: r.px_right for r in asof_join(
        left, right, on="ts", by=["user"], value_cols=["px"],
        tolerance_us=5_000_000).collect()}
    assert got[1] == 2.0              # within 5 s
    assert got[2] is None             # 20 s gap: invalidated
