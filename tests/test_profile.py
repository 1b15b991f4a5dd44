"""Tests for operators/profile.py (single-scan table profiler)."""

from __future__ import annotations

from dffoo_data_pipeline_spark.operators.profile import profile_table


def _fixture(spark):
    return spark.createDataFrame(
        [
            (1, 2.5, "a", None),
            (2, None, "b", "x"),
            (None, 7.5, "b", "y"),
        ],
        "k bigint, v double, s string, t string",
    )


def test_profile_exact(spark):
    out = {r.col_name: r for r in profile_table(_fixture(spark)).collect()}
    assert set(out) == {"k", "v", "s", "t"}
    k = out["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 1, 2)
    assert (k.min_num, k.max_num) == (1.0, 2.0)
    assert k.min_str is None and k.max_str is None
    s = out["s"]
    assert (s.n_nulls, s.n_distinct, s.min_str, s.max_str) == (0, 2, "a", "b")
    t = out["t"]
    assert (t.n_nulls, t.n_distinct) == (1, 2)


def test_profile_approx_same_schema(spark):
    exact = profile_table(_fixture(spark))
    approx = profile_table(_fixture(spark), approx=True)
    assert exact.schema == approx.schema
    got = {r.col_name: r.n_distinct for r in approx.collect()}
    # HLL is exact at this cardinality
    assert got == {"k": 2, "v": 2, "s": 2, "t": 2}


def test_profile_single_scan(spark):
    """The whole profile must be ONE aggregate over the table (one scan),
    not one job per column."""
    df = _fixture(spark)
    plan = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
