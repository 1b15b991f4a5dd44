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


def test_approx_quantiles_rank_error_bound(spark, sf_dir):
    """GK sketch contract: the rank of each approximate quantile must sit
    within n/accuracy of the target rank p*n (plus 1 for interpolation
    slack) — the property that makes approx_percentile a safe drop-in
    for the exact path at 100 TB."""
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.plans.profile import (
        APPROX_QUANTILE_ACCURACY,
        _QUANTILE_COLS,
        profile_approx_quantiles_lineitem,
    )
    from dffoo_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    slack = n / APPROX_QUANTILE_ACCURACY + 1
    approx = profile_approx_quantiles_lineitem(spark, sf_dir).collect()
    assert len(approx) == len(_QUANTILE_COLS) * 5
    # one aggregate computes every rank check; with ties the returned
    # value occupies the whole rank interval [count(<q̂), count(<=q̂)]
    checks = li.agg(
        *[
            agg
            for i, r in enumerate(approx)
            for agg in (
                F.count(F.when(F.col(r.col_name) < r.q, 1)).alias(f"lo_{i}"),
                F.count(F.when(F.col(r.col_name) <= r.q, 1)).alias(f"hi_{i}"),
            )
        ]
    ).collect()[0]
    for i, r in enumerate(approx):
        lo, hi = checks[f"lo_{i}"], checks[f"hi_{i}"]
        assert lo - slack <= r.p * n <= hi + slack, (r.col_name, r.p, r.q, lo, hi)


def test_regression_matches_numpy_and_recovers_structure(spark):
    """Cramer-from-moments must equal an independent numpy lstsq fit,
    and the fit must recover the revenue formula's linearization:
    b_price ≈ 1 − E[discount], b_discount ≈ −E[price], R² ≈ 0.99."""
    import numpy as np

    from dffoo_data_pipeline_spark.plans.profile import lineitem_price_regression

    sf_dir = "/root/testdata/sf0.01"
    row = lineitem_price_regression(spark, sf_dir).collect()[0]

    import duckdb

    x, d, y = (
        np.array(c)
        for c in zip(
            *duckdb.sql(
                f"SELECT l_extendedprice, l_discount, "
                f"ROUND(l_extendedprice * (1 - l_discount), 4) "
                f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
            ).fetchall()
        )
    )
    A = np.column_stack([np.ones_like(x), x, d])
    b, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert abs(row.b0 - b[0]) <= 1e-3 * max(1, abs(b[0]))
    assert abs(row.b_price - b[1]) <= 1e-5
    assert abs(row.b_discount - b[2]) <= 1e-3 * abs(b[2])
    # structure recovery
    assert abs(row.b_price - (1 - d.mean())) < 0.02
    assert abs(row.b_discount - (-x.mean())) < 0.02 * x.mean()
    assert row.r2 > 0.99


def test_conformal_coverage_near_nominal(spark):
    """Split-conformal guarantee: held-out coverage of the q95 interval
    must sit at the nominal 95% (up to finite-sample wobble)."""
    from dffoo_data_pipeline_spark.plans.profile import lineitem_conformal_interval

    row = lineitem_conformal_interval(spark, "/root/testdata/sf0.01").collect()[0]
    assert 0.93 <= row.coverage <= 0.97, row.coverage
    assert row.q95 > 0
    assert row.n_train + row.n_cal + row.n_test == 60000


def test_cv_folds_balanced_and_consistent(spark):
    from dffoo_data_pipeline_spark.plans.profile import lineitem_regression_cv

    rows = lineitem_regression_cv(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    assert sum(r.n_oos for r in rows) == 60000
    rmses = [r.rmse_oos for r in rows]
    # held-out error is stable across folds when the model generalizes
    assert max(rmses) <= 1.1 * min(rmses), rmses


def test_bootstrap_se_matches_analytic(spark):
    """Poisson-bootstrap SE of the mean must agree with the analytic
    sigma/sqrt(n), and the percentile CI must cover the point mean."""
    import duckdb

    from dffoo_data_pipeline_spark.plans.profile import profile_bootstrap_mean

    sf_dir = "/root/testdata/sf0.01"
    row = profile_bootstrap_mean(spark, sf_dir).collect()[0]
    sd, n = duckdb.sql(
        f"SELECT stddev_samp(l_quantity), COUNT(*) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    analytic = sd / n ** 0.5
    assert abs(row.se_boot - analytic) <= 0.3 * analytic, (row.se_boot, analytic)
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    assert row.ci_hi - row.ci_lo >= 2 * row.se_boot  # CI wider than ±1 SE


def test_benford_fires_on_uniform_prices(spark):
    """Uniform prices genuinely violate Benford's law — the audit must
    FIRE here (true positive; chi2_independence pins the true negative)."""
    from dffoo_data_pipeline_spark.plans.profile import profile_benford_audit

    row = profile_benford_audit(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.deviates_from_benford is True
    assert row.chi2 > 100  # decisively, not marginally
