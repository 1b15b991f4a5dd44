"""Blocked record linkage + mergeable HLL sketch rollup (plans/linkage.py).

Oracle parity for linkage_blocked_match runs in test_oracle.py like every
registered query; here we assert the operator-level CONTRACTS the oracle
can't express: linkage recall, blocking bounds, and the sketch error
bound against exact distinct counts.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.linkage import (
    events_sketch_rollup,
    linkage_blocked_match,
)


@pytest.fixture(scope="module")
def linked(spark, sf_dir):
    return linkage_blocked_match(spark, sf_dir).collect()


def test_linkage_links_every_dirty_record(linked, sf_dir):
    # blocking attributes are unperturbed and the true source sits at
    # edit distance 1, so recall through the block join is complete
    n_dirty = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/customer.parquet') "
        "WHERE c_custkey % 10 = 0"
    ).fetchone()[0]
    assert len(linked) == n_dirty


def test_linkage_resolves_to_true_source(linked):
    # the source row is at distance exactly 1; another customer can only
    # beat it at distance 0/1 in rare digit-collision cases — the
    # overwhelming majority must resolve to their origin
    back = sum(1 for r in linked if r.matched_id == r.dirty_id)
    assert back >= 0.95 * len(linked)
    assert all(r.edit_dist <= 2 for r in linked)
    assert all(r.edit_dist >= 1 for r in linked)  # deletion always changes the name


def test_linkage_blocks_bound_candidates(linked, sf_dir):
    # no candidate set may approach corpus size: the blocking join caps
    # comparisons at the largest (nationkey, mktsegment) block
    max_block = duckdb.sql(
        f"SELECT MAX(n) FROM (SELECT COUNT(*) AS n FROM "
        f"read_parquet('{sf_dir}/customer.parquet') "
        "GROUP BY c_nationkey, c_mktsegment)"
    ).fetchone()[0]
    assert max(r.n_candidates for r in linked) <= max_block


def test_sketch_rollup_error_bound(spark, sf_dir):
    rows = {(r.scope, r.period): r for r in events_sketch_rollup(spark, sf_dir).collect()}
    exact_total = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    total = rows[("total", None)]
    # lgConfigK=12 → ~1.6% standard error; 5% is a generous 3σ gate
    assert abs(total.est_users - exact_total) <= max(3, 0.05 * exact_total)
    day_rows = [r for (s, _), r in rows.items() if s == "day"]
    assert day_rows, "expected at least one day row"
    exact_days = dict(
        duckdb.sql(
            "SELECT CAST(ts AS DATE), COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    for r in day_rows:
        exact = exact_days[r.period]
        assert abs(r.est_users - exact) <= max(3, 0.05 * exact)
    # the total row must come from sketch UNION, not a rescan: merged
    # estimate can never be below the largest single-day estimate
    assert total.est_users >= max(r.est_users for r in day_rows)
    assert total.n_events == sum(r.n_events for r in day_rows)


def test_hist_quantile_rollup_bounds(spark, sf_dir):
    """Histogram-quantile contract: the interpolated estimate lands in
    the same bin as the rank-matched exact order statistic (error ≤ one
    bin width), and the total row is merged from daily bins (never a
    rescan) — so total n_events must equal the sum of day n_events."""
    from dffoo_data_pipeline_spark.plans.linkage import events_hist_quantile_rollup

    rows = {(r.scope, r.period): r for r in events_hist_quantile_rollup(spark, sf_dir).collect()}
    total = rows[("total", None)]
    day_rows = [r for (s, _), r in rows.items() if s == "day"]
    assert total.n_events == sum(r.n_events for r in day_rows)

    # exact order statistics at the SAME ranks the histogram targets
    # (r50 = ceil(n/2), r95 = ceil(0.95n)) — quantile_cont uses a
    # different rank definition, which in a sparse tail differs by a
    # whole order statistic, so it is not the right yardstick
    exact = {
        (g if g is not None else None): (x50, x95)
        for g, x50, x95 in duckdb.sql(
            f"""WITH o AS (
                SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS g, value,
                       ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                          ORDER BY value) AS rn,
                       COUNT(*) OVER (PARTITION BY CAST(ts AS DATE)) AS n
                FROM read_parquet('{sf_dir}/events.parquet')),
            t AS (
                SELECT NULL AS g, value,
                       ROW_NUMBER() OVER (ORDER BY value) AS rn,
                       COUNT(*) OVER () AS n
                FROM read_parquet('{sf_dir}/events.parquet')),
            u AS (SELECT * FROM o UNION ALL SELECT * FROM t)
            SELECT g,
                   MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS x50,
                   MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS x95
            FROM u GROUP BY g"""
        ).fetchall()
    }
    for r in [total] + day_rows:
        x50, x95 = exact[r.period]
        assert abs(r.p50_est - x50) <= 20.0, (r.period, r.p50_est, x50)
        assert abs(r.p95_est - x95) <= 20.0, (r.period, r.p95_est, x95)


def test_countmin_never_underestimates(spark, sf_dir):
    """The count-min hard guarantee: every estimate >= the exact count
    (hash collisions only ADD); and the min-over-D rows keeps the
    overestimate within the standard e*N/W bound's neighborhood."""
    from dffoo_data_pipeline_spark.plans.linkage import events_countmin_topk

    rows = events_countmin_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    for r in rows:
        assert r.cm_est >= r.exact_cnt  # CM never underestimates
        assert r.overestimate == r.cm_est - r.exact_cnt
        # e*N/W ≈ 2.7*N/512; 10x headroom for the min-over-4-rows draw
        assert r.overestimate <= max(10, 0.06 * total), (r.user_id, r.overestimate)
