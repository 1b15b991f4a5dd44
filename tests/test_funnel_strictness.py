"""Adversarial fixture for the ordered-funnel window rewrite.

The synthetic events table converts every user at every step, so it
cannot distinguish the windowed one-scan plan from the join-chained
original.  This fixture plants every ordering edge case the strict `>`
chain must honor and compares Spark against the DuckDB oracle SQL
cell-by-cell.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dffoo_data_pipeline_spark.plans.events import ORACLES, QUERIES

_CASES = [
    # u1: clean view < click < purchase — converts fully
    (1, "2024-01-01 00:00:00", "view"),
    (1, "2024-01-01 00:01:00", "click"),
    (1, "2024-01-01 00:02:00", "purchase"),
    # u2: click BEFORE any view — stops at step 1
    (2, "2024-01-01 00:01:00", "click"),
    (2, "2024-01-01 00:02:00", "view"),
    # u3: click at the SAME timestamp as the first view — strict > fails
    (3, "2024-01-01 00:00:00", "view"),
    (3, "2024-01-01 00:00:00", "click"),
    # u4: purchase at the SAME timestamp as the qualifying click — fails
    (4, "2024-01-01 00:00:00", "view"),
    (4, "2024-01-01 00:01:00", "click"),
    (4, "2024-01-01 00:01:00", "purchase"),
    # u5: later view must NOT reset the funnel: first view governs
    (5, "2024-01-01 00:00:00", "view"),
    (5, "2024-01-01 00:05:00", "view"),
    (5, "2024-01-01 00:01:00", "click"),
    (5, "2024-01-01 00:02:00", "purchase"),
    # u6: purchase after a NON-qualifying click only — stops at step 2? no:
    # the only click is before the view, so u6 stops at step 1
    (6, "2024-01-01 00:00:00", "click"),
    (6, "2024-01-01 00:01:00", "view"),
    (6, "2024-01-01 00:02:00", "purchase"),
    # u7: purchase between view and click — purchase must come after the
    # qualifying click, so u7 stops at step 2
    (7, "2024-01-01 00:00:00", "view"),
    (7, "2024-01-01 00:01:00", "purchase"),
    (7, "2024-01-01 00:02:00", "click"),
    # u8: two qualifying clicks; the FIRST governs the purchase test
    (8, "2024-01-01 00:00:00", "view"),
    (8, "2024-01-01 00:01:00", "click"),
    (8, "2024-01-01 00:03:00", "click"),
    (8, "2024-01-01 00:02:00", "purchase"),  # after click#1 → converts
    # u9: no view at all
    (9, "2024-01-01 00:00:00", "click"),
    (9, "2024-01-01 00:01:00", "purchase"),
]


@pytest.fixture(scope="module")
def fixture_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel")
    pdf = pd.DataFrame(
        [
            {
                "event_id": i,
                "ts": pd.Timestamp(ts),
                "user_id": u,
                "event_type": t,
                "value": 0.0,
                "props": "{}",
            }
            for i, (u, ts, t) in enumerate(_CASES)
        ]
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_ordered_funnel_strictness_matches_oracle(spark, fixture_dir):
    got = {
        r.step: r.n_users
        for r in QUERIES["events_ordered_funnel"](spark, fixture_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fixture_dir}/events.parquet/*.parquet')"
    )
    exp = dict(
        con.execute(
            f"SELECT step, n_users FROM ({ORACLES['events_ordered_funnel']})"
        ).fetchall()
    )
    assert got == exp
    # hand-derived truth: 8 users view (u1..u8; u9 never does); qualifying
    # clicks for u1,u4,u5,u7,u8 (u4's purchase ties its click but the click
    # itself qualifies); purchases strictly after those for u1,u5,u8
    assert got == {1: 8, 2: 5, 3: 3}
