"""Unit tests for the quarantine / dead-letter gate (operators/quality.py,
r12) on constructed rows — the routing semantics themselves, independent
of the fixture tables (whose oracle parity lives in test_oracle.py and
test_hostile_inputs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators.quality import (
    dangling,
    flag_rules,
    quarantine,
    quarantine_report,
    with_presence,
)


def _frame(spark):
    # (id, key, qty): one clean row, one NULL key, one dangling key,
    # one nonpositive qty, one NULL qty + dangling (two reasons)
    rows = [
        (1, 10, 5.0),
        (2, None, 3.0),
        (3, 99, 2.0),
        (4, 10, -1.0),
        (5, 98, None),
    ]
    df = spark.createDataFrame(rows, "id long, key long, qty double")
    dim = spark.createDataFrame([(10,), (11,)], "dim_key long")
    f = with_presence(df, "key", dim, "dim_key", "present", broadcast=True)
    rules = {
        "dangling_key": dangling("key", "present"),
        "ngtv_qty": F.col("qty") <= 0,
        "null_key": F.col("key").isNull(),
        "null_qty": F.col("qty").isNull(),
    }
    return f, rules


def test_quarantine_routes_rows_with_sorted_reasons(spark):
    f, rules = _frame(spark)
    clean, bad = quarantine(f, rules)
    assert [r.id for r in clean.orderBy("id").collect()] == [1]
    got = {r.id: list(r.reasons) for r in bad.collect()}
    assert got == {
        2: ["null_key"],
        3: ["dangling_key"],
        4: ["ngtv_qty"],
        5: ["dangling_key", "null_qty"],
    }
    # clean side carries the ORIGINAL columns only (no flag residue)
    assert set(clean.columns) == {"key", "id", "qty", "present"}


def test_null_predicates_coalesce_to_not_flagged(spark):
    """A rule predicate evaluating to NULL (qty <= 0 on NULL qty) must
    not flag the row under that rule — three-valued logic never leaks
    into routing (the r11 gopher-flags convention)."""
    f, rules = _frame(spark)
    flagged = flag_rules(f, rules)
    row5 = flagged.where("id = 5").collect()[0]
    assert row5["__viol_ngtv_qty"] is False
    assert row5["__viol_null_qty"] is True


def test_report_counts_and_clean_row(spark):
    f, rules = _frame(spark)
    rep = {r.rule: (r.n_rows, r.n_checked) for r in quarantine_report(f, rules).collect()}
    assert rep == {
        "dangling_key": (2, 5),
        "ngtv_qty": (1, 5),
        "null_key": (1, 5),
        "null_qty": (1, 5),
        "clean": (1, 5),
    }


def test_presence_join_broadcast_knob(spark):
    """broadcast=True pins a broadcast hash join (dimension presence);
    broadcast=False leaves a shuffle join (fact-to-fact presence) even
    for a tiny dim — explicit, not stats-dependent."""
    df = spark.createDataFrame([(1, 10, 5.0)], "id long, key long, qty double")
    dim = spark.createDataFrame([(10,), (11,)], "dim_key long")
    hinted = with_presence(df, "key", dim, "dim_key", "p", broadcast=True)
    plan = hinted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    plain = with_presence(df, "key", dim, "dim_key", "p")
    plan2 = plain._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan2
