"""Single-scan table profiler — the data-quality report every pipeline
runs on arrival: row count, null count, distinct count, min/max per
column (reference analog: the scraper's ad-hoc sanity prints before
loading, web_scraper.py's row-count logging — promoted to a first-class
typed result).

One aggregate over the table produces every metric for every column in a
single pass (Spark compiles the multi-count-distinct into one Expand +
aggregate — still one table scan); the per-column reshape then runs on a
single aggregated row via inline(), costing nothing.

Type strategy keeps the output schema fixed and engine-comparable:
numeric columns report min/max as DOUBLE (exact widening), timestamps as
epoch microseconds in the numeric slots (exact below 2^53 — i.e. until
the year 2255), strings in dedicated varchar slots (binary collation in
both engines).  Exact COUNT(DISTINCT) is the oracle-checkable default;
pass ``approx=True`` for the 100 TB path (HyperLogLog, one pass, no
Expand) — same schema, rows-only checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slots(c: str, kind: str, approx: bool) -> list[Column]:
    col = F.col(c)
    distinct = (
        F.approx_count_distinct(c) if approx else F.count_distinct(col)
    ).alias(f"{c}__nd")
    base = [
        F.count(F.lit(1)).alias(f"{c}__nr"),
        (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__nn"),
        distinct,
    ]
    if kind == "num":
        mn, mx = F.min(col).cast("double"), F.max(col).cast("double")
    elif kind == "ts":
        # parquet may surface TIMESTAMP_NTZ; session tz is UTC so the cast
        # to TIMESTAMP is value-preserving (same adaptation as load_table)
        mn = F.unix_micros(F.min(col).cast("timestamp")).cast("double")
        mx = F.unix_micros(F.max(col).cast("timestamp")).cast("double")
    else:
        mn = mx = None
    if mn is not None:
        base += [
            mn.alias(f"{c}__mnn"),
            mx.alias(f"{c}__mxn"),
            F.lit(None).cast("string").alias(f"{c}__mns"),
            F.lit(None).cast("string").alias(f"{c}__mxs"),
        ]
    else:
        base += [
            F.lit(None).cast("double").alias(f"{c}__mnn"),
            F.lit(None).cast("double").alias(f"{c}__mxn"),
            F.min(col).alias(f"{c}__mns"),
            F.max(col).alias(f"{c}__mxs"),
        ]
    return base


def profile_table(df: DataFrame, *, approx: bool = False) -> DataFrame:
    """Profile every supported column of `df` in one scan.

    Returns one row per column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str) — numeric/timestamp extremes in the `_num` slots (timestamps
    as epoch µs), string extremes in the `_str` slots.  Unsupported types
    (arrays, structs, binary) are skipped.
    """
    kinds: list[tuple[str, str]] = []
    for name, dtype in df.dtypes:
        if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith("decimal"):
            kinds.append((name, "num"))
        elif dtype in ("timestamp", "timestamp_ntz", "date"):
            kinds.append((name, "ts"))
        elif dtype == "string":
            kinds.append((name, "str"))
    aggs: list[Column] = []
    for c, kind in kinds:
        aggs.extend(_slots(c, kind, approx))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nr").alias("n_rows"),
                F.col(f"{c}__nn").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mnn").alias("min_num"),
                F.col(f"{c}__mxn").alias("max_num"),
                F.col(f"{c}__mns").alias("min_str"),
                F.col(f"{c}__mxs").alias("max_str"),
            )
            for c, _ in kinds
        ]
    )
    return one.select(F.inline(rows))
