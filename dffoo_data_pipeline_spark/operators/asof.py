"""General as-of join (task-named custom operator; Spark has no native
ASOF JOIN — DuckDB/Pandas/kdb do).

Semantics: for every left row, attach the single right row with the
largest right-time <= left-time (direction='backward'; 'forward' is the
mirror), matching within `by` keys, optionally within a tolerance.

Implementation — the union-window formulation, NOT a range self-join:
tag both sides, union, sort each `by` partition by (time, side) and carry
the last-seen right payload forward with last(ignorenulls) over a
running frame.  One shuffle on `by`, one sort, zero row explosion —
the classic range-join formulation explodes to |L|x|R| candidate pairs
per key before aggregation, this stays |L|+|R|.

Scale: partition key is `by` (user/symbol — high cardinality); state per
row is one carried struct.  Skewed keys (one symbol = half the stream)
fall back to AQE-handled sort; tolerance filtering is a plain column op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    direction: str = "backward",
    tolerance_us: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the nearest preceding (backward)
    or following (forward) right row's `value_cols` within `by` groups.

    Right columns come back as `<col><suffix>` plus `<on><suffix>` (the
    matched right time); unmatched left rows keep nulls.

    NULL-time contract (r12 hostile sweep): a LEFT row with a NULL time
    is kept (left join) but matches NOTHING — "as of no particular
    time" has no nearest row; a RIGHT row with a NULL time matches
    nothing either.  Sort-based ASOF implementations that binary-search
    the probe (DuckDB's) silently place a NULL probe after every right
    row and hand it the globally latest match — oracles must mask that
    (see join_asof_generic's CASE guard).
    """
    assert direction in ("backward", "forward")
    payload = F.struct(F.col(on).alias("__rt"), *[F.col(c) for c in value_cols])
    # union with a typed payload column: right rows carry it, left rows
    # carry null of the same struct type.  Right rows with a NULL time
    # cannot participate in time ordering (asc sorts them FIRST, where
    # last(ignorenulls) would carry their payload into every left row
    # preceding the first real right row) — drop them up front.
    r_min = (
        right.where(F.col(on).isNotNull())
        .select(*by, F.col(on), payload.alias("__p"))
        .withColumn("__side", F.lit(0))
    )
    l_min = left.withColumn(
        "__p", F.lit(None).cast(r_min.schema["__p"].dataType)
    ).withColumn("__side", F.lit(1))
    u = l_min.select(*left.columns, "__p", "__side").unionByName(
        r_min.select(
            *[
                F.col(c) if c in (*by, on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
            ],
            "__p",
            "__side",
        )
    )

    # the trailing __p term makes the carried match DETERMINISTIC when
    # several right rows share the same (by, on) instant: last() then
    # picks the struct-largest payload every run, instead of whichever
    # tied row the shuffle happened to sort last
    # NULLS FIRST in BOTH directions: a NULL-time LEFT row must precede
    # every right row so last(ignorenulls) has nothing to carry into it
    # (asc's Spark default is already NULLS FIRST; desc's is NULLS LAST,
    # which would have handed forward-direction NULL probes the carried
    # payload of the entire right stream)
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.asc_nulls_first(on), F.asc("__side"), F.asc("__p"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.desc_nulls_first(on), F.asc("__side"), F.asc("__p"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1).drop("__p", "__side")

    if tolerance_us is not None:
        dt = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col("__m.__rt")))
        out = out.withColumn("__m", F.when(dt <= tolerance_us, F.col("__m")))

    out = out.withColumn(f"{on}{suffix}", F.col("__m.__rt"))
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__m.{c}"))
    return out.drop("__m")
