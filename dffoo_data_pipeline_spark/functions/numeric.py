"""Deterministic numeric expressions for cross-engine reproducibility.

Floating-point SUM order is partition-dependent and ROUND-at-half differs
between engines (Spark HALF_UP on the shortest decimal repr; DuckDB
half-even on doubles).  Two rules make results bit-identical between Spark
and any ANSI engine:

1. Aggregate money in DECIMAL (exact, associative), round the exact
   decimal (both engines round decimals half-up for positives), cast to
   DOUBLE last — the cast is exact whenever scaled values fit in 2^53.
2. For ratios of identical inputs, round via FLOOR(x·10^d + 0.5)/10^d —
   a mode-independent function, so identical inputs give identical
   outputs regardless of engine rounding conventions.

The data contract: every source money/value column carries exactly 2
decimal digits (verified in tests), so DECIMAL(12,2) casts are exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col) -> Column:
    """Exact DECIMAL(12,2) view of a 2-decimal double column."""
    return F.col(col).cast("decimal(12,2)") if isinstance(col, str) else col.cast("decimal(12,2)")


def dec_small(col) -> Column:
    """Exact DECIMAL(4,2) for rate-like columns (discount, tax)."""
    return F.col(col).cast("decimal(4,2)") if isinstance(col, str) else col.cast("decimal(4,2)")


def money_sum(expr, scale: int = 2) -> Column:
    """SUM a decimal expression exactly, round half-up to `scale`, emit DOUBLE."""
    return F.round(F.sum(expr), scale).cast("double")


def exact_avg(expr, count_expr=None) -> Column:
    """Deterministic mean: exact decimal SUM cast to double, divided by the
    exact count — both operands bit-identical across engines, so the IEEE
    division is too."""
    cnt = count_expr if count_expr is not None else F.count(F.lit(1))
    return F.sum(expr).cast("double") / cnt


def round_det(col: Column, digits: int) -> Column:
    """Rounding-mode-independent round-half-up via floor(x·10^d + 0.5)."""
    scale = 10**digits
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round_det(expr: str, digits: int) -> str:
    """The DuckDB-side twin of round_det, as SQL text."""
    scale = 10**digits
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"


def event_order(ts: str = "ts", id_col: str = "event_id") -> tuple[Column, Column]:
    """The engine's TOTAL-ORDER convention for ts-ordered windows over an
    event stream (README determinism notes, r12): order by
    (ts ASC NULLS LAST, unique_id ASC).

    Two same-key events in the same microsecond make any ts-only window
    (lag/lead, cumulative sums, EWMA, SCD2 valid_from, as-of) emit
    whichever answer the shuffle happened to sort first — the unique id
    tiebreak restores run-to-run AND cross-engine determinism.  NULLS
    LAST (not Spark's ASC default NULLS FIRST) matches the default NULL
    placement of DuckDB/Postgres ASC windows, so oracles need no
    engine-specific NULLS clause.  Queries whose semantics EXCLUDE
    timeless rows filter `ts IS NOT NULL` before the window instead of
    relying on placement.
    """
    return (F.col(ts).asc_nulls_last(), F.col(id_col).asc_nulls_last())
