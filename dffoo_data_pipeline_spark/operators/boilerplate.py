"""C4-style repeated-unit removal (boilerplate scrubbing).

The C4 / RefinedWeb cleaning step: any text unit (C4 uses the LINE) that
occurs too many times across the corpus is boilerplate — nav bars, cookie
banners, license footers — and is dropped from every document while the
rest of each document survives in order.

The operator is unit-agnostic: callers pass a function building the
per-document array<string> of units (lines, sentences, fixed token
windows…).  The synthetic `documents` fixture has no newlines, so the
registered query in plans/corpus.py uses non-overlapping 3-token windows
as its unit — same plan shape, same semantics, oracle-checkable.

Scale: one shuffle to count units (map-side combine collapses each
partition's repeats first), one shuffle join of unit instances to counts
(the count side is distinct-unit-sized; a single mega-hot unit is a
skewed JOIN key, which AQE skew-join splits — unlike a window-over-unit
formulation, which would pin every instance of that unit into one
partition with no recourse), one per-doc reassembly shuffle.  Document
order is restored by sorting each doc's kept units by position, so the
result is deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_window_units(text_col, n: int = 3) -> Column:
    """Non-overlapping n-token windows of normalized text as the unit
    array — the fixture-friendly stand-in for split-on-newline."""
    from dffoo_data_pipeline_spark.functions import text as TX

    toks = TX.tokens(TX.normalized_text(text_col))
    n_units = F.ceil(F.size(toks) / F.lit(float(n))).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n_units, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * n + 1, n)),
    )


def line_units(text_col) -> Column:
    """Split-on-newline units — C4's actual definition."""
    return F.split(text_col, r"\n")


def remove_repeated_units(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    unit_fn: Callable[[str], Column] = line_units,
    max_occurrences: int = 2,
    joiner: str = " ",
    stage_units: bool = False,
) -> DataFrame:
    """Drop every unit occurring more than `max_occurrences` times across
    the corpus (C4 drops lines seen ≥3 times ⇒ default keeps ≤2), then
    reassemble each document's surviving units in original order.

    Returns (id_col, n_units, n_units_dropped, clean_text); documents
    whose every unit was boilerplate survive with clean_text = ''.

    Lineage shape: the exploded unit frame has exactly two consumers
    (the unit-count aggregate and the count join); per-doc totals and the
    all-units-dropped docs come from a separate NO-explode projection of
    the input (one O(n) array build per document).  At 100 TB you either
    accept the 2× explode recompute (scan-bound, embarrassingly
    parallel) or stage the exploded frame once; ``stage_units=True`` does
    the latter via a lazy localCheckpoint — EXPLICIT caller opt-in, never
    a default, because a corpus-sized persist hidden inside an operator
    is how clusters fall over.  (Per-doc totals must NOT be derived from
    the exploded frame even when staged: a NULL-text doc's unit array is
    NULL, the explode drops it, and the doc would vanish from the output
    instead of reporting n_units = NULL.)
    """
    # The exploded frame carries ONLY (id, unit_no, unit): any per-doc
    # scalar (like the unit total) must NOT ride through the generator —
    # an expression column next to posexplode gets inlined into the
    # post-Generate projection and is re-evaluated per exploded row,
    # which for size(unit_fn(...)) re-builds the whole unit array per
    # unit (O(n²) per document; measured 13× slower at sf0.1).  Totals
    # come from a separate no-explode projection instead.
    units = docs.select(
        id_col, F.posexplode(unit_fn(text_col)).alias("unit_no", "unit")
    )
    if stage_units:
        units = units.localCheckpoint(eager=False)
    counts = units.groupBy("unit").agg(F.count(F.lit(1)).alias("unit_count"))
    kept = units.join(
        counts.where(F.col("unit_count") <= max_occurrences).select("unit"), "unit"
    )
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            joiner,
            F.transform(
                F.array_sort(F.collect_list(F.struct("unit_no", "unit"))),
                lambda s: s["unit"],
            ),
        ).alias("clean_text"),
    )
    all_docs = docs.select(
        id_col, F.size(unit_fn(text_col)).cast("long").alias("n_units")
    )
    return all_docs.join(reassembled, id_col, "left").select(
        id_col,
        "n_units",
        (F.col("n_units") - F.coalesce("n_kept", F.lit(0))).alias("n_units_dropped"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
