"""Quarantine / dead-letter gate — hostile-row handling as a first-class
pipeline stage (r12; no reference analog — the reference assumes clean
scraped rows, web_scraper.py:383-441 parses without any malformed-row
route).

The r12 hostile-input sweeps (tests/test_hostile_inputs.py) established
WHICH row classes break analytics: NULL join/group keys, timeless rows,
dangling foreign keys, out-of-domain numerics, malformed JSON.  This
operator makes the response explicit instead of per-query: classify
every row against a named rule battery in ONE pass, route clean rows
onward, and quarantine violators WITH their reasons — the dead-letter
pattern every production ingest runs in front of the warehouse.

Design for 100 TB:
- Rules are plain Column predicates — map-side, codegen, zero shuffle.
- Referential rules compose via `with_presence` (a distinct-key
  left-join presence flag): dimension sides broadcast while they fit;
  a fact-fact presence check (lineitem->orders) is an equi-join on the
  key both tables are naturally bucketed/partitioned by.
- The report is ONE conditional aggregation (map-side combined) over
  the flagged frame; the per-rule unpivot runs on the single aggregate
  row, never the corpus.
- Rule predicates must be NULL-DEFINITE at the call site or they are
  coalesced to FALSE here: a NULL predicate result silently neither
  flags nor passes a row, the exact three-valued-logic leak the gopher
  flags fix (r11) closed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_presence(
    fact: DataFrame,
    key: str,
    dim: DataFrame,
    dim_key: str,
    flag: str,
    broadcast: bool = False,
) -> DataFrame:
    """Left-join a boolean presence flag: `flag` is True where `key`
    exists in `dim.dim_key`, NULL otherwise (and for NULL keys).  The
    joined side is the dimension's DISTINCT key projection — minimal
    build side.  A dangling-FK rule is then
    `col(key).isNotNull() & col(flag).isNull()`.

    `broadcast=True` pins a broadcast hash join — use for genuine
    dimensions (part/supplier/customer), whose distinct-key projection
    fits any executor.  Leave False for fact-to-fact presence
    (lineitem->orders): that side must stay a shuffle equi-join on the
    key both facts are bucketed by (AQE still broadcasts it at runtime
    when the probe set happens to be small).
    """
    marks = (
        dim.select(F.col(dim_key).alias(key))
        .where(F.col(key).isNotNull())
        .distinct()
        .withColumn(flag, F.lit(True))
    )
    if broadcast:
        marks = F.broadcast(marks)
    return fact.join(marks, key, "left")


def dangling(key: str, flag: str) -> Column:
    """Violation predicate for a `with_presence` flag: the key is set
    but resolves to no dimension row.  NULL keys are NOT dangling —
    give them their own null_<key> rule."""
    return F.col(key).isNotNull() & F.col(flag).isNull()


def flag_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add one null-definite boolean column per rule (`__viol_<name>`)
    plus `reasons` (sorted array of violated rule names) and
    `is_clean`.  One projection — no shuffle, no UDF."""
    flagged = df
    for name, cond in rules.items():
        flagged = flagged.withColumn(
            f"__viol_{name}", F.coalesce(cond, F.lit(False))
        )
    reason_cells = F.array(
        *[
            F.when(F.col(f"__viol_{name}"), F.lit(name))
            for name in rules
        ]
    )
    reasons = F.array_sort(
        F.filter(reason_cells, lambda x: x.isNotNull())
    )
    return flagged.withColumn("reasons", reasons).withColumn(
        "is_clean", F.size("reasons") == 0
    )


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined): clean rows carry the original
    columns; quarantined rows add the sorted `reasons` array.  Both
    sides derive from ONE flagged projection — Spark evaluates the
    rule battery once per consumed branch (cache/checkpoint upstream
    if both sides feed long pipelines)."""
    flagged = flag_rules(df, rules)
    viol_cols = [f"__viol_{n}" for n in rules]
    clean = flagged.where(F.col("is_clean")).drop(
        "reasons", "is_clean", *viol_cols
    )
    bad = flagged.where(~F.col("is_clean")).drop("is_clean", *viol_cols)
    return clean, bad


def quarantine_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts + the clean count, in ONE pass:
    (rule, n_rows, n_checked) with a synthetic 'clean' rule for rows
    violating nothing.  n_checked repeats the corpus total so the
    report is self-describing (and non-degenerate on clean data)."""
    flagged = flag_rules(df, rules)
    aggs = [
        F.sum(F.when(F.col(f"__viol_{name}"), 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{i}")
        for i, name in enumerate(rules)
    ]
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("is_clean"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clean"),
        *aggs,
    )
    cells = ", ".join(
        f"'{name}', n_{i}" for i, name in enumerate(rules)
    )
    stacked = agg.select(
        F.expr(
            f"stack({len(rules) + 1}, {cells}, 'clean', n_clean) AS (rule, n_rows)"
        ),
        "n_checked",
    )
    return stacked.select("rule", "n_rows", "n_checked")
