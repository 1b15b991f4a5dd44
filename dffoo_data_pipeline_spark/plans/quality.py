"""Data-quality quarantine queries (r12) — the dead-letter gate
(operators/quality.py) over the shared fixture tables.

The r12 hostile sweeps proved every analytics family needs a stance on
NULL keys, timeless rows, dangling FKs, and out-of-domain numerics;
these queries make that stance a *pipeline stage*: classify rows
against a named rule battery, count per rule, and emit per-row
verdicts — run in front of the warehouse, not inside every query.

Non-degenerate on clean data by construction (the Kaplan-Meier lesson,
r11): the report carries n_checked and a 'clean' row (corpus-sized
counts at any SF), and the verdict query emits every row's verdict —
so the driver's clean-data hash certifies the rule battery's
false-positive behavior, while tests/test_hostile_inputs.py pins the
true positives on salted tables value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators.quality import (
    dangling,
    flag_rules,
    quarantine_report,
    with_presence,
)
from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# lineitem quarantine report: NULL/dangling keys + numeric/date domain
# ---------------------------------------------------------------------------

# (rule name, SQL violation predicate over the presence-joined frame)
_LI_RULES_SQL = [
    ("null_orderkey", "l_orderkey IS NULL"),
    ("dangling_orderkey", "l_orderkey IS NOT NULL AND ok_flag IS NULL"),
    ("null_partkey", "l_partkey IS NULL"),
    ("dangling_partkey", "l_partkey IS NOT NULL AND pk_flag IS NULL"),
    ("null_suppkey", "l_suppkey IS NULL"),
    ("dangling_suppkey", "l_suppkey IS NOT NULL AND sk_flag IS NULL"),
    ("null_quantity", "l_quantity IS NULL"),
    ("nonpositive_quantity", "COALESCE(l_quantity <= 0, FALSE)"),
    ("nonpositive_price", "COALESCE(l_extendedprice <= 0, FALSE)"),
    ("null_shipdate", "l_shipdate IS NULL"),
    ("null_status_flags", "l_returnflag IS NULL OR l_linestatus IS NULL"),
]

_LI_REPORT_SQL = (
    """
WITH f AS (
    SELECT l.*,
           o.ok_flag, p.pk_flag, s.sk_flag
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey, TRUE AS ok_flag FROM orders
               WHERE o_orderkey IS NOT NULL) o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN (SELECT DISTINCT p_partkey, TRUE AS pk_flag FROM part
               WHERE p_partkey IS NOT NULL) p ON l.l_partkey = p.p_partkey
    LEFT JOIN (SELECT DISTINCT s_suppkey, TRUE AS sk_flag FROM supplier
               WHERE s_suppkey IS NOT NULL) s ON l.l_suppkey = s.s_suppkey)
"""
    + "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule,"
        f" CAST(SUM(CASE WHEN COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_checked FROM f"
        for name, pred in _LI_RULES_SQL
    )
    + "\nUNION ALL\nSELECT 'clean', CAST(SUM(CASE WHEN NOT ("
    + " OR ".join(f"COALESCE({pred}, FALSE)" for _, pred in _LI_RULES_SQL)
    + ") THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM f"
)


@_register("lineitem_quarantine_report", _LI_REPORT_SQL)
def lineitem_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter rule battery over lineitem: NULL and DANGLING foreign
    keys (orders/part/supplier), NULL/nonpositive quantity, nonpositive
    price, NULL ship date, NULL status flags — per-rule counts plus the
    clean count, one row per rule.

    Scale: three distinct-key presence joins (part/supplier broadcast
    at any realistic dim size; lineitem->orders is a fact-fact equi-join
    on the key both tables are bucketed by — co-partitioned, no
    broadcast assumption), then ONE map-side-combined conditional
    aggregation; the per-rule unpivot runs on the single aggregate row.
    All predicates are NULL-definite (coalesced to FALSE) in BOTH
    engines — the three-valued-logic rule from the r11 gopher fix.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    f = with_presence(li, "l_orderkey", o, "o_orderkey", "ok_flag")
    f = with_presence(f, "l_partkey", p, "p_partkey", "pk_flag", broadcast=True)
    f = with_presence(f, "l_suppkey", s, "s_suppkey", "sk_flag", broadcast=True)
    rules = {
        "null_orderkey": F.col("l_orderkey").isNull(),
        "dangling_orderkey": dangling("l_orderkey", "ok_flag"),
        "null_partkey": F.col("l_partkey").isNull(),
        "dangling_partkey": dangling("l_partkey", "pk_flag"),
        "null_suppkey": F.col("l_suppkey").isNull(),
        "dangling_suppkey": dangling("l_suppkey", "sk_flag"),
        "null_quantity": F.col("l_quantity").isNull(),
        "nonpositive_quantity": F.col("l_quantity") <= 0,
        "nonpositive_price": F.col("l_extendedprice") <= 0,
        "null_shipdate": F.col("l_shipdate").isNull(),
        "null_status_flags": F.col("l_returnflag").isNull()
        | F.col("l_linestatus").isNull(),
    }
    return quarantine_report(f, rules)


# ---------------------------------------------------------------------------
# orders per-row verdicts: every row's is_clean + sorted reason list
# ---------------------------------------------------------------------------

_ORD_RULES_SQL = [
    ("dangling_custkey", "o_custkey IS NOT NULL AND ck_flag IS NULL"),
    ("nonpositive_totalprice", "COALESCE(o_totalprice <= 0, FALSE)"),
    ("null_custkey", "o_custkey IS NULL"),
    ("null_orderdate", "o_orderdate IS NULL"),
    ("null_status", "o_orderstatus IS NULL"),
    ("null_totalprice", "o_totalprice IS NULL"),
]

_ORD_VERDICTS_SQL = (
    """
WITH f AS (
    SELECT o.*, c.ck_flag
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey, TRUE AS ck_flag FROM customer
               WHERE c_custkey IS NOT NULL) c ON o.o_custkey = c.c_custkey)
SELECT o_orderkey,
       ("""
    + " OR ".join(f"COALESCE({pred}, FALSE)" for _, pred in _ORD_RULES_SQL)
    + """) = FALSE AS is_clean,
       COALESCE(array_to_string(list_sort(list_filter(["""
    + ", ".join(
        f"CASE WHEN COALESCE({pred}, FALSE) THEN '{name}' END"
        for name, pred in _ORD_RULES_SQL
    )
    + """], x -> x IS NOT NULL)), ','), '') AS reasons
FROM f
"""
)


@_register("orders_quarantine_verdicts", _ORD_VERDICTS_SQL)
def orders_quarantine_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row dead-letter verdicts over orders: every order's is_clean
    flag and its SORTED, comma-joined violation list (empty for clean
    rows) — the row-level routing output a quarantine sink consumes
    (operators/quality.py:quarantine splits on exactly this).

    Emitting EVERY row (not just violators) keeps the driver's
    clean-data certification meaningful: the hash pins that the battery
    raises no false positives corpus-wide; the hostile fixture pins the
    true positives.

    Scale: one broadcast presence join (distinct customer keys) + a
    map-side projection — no shuffle beyond the join.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    f = with_presence(o, "o_custkey", c, "c_custkey", "ck_flag", broadcast=True)
    rules = {
        "dangling_custkey": dangling("o_custkey", "ck_flag"),
        "nonpositive_totalprice": F.col("o_totalprice") <= 0,
        "null_custkey": F.col("o_custkey").isNull(),
        "null_orderdate": F.col("o_orderdate").isNull(),
        "null_status": F.col("o_orderstatus").isNull(),
        "null_totalprice": F.col("o_totalprice").isNull(),
    }
    flagged = flag_rules(f, rules)
    return flagged.select(
        "o_orderkey",
        "is_clean",
        F.concat_ws(",", "reasons").alias("reasons"),
    )


# ---------------------------------------------------------------------------
# embeddings quarantine: the FINITE-DOMAIN vector contract, enforced
# ---------------------------------------------------------------------------

_EMB_DIM = 64  # the fixture corpus's embedding dimensionality

_EMB_RULES_SQL = [
    ("null_vector", "embedding IS NULL"),
    (
        "wrong_dim",
        f"embedding IS NOT NULL AND len(embedding) <> {_EMB_DIM}",
    ),
    (
        "nonfinite_component",
        "embedding IS NOT NULL AND list_aggregate(list_transform(embedding,"
        " x -> CAST(isnan(x) OR isinf(x) AS INT)), 'sum') > 0",
    ),
    (
        "null_component",
        "embedding IS NOT NULL AND list_aggregate(list_transform(embedding,"
        " x -> CAST(x IS NULL AS INT)), 'sum') > 0",
    ),
    (
        "zero_norm",
        "embedding IS NOT NULL AND list_aggregate(list_transform(embedding,"
        " x -> CAST(x AS DOUBLE) * x), 'sum') = 0",
    ),
    ("null_label", "label IS NULL"),
]

_EMB_REPORT_SQL = (
    "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule,"
        f" CAST(SUM(CASE WHEN COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_checked FROM embeddings"
        for name, pred in _EMB_RULES_SQL
    )
    + "\nUNION ALL\nSELECT 'clean', CAST(SUM(CASE WHEN NOT ("
    + " OR ".join(f"COALESCE({pred}, FALSE)" for _, pred in _EMB_RULES_SQL)
    + ") THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM embeddings"
)


@_register("embeddings_quarantine_report", _EMB_REPORT_SQL)
def embeddings_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-domain contract as an enforceable gate: NULL vectors,
    wrong dimensionality, NON-FINITE components, zero norms, NULL
    labels.  The r12 NaN/Inf sweep showed WHY this is a contract and
    not per-query defense: a single Inf component crashes every
    DECIMAL-exactness oracle (Inf/NaN are unrepresentable in DECIMAL,
    the repo's cross-engine arithmetic backbone) and poisons every
    float kernel downstream — 29/29 embeddings oracles fail on one bad
    vector.  Like the 2-decimal money contract, the domain is enforced
    at INGEST (this gate / its streaming twin) rather than re-checked
    inside 29 hot paths; the ANN operators keep only the cheap NULL /
    zero-norm boundary filters they already have (r11).

    Scale: pure map-side predicates over the vector column (higher-
    order functions, JVM-side — no Python crossing), one conditional
    aggregation, |rules|+1 output rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x * x,
    )
    nonfinite = F.exists(
        "embedding",
        lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    rules = {
        "null_vector": F.col("embedding").isNull(),
        "wrong_dim": F.col("embedding").isNotNull()
        & (F.size("embedding") != _EMB_DIM),
        "nonfinite_component": F.col("embedding").isNotNull() & nonfinite,
        "null_component": F.col("embedding").isNotNull()
        & F.exists("embedding", lambda x: x.isNull()),
        "zero_norm": F.col("embedding").isNotNull() & (sumsq == 0),
        "null_label": F.col("label").isNull(),
    }
    return quarantine_report(e, rules)


# ---------------------------------------------------------------------------
# documents quarantine: the text-corpus domain contract, enforced
# ---------------------------------------------------------------------------

_DOC_MAX_CHARS = 200_000  # oversize gate (chars); tune per-corpus

_DOC_RULES_SQL = [
    (
        "char_count_mismatch",
        "n_chars IS DISTINCT FROM length(text)",
    ),
    ("null_lang", "lang IS NULL"),
    ("null_source", "source IS NULL"),
    ("null_text", "text IS NULL"),
    (
        "oversized",
        f"COALESCE(length(text) > {_DOC_MAX_CHARS}, FALSE)",
    ),
    (
        "zero_tokens",
        "text IS NOT NULL AND len(list_filter("
        "string_split_regex(text, '\\s+'), t -> t <> '')) = 0",
    ),
]

_DOC_REPORT_SQL = (
    "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule,"
        f" CAST(SUM(CASE WHEN COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_checked FROM documents"
        for name, pred in _DOC_RULES_SQL
    )
    + "\nUNION ALL\nSELECT 'clean', CAST(SUM(CASE WHEN NOT ("
    + " OR ".join(f"COALESCE({pred}, FALSE)" for _, pred in _DOC_RULES_SQL)
    + ") THEN 1 ELSE 0 END) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM documents"
)


@_register("documents_quarantine_report", _DOC_REPORT_SQL)
def documents_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-corpus gate, completing the quarantine family across all
    four salted tables: NULL text, ZERO-TOKEN docs (empty/whitespace-
    only/exotic-whitespace — the r11 sweep's phantom-token classes,
    detected with the engine's own non-empty-token tokenizer spec so
    the gate and the corpus statistics agree on what "no tokens"
    means), NULL lang/source, an n_chars-vs-length consistency check
    (null-safe: IS DISTINCT FROM in SQL, negated eqNullSafe in Spark),
    and an oversize gate (a single multi-MB document dominates shingle
    posting lists and Arrow batch sizes downstream — cap and route to
    a long-document pipeline instead).

    Scale: pure map-side predicates (the tokenizer is one JVM regex
    pass), one conditional aggregation, |rules|+1 rows out.
    """
    from dffoo_data_pipeline_spark.functions import text as TXT

    d = load_table(spark, sf_dir, "documents")
    rules = {
        "char_count_mismatch": ~F.col("n_chars").eqNullSafe(F.length("text")),
        "null_lang": F.col("lang").isNull(),
        "null_source": F.col("source").isNull(),
        "null_text": F.col("text").isNull(),
        "oversized": F.length("text") > _DOC_MAX_CHARS,
        "zero_tokens": F.col("text").isNotNull()
        & (F.size(TXT.tokens("text")) == 0),
    }
    return quarantine_report(d, rules)
