"""Registered table-profile queries (operators/profile.py).

The oracle is generated per column from the same (name, kind) spec the
Spark operator derives from the schema, so both sides always profile the
identical column set with identical type mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dffoo_data_pipeline_spark.operators.profile import profile_table
from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_LINEITEM_COLS = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _branch(table: str, c: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn, mx = f"CAST(epoch_us(MIN({c})) AS DOUBLE)", f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        mns, mxs = f"MIN({c})", f"MAX({c})"
    return (
        f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"{mn} AS min_num, {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str "
        f"FROM {table}"
    )


_PROFILE_LINEITEM_ORACLE = "\nUNION ALL\n".join(
    _branch("lineitem", c, k) for c, k in _LINEITEM_COLS
)


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of every lineitem column (exact distincts so the
    oracle can hash-check; `profile_table(df, approx=True)` is the
    100 TB variant — HLL distincts, no Expand, same schema)."""
    return profile_table(load_table(spark, sf_dir, "lineitem", fan_out=True))


QUERIES["profile_lineitem"] = profile_lineitem
ORACLES["profile_lineitem"] = _PROFILE_LINEITEM_ORACLE
