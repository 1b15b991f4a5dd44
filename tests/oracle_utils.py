"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares row-count + schema + order-insensitive value hash.
We normalize both sides to pandas, sort columns by name and rows by all
values, and compare cell-by-cell (with float tolerance as a diagnostic
aid — the real gate is exact equality after the plans' own rounding).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from dffoo_data_pipeline_spark.schemas import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif df[c].dtype.kind in "iu":
            # keep integer columns integer — the driver's value hash is
            # type-sensitive, so an int column must stay distinguishable
            # from a float column (see dtype-kind gate in compare())
            df[c] = df[c].astype("int64")
        else:
            try:
                df[c] = df[c].astype("float64")
            except (TypeError, ValueError):
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame, name: str, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    Driver-strict: if one engine yields an integer-kind column and the
    other a float-kind column (the classic symptom: an uncast DuckDB
    ``SUM()`` returning HUGEINT, fetched as float64, vs Spark's BIGINT),
    that is an error even when the values are numerically identical —
    the driver's exact value hash rejects it.  This is precisely the bug
    class the old everything-to-float64 normalization masked (two red
    driver rows shipped through a green local suite in round 2).
    """
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        errs.append(f"{name}: columns differ spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(sp) != len(duck_df):
        errs.append(f"{name}: row count spark={len(sp)} duck={len(duck_df)}")
        return errs
    for c in sorted(sp.columns):
        ka, kb = sp[c].dtype.kind, duck_df[c].dtype.kind
        if (ka in "iu") != (kb in "iu") and {ka, kb} <= set("iuf"):
            errs.append(
                f"{name}: col {c}: int-vs-float dtype divergence "
                f"(spark={sp[c].dtype} duck={duck_df[c].dtype}) — driver hash "
                f"would fail; cast the oracle (e.g. CAST(SUM(..) AS BIGINT)) "
                f"or the Spark column so the engines agree"
            )
    if errs:
        return errs
    a, b = _normalize(sp), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x_na = x is None or (not isinstance(x, str) and pd.isna(x))
            y_na = y is None or (not isinstance(y, str) and pd.isna(y))
            if x_na and y_na:
                continue
            if x_na != y_na:
                errs.append(f"{name}: col {c} row {i}: {x!r} != {y!r}")
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x == y or abs(x - y) <= float_tol * max(1.0, abs(x), abs(y)):
                    continue
                errs.append(f"{name}: col {c} row {i}: {x!r} != {y!r}")
            elif x != y:
                errs.append(f"{name}: col {c} row {i}: {x!r} != {y!r}")
            if len(errs) >= 5:
                return errs
    return errs
