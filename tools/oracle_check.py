#!/usr/bin/env python
"""Run declared queries against the DuckDB oracle at one or more SFs.

Usage: python tools/oracle_check.py sf0.001,sf0.01 query [query ...]
       python tools/oracle_check.py sf0.01 @all   (every oracled query)
Prints PASS/FAIL per (sf, query); exits nonzero on any FAIL.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))

from dffoo_data_pipeline_spark.plans import all_queries  # noqa: E402
from dffoo_data_pipeline_spark.session import get_spark  # noqa: E402
from oracle_utils import compare, duckdb_conn  # noqa: E402


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    queries, oracles = all_queries()
    if names == ["@all"]:
        names = sorted(oracles)
    import os

    if os.environ.get("SPARK_GRAFT_STOCK_SESSION") == "1":
        # driver-twin sweep (PERF.md robustness matrix): stock defaults,
        # none of session.get_spark's tuning
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("stock-driver-twin")
            .master("local[32]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb_conn(sf_dir)
        for name in names:
            if name not in oracles:
                print(f"{sf} {name}: SKIP (rows-only)")
                continue
            sdf = queries[name](spark, sf_dir)
            ddf = con.execute(oracles[name]).fetchdf()
            errs = compare(sdf, ddf, name)
            n = sdf.count()
            if errs:
                bad += 1
                print(f"{sf} {name}: FAIL ({n} rows)")
                for e in errs[:5]:
                    print("   ", e)
            else:
                print(f"{sf} {name}: PASS ({n} rows)")
        con.close()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
