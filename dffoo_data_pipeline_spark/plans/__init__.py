"""Query plans — the engine's user-facing query surface.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB-runnable ANSI SQL).  The driver
contract (`__spark_entry__.py`) aggregates them; tests replicate the
driver's DuckDB comparison locally.
"""

from __future__ import annotations


def all_queries():
    from dffoo_data_pipeline_spark import multimodal, streaming
    from dffoo_data_pipeline_spark.plans import (
        abilities,
        bt_ha,
        events,
        flagship,
        job,
        llm_ops,
        relational,
    )

    q: dict = {}
    o: dict = {}
    for mod in (relational, flagship, events, llm_ops, abilities, bt_ha, job, streaming, multimodal):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
