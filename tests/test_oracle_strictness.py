"""Regression tests for the driver-strict oracle comparison.

Round 2 shipped two red driver rows (`flagship_pricing_under_cap`,
`events_sessionization`) through a 210-green local suite because
`oracle_utils.compare` normalized every numeric column to float64 with a
1e-9 tolerance — masking exactly the bug the driver's exact value hash
rejects: an uncast DuckDB ``SUM()`` returns HUGEINT (fetched as float64)
where Spark returns BIGINT.  These tests pin the gate: the OLD (uncast)
flagship oracle must now FAIL locally, and the fixed one must pass.
"""

from __future__ import annotations

import pandas as pd
import pytest

from dffoo_data_pipeline_spark.plans.flagship import (
    _FLAGSHIP_ORACLE,
    flagship_pricing_under_cap,
)
from tests.oracle_utils import compare, duckdb_conn

# the round-2 oracle, verbatim bug: uncast SUM()s and an INTEGER 900 literal
_OLD_FLAGSHIP_ORACLE = """
WITH classified AS (
    SELECT l_orderkey,
           CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS main_hit,
           CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS non_hit,
           CASE WHEN l_quantity >= 45 THEN 10
                WHEN l_returnflag = 'R' THEN 5
                ELSE 0 END AS cap_up
    FROM lineitem
),
agged AS (
    SELECT l_orderkey AS entity_id,
           SUM(main_hit) AS main_hits,
           SUM(non_hit)  AS non_hits,
           SUM(cap_up)   AS cap_up_perc
    FROM classified GROUP BY l_orderkey
),
fix(entity_id, fixed_cap) AS (VALUES (1, 100), (7, 200), (42, 350)),
corrected AS (
    SELECT a.entity_id, a.main_hits, a.non_hits,
           COALESCE(f.fixed_cap, a.cap_up_perc) AS cap_up_perc
    FROM agged a LEFT JOIN fix f ON a.entity_id = f.entity_id
)
SELECT entity_id, 'base' AS row_kind, main_hits, non_hits, cap_up_perc
FROM corrected
UNION ALL
SELECT entity_id, 'uncapped' AS row_kind, main_hits, non_hits, 900 AS cap_up_perc
FROM corrected WHERE cap_up_perc >= 60
"""


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


def test_old_flagship_oracle_is_rejected(spark, sf_dir, duck):
    """Values are numerically identical, but the HUGEINT-vs-BIGINT dtype
    divergence must be flagged — this is the driver's hash-fail mode."""
    df = flagship_pricing_under_cap(spark, sf_dir)
    expected = duck.execute(_OLD_FLAGSHIP_ORACLE).fetchdf()
    errs = compare(df, expected, "flagship_old_oracle")
    assert errs, "old uncast oracle must be rejected by the strict compare"
    assert any("int-vs-float dtype divergence" in e for e in errs)


def test_fixed_flagship_oracle_passes(spark, sf_dir, duck):
    df = flagship_pricing_under_cap(spark, sf_dir)
    expected = duck.execute(_FLAGSHIP_ORACLE).fetchdf()
    assert compare(df, expected, "flagship_fixed_oracle") == []


def test_uncast_duckdb_sum_unit():
    """Pure-pandas unit pin: duckdb fetches HUGEINT SUM as float64; an
    int64 frame on the other side must be a dtype-divergence error even
    though the values are equal."""
    import duckdb

    con = duckdb.connect()
    hugeint = con.execute("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)").fetchdf()
    assert hugeint["s"].dtype.kind == "f", "precondition: HUGEINT fetches as float"

    class _FakeSparkDF:
        def toPandas(self):
            return pd.DataFrame({"s": pd.Series([3], dtype="int64")})

    errs = compare(_FakeSparkDF(), hugeint, "unit")
    assert errs and "int-vs-float dtype divergence" in errs[0]
    con.close()


@pytest.mark.parametrize("sf_dir_checked", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_stop_shingle_guard_is_noop_at_oracle_scales(spark, sf_dir_checked):
    """Several long-certified oracled queries run guarded operators
    (ngram_jaccard_pairs / shingle_containment_pairs with
    max_doc_frequency=1000) against guard-FREE oracle SQL.  That is only
    exact while no 3-gram shingle reaches 1000 documents at the driver's
    comparison scales — this sentinel pins that precondition, so a future
    testdata change that grows a hot shingle fails HERE, loudly, instead
    of as a silent value divergence in a driver round.  (The round-8
    portable family already passes explicit Nones; this covers the
    r01/r02-certified Jaccard/containment family without touching their
    proven oracles.)"""
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.operators.dedup import _shingles_udf

    d = spark.read.parquet(f"{sf_dir_checked}/documents.parquet")
    df_max = (
        d.select(F.explode(_shingles_udf(3)(F.col("text"))).alias("sh"), "doc_id")
        .distinct()
        .groupBy("sh")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    # 1000 is the operators' default max_doc_frequency; require 2x headroom
    assert df_max <= 500, (
        f"max shingle doc-frequency {df_max} at {sf_dir_checked} is within 2x of "
        "the 1000 stop-shingle guard — the guarded operators and their "
        "guard-free oracles are about to diverge; either add the guard to "
        "the oracle SQL or pass max_doc_frequency=None in the registered plans"
    )
