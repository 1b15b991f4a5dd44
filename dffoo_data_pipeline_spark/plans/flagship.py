"""Flagship query — `generate_ability_df` re-expressed declaratively.

The reference's core computation (E2, web_scraper.py:344-567) is: per
entity, accumulate conditional counters over matched lines, apply
correction-table overrides, split "uncapped" rows into a second emitted
row, and project a fixed column order.  This flagship runs that exact
operator chain over the synthetic `lineitem` fact:

  typed projection (P2) → when-ladder classification (A3) → conditional
  sums per entity (A1/A2) → broadcast correction join + COALESCE override
  (J1) → 1→2 uncapped row split via explode (J3/A6) → ordered final
  select (P1).

Scale: one shuffle (groupBy l_orderkey); correction dim broadcast; the
row split is a per-row explode, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_FLAGSHIP_ORACLE = """
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
           CAST(SUM(main_hit) AS BIGINT) AS main_hits,
           CAST(SUM(non_hit)  AS BIGINT) AS non_hits,
           CAST(SUM(cap_up)   AS BIGINT) AS cap_up_perc
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
SELECT entity_id, 'uncapped' AS row_kind, main_hits, non_hits,
       CAST(900 AS BIGINT) AS cap_up_perc
FROM corrected WHERE cap_up_perc >= 60
"""


def flagship_pricing_under_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E2 operator chain (see module docstring) over the
    synthetic lineitem fact: when-ladder classify → one-shuffle
    conditional-sum rollup per entity → broadcast correction override →
    uncapped 1→2 row split via explode → ordered projection.  This is
    the driver's `entry()` smoke query and the headline benchmark
    entry."""
    # No fan-out: the when-ladder + partial agg is cheap relative to the
    # round-robin exchange a local single-split scan would pay (A/B at
    # sf0.1: 0.8s vs 1.5s); on multi-split cluster input fan-out is a
    # no-op anyway, so the flag only ever cost local wall time here.
    li = load_table(spark, sf_dir, "lineitem")
    # A3: when-ladder classification of each source line
    classified = li.select(
        "l_orderkey",
        F.when(F.col("l_linestatus") == "F", 1).otherwise(0).alias("main_hit"),
        F.when(F.col("l_linestatus") == "O", 1).otherwise(0).alias("non_hit"),
        F.when(F.col("l_quantity") >= 45, 10)
        .when(F.col("l_returnflag") == "R", 5)
        .otherwise(0)
        .alias("cap_up"),
    )
    # A1/A2: conditional accumulation per entity (map-side partial agg)
    agged = classified.groupBy(F.col("l_orderkey").alias("entity_id")).agg(
        F.sum("main_hit").alias("main_hits"),
        F.sum("non_hit").alias("non_hits"),
        F.sum("cap_up").alias("cap_up_perc"),
    )
    # J1: bounded correction dim → broadcast left join + COALESCE override
    fix = spark.createDataFrame(
        [(1, 100), (7, 200), (42, 350)], "entity_id bigint, fixed_cap bigint"
    )
    corrected = agged.join(F.broadcast(fix), "entity_id", "left").select(
        "entity_id",
        "main_hits",
        "non_hits",
        F.coalesce("fixed_cap", "cap_up_perc").alias("cap_up_perc"),
    )
    # J3/A6: 1→2 row split — high-cap entities also emit an uncapped row
    variants = F.when(
        F.col("cap_up_perc") >= 60,
        F.array(
            F.struct(F.lit("base").alias("row_kind"), F.col("cap_up_perc").alias("cap")),
            F.struct(F.lit("uncapped").alias("row_kind"), F.lit(900).cast("bigint").alias("cap")),
        ),
    ).otherwise(
        F.array(F.struct(F.lit("base").alias("row_kind"), F.col("cap_up_perc").alias("cap")))
    )
    return (
        corrected.select(
            "entity_id", "main_hits", "non_hits", F.explode(variants).alias("v")
        )
        # P1: fixed final column order
        .select(
            "entity_id",
            F.col("v.row_kind").alias("row_kind"),
            "main_hits",
            "non_hits",
            F.col("v.cap").alias("cap_up_perc"),
        )
    )


QUERIES["flagship_pricing_under_cap"] = flagship_pricing_under_cap
ORACLES["flagship_pricing_under_cap"] = _FLAGSHIP_ORACLE
