"""Scale-behavior evidence: the session's AQE config actually splits
skewed join partitions at runtime (the mechanism we rely on for hot-key
joins at 100 TB, session.py skewJoin settings)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    old = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "spark.sql.adaptive.coalescePartitions.enabled": conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled"
        ),
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # one hot key carrying ~97% of rows + a uniform tail
        left = spark.range(300_000).select(
            F.when(F.col("id") % 30 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        j = left.join(right, "k")
        # drive THIS DataFrame's QueryExecution so the adaptive final plan
        # (with skew annotations) is the one we inspect — .write would
        # execute a separate QueryExecution
        j.foreach(lambda r: None)
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan" in final_plan
        assert "skew=true" in final_plan, final_plan
    finally:
        for k, v in old.items():
            conf.set(k, v)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """The HLL sketch behind agg_approx_distinct (rows-only in the oracle
    contract) stays within its configured relative error vs the exact
    count — the property that makes it usable for 100 TB cardinalities."""
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.count_distinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert got
    for r in got:
        rel_err = abs(r.approx - r.exact) / r.exact
        assert rel_err < 0.05, (r.l_returnflag, r.approx, r.exact)


def test_aqe_broadcasts_unhinted_dims_at_test_scale(spark):
    """Round-2 join policy: explicit broadcast() only marks bounded dims
    (nation/region); customer/supplier/orders/part are unhinted.  This
    pins the claim that AQE's size-based planning still broadcasts them
    at test SF — i.e. dropping the hints cost nothing locally while
    removing the guaranteed-OOM hint at 100 TB."""
    from dffoo_data_pipeline_spark.plans.relational import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["q5_local_supplier_volume"](spark, SF_SMOKE)
    df.foreach(lambda r: None)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan" in plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan
