"""End-to-end batch job test (reference entry point E1).

Runs the composed graph twice and checks the pipeline invariants the
reference wanted but couldn't enforce (README.md:48-75): GL/JP routing,
run-stamp columns, idempotent checkpoints, append history + pruned
latest-run reads.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans import job


def test_full_batch_job_twice(spark):
    out = tempfile.mkdtemp(prefix="sg_job_")

    first = job.run_batch(spark, out, run_id="r001")
    assert set(first) == {
        "raw_abilities",
        "raw_bt_effects",
        "raw_high_armor_caps",
        "__metrics__",
    }
    # observed data-quality counters rode the write job (no extra pass)
    m = first["__metrics__"]["raw_abilities"]
    assert m["n_rows"] > 0 and m["n_chars"] >= 7

    ab = spark.read.parquet(f"{out}/checkpoints/raw_abilities")
    # JP second pass: sherlotta rows exist in both versions, others GL-only
    vers = {
        (r.char_name, r.game_version)
        for r in ab.select("char_name", "game_version").distinct().collect()
    }
    assert ("sherlotta", "JP") in vers and ("sherlotta", "GL") in vers
    assert ("aerith", "JP") not in vers
    # run stamps present and ordered
    bad = ab.filter(
        F.col("scrape_started_at_utc").isNull()
        | (F.col("scrape_ended_at_utc") < F.col("scrape_started_at_utc"))
    )
    assert bad.count() == 0

    # second run: checkpoint row count stable (idempotent overwrite,
    # not append), history doubles, latest-run view sees one run
    n_ckpt_1 = ab.count()
    job.run_batch(spark, out, run_id="r002")
    assert spark.read.parquet(f"{out}/checkpoints/raw_abilities").count() == n_ckpt_1
    hist = spark.read.parquet(f"{out}/runs/raw_abilities")
    assert hist.count() == 2 * n_ckpt_1
    latest = job.latest(spark, out, "raw_abilities")
    assert latest.count() == n_ckpt_1
    assert latest.select("run_id").distinct().collect()[0].run_id == "r002"


def test_pipeline_latest_abilities_golden_content(spark):
    """The registered `pipeline_latest_abilities` query (write → read-back
    of the latest run) must equal the IN-MEMORY build_outputs abilities
    frame — i.e. the sink/read-back round trip adds the run-stamp columns
    and loses nothing else.  Also pins the driver-boundary contract: no
    non-scalar columns (attribute_list is pystr-serialized, the r3/r4
    red-row fix)."""
    from dffoo_data_pipeline_spark.plans.abilities import pystr_list
    from dffoo_data_pipeline_spark.plans.job import (
        build_outputs,
        pipeline_latest_abilities,
    )

    got = pipeline_latest_abilities(spark, "/root/testdata/sf0.001")
    assert all(
        f.dataType.typeName() not in ("array", "map", "struct")
        for f in got.schema.fields
    ), "driver canonicalizer cannot hash non-scalar columns"

    expected = build_outputs(spark)["raw_abilities"].withColumn(
        "attribute_list",
        pystr_list(F.coalesce(F.col("attribute_list"), F.array().cast("array<string>"))),
    )
    # build_outputs is pre-stamping and the sink/read-back round trip
    # adds then drops run_id + scrape stamps: columns must match exactly
    assert set(got.columns) == set(expected.columns)
    key_cols = got.columns
    g = sorted(map(tuple, got.select(*key_cols).collect()))
    e = sorted(map(tuple, expected.select(*key_cols).collect()))
    assert g == e
