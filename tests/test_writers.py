"""Sink semantics tests (SURVEY.md §2a S5-S7 / §7 M4).

The reference's resume scheme is one CSV per character (web_scraper.py:
1164-1183) and its load is a growing Postgres append table it can only
filter with a timestamp scan (README.md:71).  These tests pin the
cluster-grade equivalents: dynamic-partition-overwrite checkpointing and
run-id-partitioned appends with partition-pruned latest-run reads.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.sources import writers


def _chars_df(spark, rows):
    return spark.createDataFrame(
        rows, "char_name string, game_version string, cap int"
    )


def test_checkpoint_overwrites_only_recomputed_partitions(spark):
    path = tempfile.mkdtemp(prefix="sg_ckpt_sink_") + "/t"
    full = _chars_df(
        spark, [("aerith", "GL", 10), ("auron", "GL", 20), ("aerith", "JP", 30)]
    )
    writers.write_checkpointed(full, path)

    # re-run recomputes ONLY auron with a new value
    rerun = _chars_df(spark, [("auron", "GL", 99)])
    writers.write_checkpointed(rerun, path)

    got = {
        (r.char_name, r.game_version): r.cap for r in spark.read.parquet(path).collect()
    }
    # auron replaced; aerith partitions untouched (dynamic overwrite, not
    # whole-table truncate)
    assert got == {("aerith", "GL"): 10, ("auron", "GL"): 99, ("aerith", "JP"): 30}


def test_run_stamped_append_and_latest_run_pruning(spark):
    path = tempfile.mkdtemp(prefix="sg_runs_") + "/t"
    writers.write_run_stamped(_chars_df(spark, [("aerith", "GL", 10)]), path, "r001")
    writers.write_run_stamped(
        _chars_df(spark, [("aerith", "GL", 11), ("auron", "GL", 20)]), path, "r002"
    )

    # history accumulates (append), latest view sees only the newest run
    assert spark.read.parquet(path).count() == 3
    latest = writers.read_latest_run(spark, path)
    assert {(r.char_name, r.cap) for r in latest.collect()} == {
        ("aerith", 11),
        ("auron", 20),
    }
    # the run_id equality filter must prune at the file listing, not scan
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(run_id" in plan


def test_csv_sink_round_trip(spark):
    path = tempfile.mkdtemp(prefix="sg_csv_") + "/t"
    df = _chars_df(spark, [("aerith", "GL", 10), ("auron", "GL", 20)])
    writers.write_csv(df, path, single_file=True)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 2 and set(back.columns) == {
        "char_name",
        "game_version",
        "cap",
    }
