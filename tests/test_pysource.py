"""Custom Python DataSource (sources/pysource.py): batch parity,
partition-per-character parallelism, filter pushdown pruning, and the
streaming offset/resume contract."""

from __future__ import annotations

import tempfile

from dffoo_data_pipeline_spark.fixtures import GOLDEN_FIXTURES, ability_line_rows
from dffoo_data_pipeline_spark.sources import pysource


def _read(spark):
    return pysource.read_charwiki(spark)


def test_batch_read_matches_fixture_and_parallelizes(spark):
    df = _read(spark)
    got = {tuple(r) for r in df.collect()}
    want = set(ability_line_rows())
    assert got == want
    # one partition per character — the scrape loop, parallelized
    assert df.rdd.getNumPartitions() == len(GOLDEN_FIXTURES)


def test_filter_pushdown_prunes_partitions(spark):
    f = _read(spark).where("char_name = 'aerith'")
    assert f.rdd.getNumPartitions() == 1  # pruned BEFORE the fetch
    got = {tuple(r) for r in f.collect()}
    want = {r for r in ability_line_rows() if r[0] == "aerith"}
    assert got == want


def test_option_switches_game_version(spark):
    jp = pysource.read_charwiki(spark, game_version="JP")
    assert jp.select("game_version").distinct().collect()[0][0] == "JP"


def test_stock_session_pushdown_off_still_reads(spark):
    """The foreign-driver shape: spark.sql.python.filterPushdown.enabled
    at its STOCK DEFAULT (false).  Spark 4.1 hard-errors on any reader
    that defines pushFilters under that conf, so read_charwiki must
    negotiate down to the base reader — same rows, filter evaluated
    post-scan instead of pruning partitions.  (Caught live by the
    round-7 stock-driver-twin sweep: abilities_from_pysource was the
    one red in an otherwise green 244-test run.)"""
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        df = pysource.read_charwiki(spark).where("char_name = 'aerith'")
        # NOT pruned (no pushdown path) — but correct, and no planning error
        assert df.rdd.getNumPartitions() == len(GOLDEN_FIXTURES)
        got = {tuple(r) for r in df.collect()}
        want = {r for r in ability_line_rows() if r[0] == "aerith"}
        assert got == want
        # option-based pruning stays available without pushdown
        one = pysource.read_charwiki(spark, char_name="aerith")
        assert one.rdd.getNumPartitions() == 1
    finally:
        spark.conf.set(conf_key, prior)


def test_stream_delivers_all_characters_and_resumes(spark):
    """One character per micro-batch; a restart on the same checkpoint
    resumes from the committed offset with no re-delivery (parquet sink
    — the memory sink cannot recover from a checkpoint)."""
    pysource.register(spark)
    ckpt = tempfile.mkdtemp(prefix="sg_wiki_ckpt_")
    out = tempfile.mkdtemp(prefix="sg_wiki_out_") + "/t"

    def run_once():
        q = (
            spark.readStream.format("charwiki")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    got = spark.read.parquet(out)
    assert got.count() == len(ability_line_rows())
    assert got.select("char_name").distinct().count() == len(GOLDEN_FIXTURES)

    # restart on the same checkpoint: offset committed, source exhausted
    # -> exactly-once, no re-scrape, no duplicate rows
    run_once()
    assert spark.read.parquet(out).count() == len(ability_line_rows())


def test_parse_over_pysource_matches_parse_over_fixture(spark, sf_dir):
    from dffoo_data_pipeline_spark.plans.abilities import (
        abilities_from_pysource,
        abilities_parse,
    )

    via_source = {tuple(r) for r in abilities_from_pysource(spark, sf_dir).collect()}
    via_fixture = {tuple(r) for r in abilities_parse(spark, sf_dir).collect()}
    assert via_source == via_fixture
