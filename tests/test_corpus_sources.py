"""Tests for the corpus-format sources/sinks: JSONL (with dead-letter
routing), ORC, and the lang-partitioned corpus layout (pruned scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dffoo_data_pipeline_spark.sources import writers
from dffoo_data_pipeline_spark.sources.readers import load_table, read_jsonl, read_orc

@pytest.fixture(autouse=True)
def _drop_jsonl_cache(spark):
    """read_jsonl caches its frame (the corrupt-record capture contract);
    release it so suite-wide no-cached-RDDs assertions stay meaningful."""
    yield
    spark.catalog.clearCache()


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    p = str(tmp_path / "docs_jsonl")
    writers.write_jsonl(docs, p)
    clean, rejects = read_jsonl(spark, p, DOC_SCHEMA)
    assert rejects.count() == 0
    got = {(r.doc_id, r.lang) for r in clean.collect()}
    want = {(r.doc_id, r.lang) for r in docs.collect()}
    assert got == want


def test_jsonl_dead_letter_routing(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good doc", "lang": "en"}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "text": "another good one", "lang": "de"}\n'
        '{"doc_id": "NOT_A_NUMBER", "text": "type-broken", "lang": "fr"}\n'
    )
    clean, rejects = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    rej = [r._corrupt_record for r in rejects.collect()]
    assert len(rej) == 2
    assert any("not json" in r for r in rej)
    assert any("NOT_A_NUMBER" in r for r in rej)


def test_xml_read_with_dead_letter_routing(spark, tmp_path):
    """Spark 4's native XML reader through the same schema-enforced
    PERMISSIVE + dead-letter contract as the JSONL/CSV sources: well-
    formed records parse typed, a type-broken record routes to the
    reject frame instead of silently nulling or failing the job."""
    from dffoo_data_pipeline_spark.sources.readers import read_xml

    p = tmp_path / "docs.xml"
    p.write_text(
        "<?xml version=\"1.0\"?>\n<docs>\n"
        "<doc><doc_id>1</doc_id><text>good doc</text><lang>en</lang></doc>\n"
        "<doc><doc_id>2</doc_id><text>another good one</text><lang>de</lang></doc>\n"
        "<doc><doc_id>NOT_A_NUMBER</doc_id><text>type-broken</text><lang>fr</lang></doc>\n"
        "</docs>\n"
    )
    clean, rejects = read_xml(spark, str(p), "doc", DOC_SCHEMA)
    try:
        assert {(r.doc_id, r.lang) for r in clean.collect()} == {(1, "en"), (2, "de")}
        rej = [r._corrupt_record for r in rejects.collect()]
        assert len(rej) == 1 and "NOT_A_NUMBER" in rej[0]
    finally:
        spark.catalog.clearCache()


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """write_xml → read_xml reproduces the frame exactly (typed through
    the explicit schema; zero rejects on well-formed output)."""
    from dffoo_data_pipeline_spark.sources.readers import read_xml

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    p = str(tmp_path / "docs_xml")
    writers.write_xml(docs, p, row_tag="doc")
    clean, rejects = read_xml(spark, p, "doc", DOC_SCHEMA)
    try:
        assert rejects.count() == 0
        got = {(r.doc_id, r.lang) for r in clean.collect()}
        want = {(r.doc_id, r.lang) for r in docs.collect()}
        assert got == want
    finally:
        spark.catalog.clearCache()
    # markup characters must survive the escape/unescape roundtrip (the
    # synthetic corpus is plain ASCII words, so cover it explicitly)
    nasty = 'a <b> & "c" </b> done'
    hostile = spark.createDataFrame(
        [(99, nasty, "en")], "doc_id long, text string, lang string"
    )
    p2 = str(tmp_path / "hostile_xml")
    writers.write_xml(hostile, p2, row_tag="doc")
    clean2, rejects2 = read_xml(spark, p2, "doc", DOC_SCHEMA)
    try:
        assert rejects2.count() == 0
        assert clean2.collect()[0].text == nasty
    finally:
        spark.catalog.clearCache()


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_orc")
    writers.write_orc(docs, p)
    back = read_orc(spark, p)
    assert back.count() == docs.count()
    assert dict(back.dtypes) == dict(docs.dtypes)
    # pushdown survives the format: a doc_id filter reaches the ORC scan
    plan = back.where(F.col("doc_id") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80]


def test_partitioned_corpus_prunes_at_plan_time(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "corpus_by_lang")
    writers.write_partitioned_corpus(docs, p, partition_cols=("lang",))
    back = spark.read.parquet(p)
    one_lang = back.where(F.col("lang") == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    # the lang predicate must be a partition filter (directory pruning),
    # not a data filter evaluated per row
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:120]
    assert "lang" in pf
    n_langs = docs.select("lang").distinct().count()
    assert n_langs > 1
    # row parity with the unpartitioned source
    assert one_lang.count() == docs.where(F.col("lang") == "en").count()


def test_jsonl_gzip_roundtrip(spark, sf_dir, tmp_path):
    """Compressed JSONL (the common at-rest corpus form); note whole-file
    gzip is unsplittable — write_jsonl's docstring routes scale users to
    zstd/none."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    p = str(tmp_path / "docs_jsonl_gz")
    writers.write_jsonl(docs, p, compression="gzip")
    import glob

    assert glob.glob(p + "/*.gz"), "expected gzip part files"
    clean, rejects = read_jsonl(spark, p, DOC_SCHEMA)
    assert rejects.count() == 0
    assert clean.count() == docs.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Producers add columns over time; mergeSchema reads old+new batches
    as one table with NULLs where the old batch lacks the column."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "doc_id bigint, text string").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id bigint, text string, lang string"
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(p)
    rows = {r.doc_id: r for r in merged.collect()}
    assert set(merged.columns) >= {"doc_id", "text", "lang"}
    assert rows[1].lang is None and rows[2].lang == "en"
