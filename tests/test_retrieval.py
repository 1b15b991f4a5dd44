"""Constructed-fixture semantics + invariants for the retrieval module
(BM25, hashed linear classifier, content-defined chunking).

The oracle tests prove Spark↔DuckDB equality; these prove the operators
mean what they claim on inputs where the right answer is known by
construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.retrieval import (
    BM25_TOP_K,
    text_bm25_topk,
    text_cdc_chunks,
    text_classifier_score,
)

_PAD = "lorem ipsum dolor sit amet consectetur adipiscing"


def _write_docs(spark, tmp_path_factory, name, rows):
    d = tmp_path_factory.mktemp(name)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bm25_docs(spark, tmp_path_factory):
    """doc 1 is saturated with the q_join terms, doc 2 mentions them once
    inside padding, doc 3 is unrelated."""
    rows = [
        (1, "hash join table hash join table hash join table", "en", "web", 0),
        (2, f"{_PAD} hash join table {_PAD}", "en", "web", 0),
        (3, f"{_PAD} {_PAD}", "en", "web", 0),
    ]
    return _write_docs(spark, tmp_path_factory, "bm25_docs", rows)


def test_bm25_ranks_term_saturated_doc_first(spark, bm25_docs):
    got = [
        (r.doc_id, r.bm25)
        for r in text_bm25_topk(spark, bm25_docs)
        .where(F.col("query_id") == "q_join")
        .orderBy("bm25_rank")
        .collect()
    ]
    assert [d for d, _ in got] == [1, 2]  # doc 3 shares no term => absent
    assert got[0][1] > got[1][1] > 0


def test_bm25_rank_contract_on_corpus(spark, sf_dir):
    df = text_bm25_topk(spark, sf_dir)
    per_q = (
        df.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("bm25_rank").alias("lo"),
            F.max("bm25_rank").alias("hi"),
            F.min("bm25").alias("minscore"),
        )
        .collect()
    )
    assert per_q, "query set must hit the corpus"
    for r in per_q:
        assert r.lo == 1 and r.hi == r.n <= BM25_TOP_K
        assert r.minscore > 0
    # scores non-increasing in rank within each query
    bad = (
        df.alias("a")
        .join(df.alias("b"), ["query_id"])
        .where((F.col("a.bm25_rank") < F.col("b.bm25_rank")) & (F.col("a.bm25") < F.col("b.bm25")))
        .count()
    )
    assert bad == 0


# ---------------------------------------------------------------------------
# Hashed linear classifier
# ---------------------------------------------------------------------------


def test_classifier_score_bounds_and_consistency(spark, sf_dir):
    df = text_classifier_score(spark, sf_dir)
    n = df.count()
    assert df.where((F.col("clf_score") <= 0) | (F.col("clf_score") >= 1)).count() == 0
    assert df.where(F.col("keep_flag") != (F.col("clf_logit") >= 0).cast("int")).count() == 0
    # sigmoid midpoint: logit >= 0 <=> score >= 0.5 (rounding-safe side)
    assert df.where((F.col("keep_flag") == 1) & (F.col("clf_score") < 0.5)).count() == 0
    assert df.where(F.col("n_tokens") <= 0).count() == 0
    assert n > 0


def test_classifier_identical_texts_identical_scores(spark, tmp_path_factory):
    rows = [
        (1, "alpha beta gamma delta", "en", "web", 0),
        (2, "alpha beta gamma delta", "en", "web", 0),
        (3, "completely different words here", "en", "web", 0),
    ]
    d = _write_docs(spark, tmp_path_factory, "clf_docs", rows)
    got = {r.doc_id: r for r in text_classifier_score(spark, d).collect()}
    assert got[1].clf_logit == got[2].clf_logit
    assert got[1].clf_score == got[2].clf_score


# ---------------------------------------------------------------------------
# Content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_partition_each_document(spark, sf_dir):
    chunks = text_cdc_chunks(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_tok")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.min("start_pos").alias("first"),
        F.max("end_pos").alias("last"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_id").alias("max_chunk"),
    )
    j = per_doc.join(docs, "doc_id")
    assert j.where(F.col("tok_sum") != F.col("n_tok")).count() == 0
    assert j.where((F.col("first") != 1) | (F.col("last") != F.col("n_tok"))).count() == 0
    assert j.where(F.col("max_chunk") != F.col("n_chunks")).count() == 0
    # spans tile without gaps: end_pos - start_pos + 1 == n_tokens per chunk
    assert chunks.where(
        F.col("end_pos") - F.col("start_pos") + 1 != F.col("n_tokens")
    ).count() == 0


def test_cdc_boundaries_survive_prefix_edit(spark, tmp_path_factory):
    """The content-defined property: prepending text re-chunks only the
    prefix neighborhood — every chunk of the original after its first
    boundary reappears, hash-identical, in the edited document."""
    body = " ".join(f"tok{i % 37}x{i % 11}" for i in range(120))
    rows = [
        (1, body, "en", "web", 0),
        (2, f"inserted preamble tokens here {body}", "en", "web", 0),
    ]
    d = _write_docs(spark, tmp_path_factory, "cdc_docs", rows)
    out = text_cdc_chunks(spark, d).orderBy("doc_id", "chunk_id").collect()
    h1 = [r.chunk_hash for r in out if r.doc_id == 1]
    h2 = [r.chunk_hash for r in out if r.doc_id == 2]
    assert len(h1) >= 2, "fixture must produce multiple chunks"
    tail = h1[1:]  # first chunk's start is the doc start => changed by the edit
    assert h2[-len(tail):] == tail


def test_bm25_plan_broadcasts_query_probe(spark, sf_dir):
    """The query-term dim must reach the corpus-sized tf table as a
    broadcast — a shuffled or (worse) cartesian probe would turn the
    retrieval into a corpus reshuffle per query set."""
    plan = text_bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the two single-row stats
    # broadcasts (avgdl / n_docs)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_classifier_train_learns_past_majority(spark):
    """The trained model must actually separate: scoring the training
    corpus with the returned weights beats the majority-class baseline
    by a wide margin (0.936 vs 0.512 measured at sf0.01)."""
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions import text as TX
    from dffoo_data_pipeline_spark.plans.retrieval import (
        N_TRAIN_BUCKETS,
        text_classifier_train,
    )
    from dffoo_data_pipeline_spark.sources.readers import load_table

    sf_dir = "/root/testdata/sf0.01"
    model = {r.bucket: r.w for r in text_classifier_train(spark, sf_dir).collect()}
    bias = model.pop(-1)
    assert len(model) == N_TRAIN_BUCKETS

    d = load_table(spark, sf_dir, "documents")
    feat = (
        d.select(
            "doc_id",
            (F.col("n_chars") >= 300).cast("int").alias("y"),
            F.explode(TX.tokens(TX.normalized_text("text"))).alias("tok"),
        )
        .select(
            "doc_id",
            "y",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
                % N_TRAIN_BUCKETS
            ).alias("bucket"),
        )
        .groupBy("doc_id", "y", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    win_s = feat.groupBy("bucket").agg(F.sum("tf").alias("s"))
    n_docs = feat.select("doc_id").distinct().count()
    warr = F.array(*[F.lit(model[i]) for i in range(N_TRAIN_BUCKETS)])
    scored = (
        feat.join(win_s, "bucket")
        .withColumn("x", F.col("tf") - F.col("s") / F.lit(n_docs))
        .withColumn("wx", F.element_at(warr, F.col("bucket").cast("int") + 1) * F.col("x"))
        .groupBy("doc_id", "y")
        .agg((F.sum("wx") + F.lit(bias)).alias("margin"))
    )
    acc_row = scored.select(
        F.avg(((F.col("margin") >= 0) == (F.col("y") == 1)).cast("double")).alias("acc"),
        F.avg(F.col("y").cast("double")).alias("base"),
    ).collect()[0]
    assert acc_row.acc >= 0.9, acc_row
    assert acc_row.acc >= acc_row.base + 0.3
