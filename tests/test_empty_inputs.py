"""Empty-input hardening: operators must return empty results with the
RIGHT schema (not throw) when a filter upstream leaves nothing — at 100 TB
some partition/day/slice is always empty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators import dedup, similarity
from dffoo_data_pipeline_spark.plans.abilities import parse_ability_lines
from dffoo_data_pipeline_spark.schemas import ABILITY_HTML_LINES


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_parse_empty_lines(spark):
    out = parse_ability_lines(spark.createDataFrame([], ABILITY_HTML_LINES))
    assert out.count() == 0
    assert "main_target_hp_attacks" in out.columns


def test_dedup_operators_empty(spark, empty_docs):
    assert dedup.exact_keep_first(empty_docs, "text", "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, "doc_id", "text").count() == 0
    assert dedup.minhash_lsh_candidates(empty_docs, "doc_id", "text").count() == 0
    assert dedup.simhash(empty_docs, "doc_id", "text").count() == 0


def test_similarity_empty(spark):
    e = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = similarity.cosine_topk_bruteforce(e, "vec_id", "embedding", k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos_sim"]
    assert similarity.lsh_topk(e, "vec_id", "embedding", k=3).count() == 0


def test_multimodal_empty(spark):
    from dffoo_data_pipeline_spark.multimodal import (
        byte_histogram_features,
        documents_as_assets,
        frame_sample,
    )

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    a = documents_as_assets(empty)
    assert frame_sample(a).count() == 0
    assert byte_histogram_features(a).count() == 0
