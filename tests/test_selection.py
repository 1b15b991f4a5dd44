"""Constructed-fixture semantics for the data-selection operators.

The oracle tests prove Spark↔DuckDB equality; these prove the operators
mean what they claim on inputs where the right answer is known by
construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans.selection import (
    W_SPAN,
    curation_dsir_resample,
    dedup_duplicate_spans,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly W_SPAN tokens
UNIQUE_A = "one two three four five six seven"
UNIQUE_B = "red orange yellow green blue indigo violet"
UNIQUE_C = "lorem ipsum dolor sit amet consectetur adipiscing elitum novum"


@pytest.fixture(scope="module")
def span_docs(spark, tmp_path_factory):
    """doc 1 and 2 share one W_SPAN-token span inside unique padding;
    doc 3 is entirely unique.  Written as a parquet 'documents' table so
    the registered queries run on it unchanged."""
    assert len(SHARED.split()) == W_SPAN
    rows = [
        (1, f"{UNIQUE_A} {SHARED}", "en", "web", 0),
        (2, f"{SHARED} {UNIQUE_B}", "en", "web", 0),
        (3, UNIQUE_C, "en", "web", 0),
    ]
    d = tmp_path_factory.mktemp("span_docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_duplicate_spans_flags_only_sharing_docs(spark, span_docs):
    got = {r.doc_id: r for r in dedup_duplicate_spans(spark, span_docs).collect()}
    # the shared span sits at one W-window position in each doc => exactly
    # one duplicated window each; doc 3 has none
    assert got[1].n_dup_windows == 1 and got[2].n_dup_windows == 1
    assert got[3].n_dup_windows == 0 and got[3].drop_flag == 0
    # 15 tokens => 8 windows; 1/8 = 0.125 < 0.2 threshold
    assert got[1].n_windows == 8 and got[1].dup_frac == 0.125
    assert got[1].drop_flag == 0


def test_duplicate_span_removal_excises_exactly_the_shared_span(spark, span_docs):
    from dffoo_data_pipeline_spark.plans.selection import corpus_duplicate_span_removal

    got = {r.doc_id: r for r in corpus_duplicate_span_removal(spark, span_docs).collect()}
    assert got[1].clean_text == UNIQUE_A
    assert got[2].clean_text == UNIQUE_B.lower()
    assert got[3].clean_text == UNIQUE_C
    assert got[1].n_kept_tokens == 7 and got[1].n_tokens == 15


def test_dsir_weights_prefer_target_like_docs(spark, sf_dir):
    """Docs whose hashed-unigram profile matches the 'en' slice must
    outscore the corpus-average doc: mean dsir_logw over en docs > mean
    over non-en docs (this is the defining property of the importance
    ratio, not a statistical accident of the fixture)."""
    from dffoo_data_pipeline_spark.plans.selection import curation_dsir_weights

    means = {
        r.is_en: r.m
        for r in curation_dsir_weights(spark, sf_dir)
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("dsir_logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_dsir_resample_is_deterministic_and_weight_biased(spark, sf_dir):
    a = curation_dsir_resample(spark, sf_dir).collect()
    b = curation_dsir_resample(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded => rerunnable
    ranks = {r.sample_rank for r in a}
    assert ranks == set(range(1, len(a) + 1))  # dense ranks, no ties lost
