"""Operator tests for C4-style repeated-unit removal with the REAL unit
(newline-split lines) — the registered query covers the token-window
variant against the oracle."""

from __future__ import annotations

from dffoo_data_pipeline_spark.operators.boilerplate import remove_repeated_units


def test_line_boilerplate_dropped_order_preserved(spark):
    cookie = "accept all cookies"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n{cookie}\nbody text one"),
            (2, f"{cookie}\nbody text two\nfooter two"),
            (3, f"body text three\n{cookie}"),
            (4, "unique only\nno boilerplate here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_units(docs, joiner="\n").collect()}
    # "accept all cookies" appears 3x (> max_occurrences=2) -> dropped
    assert out[1].clean_text == "intro one\nbody text one"
    assert out[2].clean_text == "body text two\nfooter two"
    assert out[3].clean_text == "body text three"
    assert out[4].clean_text == "unique only\nno boilerplate here"
    assert (out[1].n_units, out[1].n_units_dropped) == (3, 1)


def test_fully_boilerplate_doc_survives_empty(spark):
    spam = "buy now"
    docs = spark.createDataFrame(
        [(i, spam) for i in range(5)] + [(99, "real content")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_units(docs).collect()}
    assert len(out) == 6  # no document vanishes from the corpus
    assert out[0].clean_text == "" and out[0].n_units_dropped == 1
    assert out[99].clean_text == "real content"


def test_threshold_boundary_keeps_doubles(spark):
    docs = spark.createDataFrame(
        [(1, "twice seen"), (2, "twice seen"), (3, "solo line")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_units(docs).collect()}
    # exactly 2 occurrences == max_occurrences -> kept
    assert out[1].clean_text == "twice seen"
    assert out[2].clean_text == "twice seen"
    assert out[3].clean_text == "solo line"


def test_every_registered_query_is_documented():
    """Each queries() entry must carry a real docstring — the per-operator
    semantics + scale rationale live there, and an undocumented operator
    is unreviewable."""
    from dffoo_data_pipeline_spark.plans import all_queries

    q, _ = all_queries()
    undocumented = [
        n for n, fn in q.items() if not (fn.__doc__ and len(fn.__doc__.strip()) > 40)
    ]
    assert not undocumented, undocumented
