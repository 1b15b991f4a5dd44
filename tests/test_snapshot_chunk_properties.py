"""Operator tests the registered proxies can't reach: snapshot_diff's
`changed` branch (the registered query diffs slices of one immutable
table, so nothing ever changes) and property-based chunking invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dffoo_data_pipeline_spark.operators.dedup import snapshot_diff
from dffoo_data_pipeline_spark.plans.corpus import (
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    text_chunk_windows,
)


def test_snapshot_diff_null_text_presence(spark):
    """Presence is tracked by markers, not fingerprint nullness: a doc
    with NULL text in one snapshot and real text in the other is CHANGED
    (it exists in both), never added/removed."""
    old = spark.createDataFrame(
        [(1, None), (2, "same"), (3, None)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, "now has text"), (2, "same"), (3, None)],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "unchanged"}


def test_snapshot_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "kept the same"), (2, "will be edited"), (3, "will be deleted")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, "kept the same"), (2, "was edited here"), (4, "brand new doc")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_normalization_insensitive(spark):
    """Whitespace/case drift between dumps is not a content change —
    the fingerprint is over normalized text."""
    old = spark.createDataFrame([(1, "Hello  World")], "doc_id bigint, text string")
    new = spark.createDataFrame([(1, "hello world")], "doc_id bigint, text string")
    assert snapshot_diff(old, new).collect()[0].status == "unchanged"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=120),  # token counts per doc
        min_size=1,
        max_size=5,
    )
)
def test_chunk_windows_invariants(spark, tmp_path_factory, doc_lengths):
    """Every token is covered, chunk sizes/overlaps honor the config, and
    chunk numbering is dense from 1 — for any document length."""
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(n)))
        for i, n in enumerate(doc_lengths)
    ]
    d = str(tmp_path_factory.mktemp("chunkprop"))
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d + "/documents.parquet")
    out = text_chunk_windows(spark, d).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    for (doc_id, text), n in zip(docs, doc_lengths):
        rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_no)
        assert [r.chunk_no for r in rows] == list(range(1, len(rows) + 1))
        toks = text.split(" ")
        covered = []
        for r in rows:
            assert 1 <= r.n_chunk_tokens <= CHUNK_TOKENS
            covered.extend(r.chunk_text.split(" "))
        # coverage: every token position appears in at least one chunk
        start_positions = [(c - 1) * stride for c in range(1, len(rows) + 1)]
        seen = set()
        for r, s in zip(rows, start_positions):
            assert r.chunk_text.split(" ") == toks[s : s + CHUNK_TOKENS]
            seen.update(range(s, min(s + CHUNK_TOKENS, n)))
        assert seen == set(range(n)), f"doc {doc_id}: uncovered tokens"
