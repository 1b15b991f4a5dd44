"""BPE learning must reproduce the classic sequential algorithm exactly —
merge sequence, tie-breaks, and rewrite semantics — on both a constructed
vocabulary and the real corpus."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators.bpe import (
    EOW,
    learn_bpe_merges,
    merge_adjacent,
    word_symbols,
)


def _reference_bpe(vocab: dict[str, int], n_merges: int):
    """Sennrich-style reference: list of (rank, left, right, count)."""
    state = {tuple(list(w) + [EOW]): f for w, f in vocab.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for sym, f in state.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, c))
        new_state: dict = {}
        for sym, f in state.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_state[key] = new_state.get(key, 0) + f
        state = new_state
    return merges


def test_merge_adjacent_is_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "b"],), (["a", "a", "b"],), (["b", "a", "b", "a"],), (["a"],)],
        "sym array<string>",
    )
    got = [r.m for r in df.select(merge_adjacent(F.col("sym"), "a", "b").alias("m")).collect()]
    assert got == [["ab", "ab"], ["a", "ab"], ["b", "ab", "a"], ["a"]]


def test_word_symbols_chars_plus_eow(spark):
    got = spark.range(1).select(word_symbols(F.lit("hey")).alias("s")).collect()[0].s
    assert got == ["h", "e", "y", EOW]


def test_learn_matches_reference_on_constructed_vocab(spark):
    # 'low'/'lower'/'lowest' family: the classic BPE worked example, plus
    # a tie between ('l','o') cohorts broken lexicographically
    vocab = {"low": 5, "lower": 2, "lowest": 6, "newest": 3, "widest": 2}
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    got = learn_bpe_merges(df, n_merges=6)
    assert got == _reference_bpe(vocab, 6)


def test_registered_query_matches_reference_on_corpus(spark, sf_dir):
    from dffoo_data_pipeline_spark.plans.corpus import N_BPE_MERGES, corpus_bpe_learn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias("w")
    )
    vocab = {r.w: r.c for r in toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()}
    expected = _reference_bpe(vocab, N_BPE_MERGES)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in corpus_bpe_learn(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    assert got == expected


def _reference_encode(word: str, merges) -> int:
    sym = list(word) + [EOW]
    for _, left, right, _ in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sum(1 for s in sym if s != EOW)


def test_apply_matches_reference_encoder(spark):
    vocab = {"low": 5, "lower": 2, "lowest": 6, "newest": 3, "widest": 2}
    merges = _reference_bpe(vocab, 6)
    df = spark.createDataFrame(list(vocab.items()), "word string, freq long")
    from dffoo_data_pipeline_spark.operators.bpe import apply_bpe_merges

    got = {r.word: r.n_bpe_tokens for r in apply_bpe_merges(df, merges).collect()}
    assert got == {w: _reference_encode(w, merges) for w in vocab}


def test_corpus_bpe_encode_matches_reference(spark, sf_dir):
    from dffoo_data_pipeline_spark.plans.corpus import (
        N_BPE_MERGES,
        corpus_bpe_encode,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias("w"),
    ).collect()
    vocab: dict = {}
    for r in toks:
        vocab[r.w] = vocab.get(r.w, 0) + 1
    merges = _reference_bpe(vocab, N_BPE_MERGES)
    expected: dict = {}
    for r in toks:
        nw, nb = expected.get(r.doc_id, (0, 0))
        expected[r.doc_id] = (nw + 1, nb + _reference_encode(r.w, merges))
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in corpus_bpe_encode(spark, sf_dir).collect()
    }
    assert got == expected
