"""BPE merge learning — tokenizer induction over the corpus vocabulary.

Classic byte-pair-encoding vocabulary learning (Sennrich et al. 2016):
start from characters (+ an end-of-word marker), repeatedly count
adjacent symbol pairs across the frequency-weighted word vocabulary,
merge the most frequent pair, repeat.  A pretraining pipeline runs this
once per tokenizer refresh; the output merge table IS the tokenizer.

Spark shape: BPE statistics live on the WORD VOCABULARY (word → corpus
frequency), not the corpus — one corpus-sized aggregation up front, then
every learning round touches only the vocab table (millions of rows at
web scale, not billions of tokens).  Each round is:

  1. pair counting — explode adjacent symbol positions, SUM word
     frequencies per (left, right) pair (one vocab-sized shuffle with
     map-side combine);
  2. argmax — orderBy + limit(1): TakeOrderedAndProject keeps a 1-row
     heap per partition; exactly ONE row reaches the driver per round
     (the merge rule must become a literal in the next round's plan —
     the same bounded-scalar pattern as pagerank's node count);
  3. merge rewrite — a left-to-right non-overlapping fold over each
     word's symbol array (higher-order ``aggregate``; interpreted, but
     per-vocab-row, no Python), then localCheckpoint so round k+1's
     plan doesn't replay rounds 1..k.

Determinism: counts are exact integers; ties break on (count DESC,
left ASC, right ASC).  The fold is sequential within a word by
definition (that's what "leftmost-first non-overlapping" means) and
embarrassingly parallel across words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker symbol (distinguishes suffix merges)


def word_symbols(word) -> Column:
    """Initial BPE symbol array: one symbol per character + the EOW mark."""
    chars = F.regexp_extract_all(word, F.lit("."), 0)
    return F.concat(chars, F.array(F.lit(EOW)))


def merge_adjacent(sym: Column, left: str, right: str) -> Column:
    """Replace every leftmost-first non-overlapping adjacent (left, right)
    symbol pair with the merged symbol — [a,b,a,b] → [ab,ab], like the
    reference BPE implementation, not a regex replace (whose scan
    position skips boundary-sharing matches)."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc, x):
        carry, out = acc["carry"], acc["out"]
        is_merge = carry.eqNullSafe(F.lit(left)) & (x == F.lit(right))
        new_out = F.when(carry.isNull(), out).otherwise(
            F.when(is_merge, F.concat(out, F.array(F.lit(merged)))).otherwise(
                F.concat(out, F.array(carry))
            )
        )
        # a merge consumes BOTH symbols; otherwise x becomes the new carry
        new_carry = F.when(carry.isNull(), x).otherwise(
            F.when(is_merge, F.lit(None).cast("string")).otherwise(x)
        )
        return F.struct(new_out.alias("out"), new_carry.alias("carry"))

    def finish(acc):
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        )

    return F.aggregate(sym, init, step, finish)


def learn_bpe_merges(vocab: DataFrame, n_merges: int = 8) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merge rules from a (word, freq) vocabulary.

    Returns [(merge_rank, left, right, pair_count), ...] in learning
    order; stops early when no adjacent pair remains.  The vocab frame
    stays distributed throughout — only the single argmax row per round
    reaches the driver.

    Each round checkpoints the rewritten symbol table EAGERLY and frees
    the superseded generation (graph.py's tracked-checkpoint seam):
    without the free, a real tokenizer run (thousands of merges) pins
    one full vocab copy per round in executor storage; eager matters
    because a lazy checkpoint still reads the previous generation's
    blocks when it materializes, so freeing them first would kill it.
    """
    from dffoo_data_pipeline_spark.operators.graph import (
        _tracked_checkpoint,
        _unpersist_ids,
    )

    spark = vocab.sparkSession
    sc = spark.sparkContext
    state, state_ids = _tracked_checkpoint(
        sc, vocab.select(word_symbols(F.col("word")).alias("sym"), F.col("freq"))
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        n = F.size("sym")
        pairs = (
            state.where(n >= 2)
            .select(F.col("freq"), F.col("sym"), F.explode(F.sequence(F.lit(1), n - 1)).alias("i"))
            .select(
                F.element_at("sym", F.col("i")).alias("left"),
                F.element_at("sym", F.col("i") + 1).alias("right"),
                "freq",
            )
            .groupBy("left", "right")
            .agg(F.sum("freq").cast("bigint").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "left", "right").limit(1).collect()
        if not top:
            break
        best = top[0]
        merges.append((rank, best.left, best.right, best.c))
        new_state, new_ids = _tracked_checkpoint(
            sc,
            state.select(
                merge_adjacent(F.col("sym"), best.left, best.right).alias("sym"),
                "freq",
            ),
        )
        _unpersist_ids(sc, state_ids)
        state, state_ids = new_state, new_ids
    _unpersist_ids(sc, state_ids)  # only the merges list leaves this function
    return merges


def apply_bpe_merges(vocab: DataFrame, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Encode side of BPE: apply a learned merge table to a (word, ...)
    frame → (word, n_bpe_tokens).  Merges compose as `len(merges)`
    chained leftmost-nonoverlapping folds IN LEARNING ORDER — exactly
    how the reference encoder applies its merge ranks — all fused into
    one narrow projection over the vocab (no shuffles, no Python).

    Scale: encoding touches the VOCAB, not the corpus; per-document BPE
    counts then come from one (word → n_bpe_tokens) join.  A real
    tokenizer's thousands of merges would chain the same fold — at that
    depth you'd precompute (word → count) once and persist it, which is
    this same frame written out.
    """
    sym = word_symbols(F.col("word"))
    for _, left, right, _ in merges:
        sym = merge_adjacent(sym, left, right)
    # the EOW marker is bookkeeping, not an emitted token — uncounted
    # unless it fused into a merged symbol (then it's part of a real token)
    return vocab.select(
        "word",
        F.size(F.filter(sym, lambda s: s != F.lit(EOW))).cast("bigint").alias("n_bpe_tokens"),
    )
