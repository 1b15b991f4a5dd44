"""Benchmark-contamination overlap — the decontamination gate a
pretraining pipeline runs before training (cf. the n-gram overlap checks
in the GPT-3 / PaLM / Llama data cards).

The operator takes the benchmark as an EXPLICIT DataFrame so the
broadcast-safety contract is visible in the signature: eval suites are
thousands-to-millions of shingles, so the distinct benchmark-shingle set
is broadcast and the (huge) corpus streams through a broadcast-hash join
in one stage — no shuffle of corpus text by shingle, no self-join.

Passing a corpus-proportional frame as `benchmark` is a contract
violation at scale (the broadcast grows with the corpus); `max_shingles`
guards that with a cheap bounded count.  The registered query in
`plans/llm_ops.py` keeps its `doc_id % 100` benchmark *proxy* only at
oracle test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions import text as TX
from dffoo_data_pipeline_spark.functions.numeric import round_det


class BenchmarkTooLargeError(ValueError):
    """The benchmark shingle set exceeds the broadcast-safety bound."""


def benchmark_shingles(
    benchmark: DataFrame, *, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles of the benchmark (one `shingle`
    column) — the small side of the contamination join."""
    return (
        benchmark.select(
            F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias("shingle")
        )
        .distinct()
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingles: int | None = 50_000_000,
) -> DataFrame:
    """Per corpus document: distinct-shingle count, how many of those
    shingles appear in the benchmark, and the contaminated fraction
    (rounded to 4 places, cross-engine deterministic).

    `benchmark` is any DataFrame with `text_col` (e.g. an eval suite
    loaded from its own table) — bounded by contract.  With
    ``max_shingles`` set (default 5e7 ≈ a few GB broadcast), a bounded
    `limit(max+1)` probe raises :class:`BenchmarkTooLargeError` instead
    of silently attempting a corpus-sized broadcast; pass ``None`` to
    skip the probe when the caller already knows the bound.

    Scale: one explode + per-doc groupBy on the corpus (shuffle on
    `id_col` only), benchmark side distinct-ed then broadcast.
    """
    bench = benchmark_shingles(benchmark, n=n, text_col=text_col)
    if max_shingles is not None:
        # bounded probe — reads at most max+1 rows, never the full set
        probe = bench.limit(max_shingles + 1).count()
        if probe > max_shingles:
            raise BenchmarkTooLargeError(
                f"benchmark has >{max_shingles} distinct {n}-gram shingles; "
                "a broadcast that size indicates the corpus was passed as "
                "the benchmark — shrink it or raise max_shingles explicitly"
            )
    tri = corpus.select(
        id_col,
        F.explode(F.array_distinct(TX.word_shingles(text_col, n))).alias("shingle"),
    )
    sizes = tri.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        tri.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_cont = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
    return sizes.join(hits, id_col, "left").select(
        id_col,
        "n_shingles",
        n_cont.alias("n_contaminated"),
        round_det(n_cont / F.col("n_shingles"), 4).alias("contamination_frac"),
    )
