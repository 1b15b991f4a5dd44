"""Embedding similarity search (SURVEY.md §2k; BASELINE north star).

- `cosine_topk_bruteforce`: exact O(n²) baseline, JVM array expressions
  (zip_with + aggregate) — no Python in the loop.
- `lsh_topk`: random-hyperplane LSH bucketing + exact re-rank within
  buckets — the approximate path whose cost is linear in corpus size.

Scale: brute force broadcasts the smaller side (the index fits executors
for ≤ millions of vectors; beyond that, IVF-style partition pruning —
`lsh_topk` here — is the path).  Dot products are computed in doubles for
cross-engine determinism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def with_unit_vec(df: DataFrame, vec_col: str, out_col: str = "unit_vec") -> DataFrame:
    """Pre-normalize embeddings to unit length (double precision) so cosine
    becomes a plain dot product downstream."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(out_col, F.transform(v, lambda x: x / n))


def cosine_topk_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector.

    Returns (query_id, neighbor_id, cos_sim) with deterministic ordering
    (sim DESC, neighbor_id ASC) and cos_sim rounded to 6 decimals.
    """
    vd = df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    a = vd.select(F.col(id_col).alias("query_id"), F.col("v").alias("va"))
    b = vd.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_sim_raw"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


def cosine_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection)."""
    vd = df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    a = vd.select(F.col(id_col).alias("doc_a"), F.col("v").alias("va"))
    b = vd.select(F.col(id_col).alias("doc_b"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return pairs.select("doc_a", "doc_b", F.round(cos, 6).alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed → stable buckets)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim)).tolist()


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    planes: int = 16,
    prefix_bits: int = 6,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Bucket key = first `prefix_bits` sign bits of the hyperplane
    projections; exact cosine re-rank inside each bucket.  Vectors in
    sparse buckets simply return fewer than k neighbors — standard ANN
    recall/latency trade, measured in tests against the brute-force
    baseline.

    Scale: one shuffle on the bucket key (2^prefix_bits buckets; tune
    prefix_bits ~ log2(n / target_bucket_size)); within-bucket work is
    quadratic in bucket size only.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        dim = first[0]["d"]
    hp = _hyperplanes(dim, planes, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig_bits = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(c) for c in hp[p]]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0
        ).cast("int")
        for p in range(prefix_bits)
    ]
    bucket = sum(
        (bit * F.lit(1 << i) for i, bit in enumerate(sig_bits[1:], start=1)),
        sig_bits[0],
    )
    bucketed = df.select(F.col(id_col), v.alias("v"), bucket.alias("bucket"))
    a = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("query_id"), F.col("v").alias("va")
    )
    b = bucketed.select(
        F.col("bucket"), F.col(id_col).alias("neighbor_id"), F.col("v").alias("vb")
    )
    pairs = a.join(b, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos_sim_raw"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
