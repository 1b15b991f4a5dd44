"""Embedding similarity search (SURVEY.md §2k; BASELINE north star).

- `cosine_topk_bruteforce` / `cosine_neardup_pairs`: exact search using the
  broadcast-index pattern — the corpus embedding matrix is broadcast to
  executors as one numpy array, and queries stream through an
  Arrow-batched `mapInPandas` doing float64 matmuls.  This is the
  vectorized slow-path rule from the project brief: higher-order column
  expressions (`zip_with`+`aggregate`) are interpreted per element in
  Spark and lose to BLAS by ~100× on 64-dim dots.
- `lsh_topk`: random-hyperplane LSH bucketing + exact re-rank within
  buckets — the approximate path whose candidate cost is linear in corpus
  size.

Scale: the broadcast index must fit executor memory (~1.5 GB per 5M×64
float64 vectors) — beyond that, partition the index (IVF-style, here
`lsh_topk`) so each task scans one cell.  Queries never collect to the
driver; only the bounded index does (explicitly, as an index build).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# Broadcast-index ceiling: ~1 GB of float64 at 64 dims.  Beyond this the
# exact broadcast kernel is a driver/executor OOM at cluster scale, so the
# routed entry points (`cosine_topk_auto` / `cosine_neardup_auto`) switch
# to the LSH-bucketed path instead of collecting.
DEFAULT_MAX_INDEX_ROWS = 2_000_000


class IndexTooLargeError(ValueError):
    """Raised when the exact broadcast-index path would materialize more
    than `max_index_rows` vectors — the caller should use a partitioned
    index (`lsh_topk` / `ivf_topk` / `lsh_neardup_pairs`) instead."""


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _collect_index(
    df: DataFrame, id_col: str, vec_col: str, max_rows: int = DEFAULT_MAX_INDEX_ROWS
):
    """Materialize the index side as numpy: ids, matrix, norms.

    The collect is hard-bounded: at most `max_rows + 1` rows ever leave
    the executors, and exceeding `max_rows` raises `IndexTooLargeError`
    instead of OOMing the driver.  Measured guard cost vs the unbounded
    collect at sf0.1: limit-probe +43 ms vs a separate count() job
    +113 ms — the single bounded job wins.
    """
    # NULL vectors participate in nothing (they have no geometry) —
    # filtered here so np.stack never sees a ragged batch (r11 hostile
    # embeddings sweep: one NULL row crashed the whole kernel)
    pdf = (
        df.where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .limit(max_rows + 1)
        .toPandas()
    )
    if len(pdf) > max_rows:
        raise IndexTooLargeError(
            f"exact cosine index needs > {max_rows} vectors; "
            "use lsh_topk/ivf_topk/lsh_neardup_pairs (partitioned index) "
            "or raise max_index_rows explicitly"
        )
    ids = pdf[id_col].to_numpy()
    if len(pdf) == 0:
        return ids, np.zeros((0, 1)), np.zeros(0)
    M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    return ids, M, norms


def _out_schema(df: DataFrame, id_col: str) -> T.StructType:
    id_type = df.schema[id_col].dataType
    return T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    max_index_rows: int = DEFAULT_MAX_INDEX_ROWS,
) -> DataFrame:
    """Exact top-k cosine neighbors for every vector.

    Returns (query_id, neighbor_id, cos_sim) ordered deterministically
    (sim DESC, neighbor_id ASC per query), cos_sim rounded to 6 decimals.
    Raises `IndexTooLargeError` past `max_index_rows` — see
    `cosine_topk_auto` for the self-routing entry point.
    """
    spark = df.sparkSession
    df = df.where(F.col(vec_col).isNotNull())  # NULL vecs query nothing
    ids, M, norms = _collect_index(df, id_col, vec_col, max_index_rows)
    b = spark.sparkContext.broadcast((ids, M, norms))
    schema = _out_schema(df, id_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_ids, idx_M, idx_norms = b.value
        for pb in batches:
            if len(pb) == 0:
                continue
            q_ids = pb[id_col].to_numpy()
            Q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            q_norms = np.linalg.norm(Q, axis=1)
            S = (Q @ idx_M.T) / np.outer(q_norms, idx_norms)
            # mask self-matches, then exact top-k with (sim desc, id asc) order
            S[q_ids[:, None] == idx_ids[None, :]] = -np.inf
            kk = min(k, S.shape[1] - 1)
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            out_q, out_n, out_s = [], [], []
            for r in range(S.shape[0]):
                # finite guard: a duplicated id leaves extra -inf
                # self-mask columns inside the top-k cut, and a zero-norm
                # vector yields NaN scores — neither is a real neighbor
                cand = part[r][np.isfinite(S[r, part[r]])]
                order = np.lexsort((idx_ids[cand], -S[r, cand]))
                sel = cand[order]
                out_q.extend([q_ids[r]] * len(sel))
                out_n.extend(idx_ids[sel])
                out_s.extend(np.round(S[r, sel], 6))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    from dffoo_data_pipeline_spark.sources.readers import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, vec_col), id_col).mapInPandas(gen, schema)


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    max_index_rows: int = DEFAULT_MAX_INDEX_ROWS,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection);
    doc_a < doc_b.  Same broadcast-index matmul pattern as top-k.
    Raises `IndexTooLargeError` past `max_index_rows` — see
    `cosine_neardup_auto`."""
    spark = df.sparkSession
    df = df.where(F.col(vec_col).isNotNull())  # NULL vecs pair with nothing
    ids, M, norms = _collect_index(df, id_col, vec_col, max_index_rows)
    b = spark.sparkContext.broadcast((ids, M, norms))
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("doc_a", id_type),
            T.StructField("doc_b", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx_ids, idx_M, idx_norms = b.value
        for pb in batches:
            if len(pb) == 0:
                continue
            q_ids = pb[id_col].to_numpy()
            Q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            q_norms = np.linalg.norm(Q, axis=1)
            S = (Q @ idx_M.T) / np.outer(q_norms, idx_norms)
            Sr = np.round(S, 6)
            keep = (Sr >= threshold) & (q_ids[:, None] < idx_ids[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"doc_a": q_ids[r], "doc_b": idx_ids[c], "cos_sim": Sr[r, c]}
            )

    from dffoo_data_pipeline_spark.sources.readers import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, vec_col), id_col).mapInPandas(gen, schema)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    sample_size: int = 2048,
    seed: int = 42,
    kmeans_iters: int = 8,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index.

    Index build: k-means centroids trained on a BOUNDED sample (the only
    driver materialization, `limit(sample_size)`), broadcast to executors.
    Search: every vector is assigned to its `n_probe` nearest cells, the
    corpus to its 1 nearest; exact cosine re-rank runs per cell via
    applyInPandas.  Candidate cost ~ n_probe/n_cells of brute force;
    recall rises with n_probe (measured in tests/test_similarity_ivf.py).

    Scale: one shuffle on cell id; cells partition the corpus, so no
    global index ever sits in one executor — the beyond-memory path, same
    shape as FAISS IVF-Flat distributed over Spark.
    """
    df = df.where(F.col(vec_col).isNotNull())  # NULL vecs have no cell
    pdf = df.select(vec_col).limit(sample_size).toPandas()
    if len(pdf) == 0:
        return df.sparkSession.createDataFrame([], _out_schema(df, id_col))
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_cells = min(n_cells, len(X))
    C = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(kmeans_iters):  # spherical k-means on the sample
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            m = X[assign == c]
            if len(m):
                C[c] = m.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    bC = df.sparkSession.sparkContext.broadcast(C)

    def assign_cells(probes: int):
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Cm = bC.value
            for pb in batches:
                if len(pb) == 0:
                    continue
                Q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
                Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
                S = Qn @ Cm.T
                order = np.argsort(-S, axis=1)[:, :probes]
                out = pb.loc[pb.index.repeat(probes)].reset_index(drop=True)
                out["cell"] = order.ravel()
                out["is_probe"] = np.tile(
                    np.arange(probes) > 0, len(pb)
                )  # probe>0 rows are query-only
                yield out

        return gen

    id_type = df.schema[id_col].dataType
    vec_type = df.schema[vec_col].dataType
    assigned_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField(vec_col, vec_type),
            T.StructField("cell", T.IntegerType()),
            T.StructField("is_probe", T.BooleanType()),
        ]
    )
    from dffoo_data_pipeline_spark.sources.readers import ensure_min_partitions

    base = ensure_min_partitions(df.select(id_col, vec_col), id_col)
    # a tiny corpus can have fewer cells than the requested probe count —
    # argsort can only yield n_cells columns, so clamp or the repeat/ravel
    # shapes disagree and the executor dies on a length mismatch
    assigned = base.mapInPandas(assign_cells(min(n_probe, n_cells)), assigned_schema)

    out_schema = _out_schema(df, id_col)

    def rank_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # queries: every row (incl. probe copies); index: primary rows only
        idx = pdf[~pdf["is_probe"]]
        if len(idx) == 0 or len(pdf) < 2:
            return pd.DataFrame({c.name: [] for c in out_schema})
        ids_q = pdf[id_col].to_numpy()
        ids_i = idx[id_col].to_numpy()
        Q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        M = np.stack(idx[vec_col].to_numpy()).astype(np.float64)
        S = (Q @ M.T) / np.outer(
            np.linalg.norm(Q, axis=1), np.linalg.norm(M, axis=1)
        )
        S[ids_q[:, None] == ids_i[None, :]] = -np.inf
        kk = min(k, S.shape[1])
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        out_q, out_n, out_s = [], [], []
        for r in range(S.shape[0]):
            cand = part[r][np.isfinite(S[r, part[r]])]
            order = np.lexsort((ids_i[cand], -S[r, cand]))
            sel = cand[order]
            out_q.extend([ids_q[r]] * len(sel))
            out_n.extend(ids_i[sel])
            out_s.extend(np.round(S[r, sel], 6))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s})

    per_cell = assigned.groupBy("cell").applyInPandas(rank_cell, out_schema)
    # merge probe-cell candidates: global top-k per query
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        per_cell.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def int_lsh_weights(dim: int, planes: int) -> list[list[int]]:
    """Deterministic integer hyperplane weights in [-1000, 1000].

    A multiplicative-congruential hash over the flat (plane, dim) index
    (Knuth's 1103515245/12345 constants) — pure integer arithmetic, so
    ANY engine reproduces the exact weights from the formula alone.
    Uniform-cube directions instead of gaussian: fine for sign-LSH
    (Achlioptas 2003 shows even ±1 entries preserve the projection
    guarantees), and the integer lattice is what makes the bucket
    assignment bit-for-bit verifiable cross-engine.
    """
    return [
        [((1103515245 * (p * dim + i) + 12345) % 2001) - 1000 for i in range(dim)]
        for p in range(planes)
    ]


def _intdot_col(a, b_lits: list[int]):
    """Exact BIGINT dot of an array<bigint> column with literal weights."""
    w = F.array(*[F.lit(x).cast("bigint") for x in b_lits])
    return F.aggregate(
        F.zip_with(a, w, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _exact_cos_topk_kernel(id_col: str, k: int, out_schema):
    """applyInPandas kernel: exact-integer cosine top-k inside one group.

    Expects columns (id, c, n2, is_probe); index = non-probe rows.  All
    dot products are int64 matmuls (exact); the ORDER key d·|d|/(n2a·n2b)
    and the reported cos d/√(n2a·n2b) are single correctly-rounded IEEE
    ops on exact ≤2⁵³ integers — bit-identical in any engine, so the
    DuckDB oracle can replay the ranking with no float tolerance
    (dedup_semantic_int8's contract, plans/embeddings.py:533).

    The k-boundary is deterministic: argpartition alone picks arbitrarily
    among exactly-tied keys (plausible with integer dots, e.g. key=0),
    which would diverge from the oracle's ``ORDER BY key DESC,
    neighbor_id``.  Instead the boundary is WIDENED to every column tied
    with the k-th key, then a stable sort over index rows pre-sorted by
    ascending neighbor id resolves ties to the lowest ids — exact for any
    data, and still O(m) per row when ties are rare (measured ~10× faster
    than a full per-row sort at 1000-row buckets).

    ``emit_key=True`` (multi-bucket callers: multiprobe LSH, IVF) adds
    the single-rounded ranking key itself as a ``rank_key`` column so the
    GLOBAL merge can order by the exact key the kernel and the oracle
    rank by.  Ordering the merge on the reported ``cos_sim`` instead
    would be a second, independent rounding (÷√den vs ·|d|/den): two
    distinct keys can round to equal cos values, and the merge's
    neighbor_id tie-break would then diverge from the oracle at the k
    boundary.
    """
    emit_key = any(f.name == "rank_key" for f in out_schema)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = pdf[~pdf["is_probe"]]
        if len(idx) == 0 or len(pdf) < 2:
            return pd.DataFrame({c.name: [] for c in out_schema})
        return _rank_topk_int(
            pdf[id_col].to_numpy(),
            np.stack(pdf["c"].to_numpy()).astype(np.int64),
            pdf["n2"].to_numpy().astype(np.int64),
            idx[id_col].to_numpy(),
            np.stack(idx["c"].to_numpy()).astype(np.int64),
            idx["n2"].to_numpy().astype(np.int64),
            k,
            emit_key,
        )

    return rank_group


def _rank_topk_int(ids_q, Q, n2_q, ids_i, M, n2_i, k: int, emit_key: bool):
    """Shared exact-integer ranking body of the symmetric
    (`_exact_cos_topk_kernel`) and asymmetric (`_exact_cos_probe_kernel`)
    kernels — see `_exact_cos_topk_kernel` for the numeric and
    tie-breaking contract."""
    by_id = np.argsort(ids_i, kind="stable")  # column order = id asc
    ids_i, M, n2_i = ids_i[by_id], M[by_id], n2_i[by_id]
    # Exact integer dot computed THROUGH float64 BLAS (r13): numpy's
    # int64 matmul has no BLAS path (naive loops — measured the dominant
    # cost of every int-ANN kernel at sf1).  Exactness is unchanged:
    # per-element products ≤ 128² and row sums ≤ 128²·dim < 2²¹, so every
    # partial sum is an integer far below 2⁵³ — float64 accumulation is
    # exact for ANY summation order, and rint only normalizes the sign of
    # zero.  D then carries the same integers the int64 product carried.
    D = np.rint(Q.astype(np.float64) @ M.T.astype(np.float64))
    den = np.outer(n2_q, n2_i)  # ≤ 2⁴⁰, exact in int64 AND float64
    key = (D * np.abs(D)) / den.astype(np.float64)
    key[ids_q[:, None] == ids_i[None, :]] = -np.inf
    kk = min(k, D.shape[1])
    part = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
    # k-th largest key per row; widening to >= bound pulls in every
    # boundary tie so the deterministic sort below can pick among them
    bound = key[np.arange(key.shape[0])[:, None], part].min(axis=1)
    out_q, out_n, out_s, out_k = [], [], [], []
    for r in range(D.shape[0]):
        cand = np.nonzero(key[r] >= bound[r])[0]  # id-ascending order
        cand = cand[np.isfinite(key[r, cand])]
        # stable sort on -key keeps the ascending-id order among ties,
        # so truncating to kk is the oracle's exact tie-break
        sel = cand[np.argsort(-key[r, cand], kind="stable")][:kk]
        out_q.extend([ids_q[r]] * len(sel))
        out_n.extend(ids_i[sel])
        out_s.extend(
            D[r, sel].astype(np.float64)
            / np.sqrt((n2_q[r] * n2_i[sel]).astype(np.float64))
        )
        if emit_key:
            out_k.extend(key[r, sel])
    cols = {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
    if emit_key:
        cols["rank_key"] = out_k
    return pd.DataFrame(cols)


def _exact_cos_probe_kernel(id_col: str, k: int, out_schema):
    """Cogrouped ASYMMETRIC twin of `_exact_cos_topk_kernel`: left cogroup
    side = query rows of one bucket (multiprobe duplicates included),
    right side = index members of that bucket.  Only left rows are
    ranked, only right rows are ranked into — the search(queries, index)
    contract.  Cogroup (vs a unioned groupBy) is what lets a PERSISTED
    hash-bucketed index satisfy its own side's distribution: the index
    scan arrives pre-partitioned on `bucket` and only the query side
    exchanges (pinned by tests/test_bucketing.py)."""
    emit_key = any(f.name == "rank_key" for f in out_schema)

    def rank_probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({c.name: [] for c in out_schema})
        # right-side columns carry __i prefixes: distinct names keep the
        # analyzer's self-lineage attribute dedup from pruning the index
        # side when both cogroup sides derive from one codes frame
        return _rank_topk_int(
            left[id_col].to_numpy(),
            np.stack(left["c"].to_numpy()).astype(np.int64),
            left["n2"].to_numpy().astype(np.int64),
            right["__iid"].to_numpy(),
            np.stack(right["__ic"].to_numpy()).astype(np.int64),
            right["__in2"].to_numpy().astype(np.int64),
            k,
            emit_key,
        )

    return rank_probe


def _int_out_schema(
    codes: DataFrame, id_col: str, with_key: bool = False
) -> T.StructType:
    fields = [
        T.StructField("query_id", codes.schema[id_col].dataType),
        T.StructField("neighbor_id", codes.schema[id_col].dataType),
        T.StructField("cos_sim", T.DoubleType()),
    ]
    if with_key:  # internal merge key, dropped before results surface
        fields.append(T.StructField("rank_key", T.DoubleType()))
    return T.StructType(fields)


def lsh_topk_int(
    codes: DataFrame,
    id_col: str = "vec_id",
    k: int = 5,
    prefix_bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH top-k over integer codes — the
    driver-verifiable twin of `lsh_topk`.

    Input is a quantized-codes frame (id, c: array<bigint>, n2) —
    `plans/embeddings.int8_codes`' output.  Bucket = sign bits of integer
    hyperplane projections (`int_lsh_weights`), so assignment is exact
    integer arithmetic any engine reproduces; within-bucket re-rank uses
    the exact-int cosine kernel.  Same plan shape as `lsh_topk` (one
    shuffle on bucket, quadratic only inside buckets, nothing broadcast);
    the float-hyperplane variant stays for callers with raw embeddings.
    """
    W = int_lsh_weights(dim, prefix_bits)
    bits = [(_intdot_col(F.col("c"), W[p]) > 0).cast("bigint") for p in range(prefix_bits)]
    bucket = sum(
        (bit * F.lit(1 << i) for i, bit in enumerate(bits[1:], start=1)), bits[0]
    )
    bucketed = codes.where(F.col("n2") > 0).select(
        F.col(id_col), "c", "n2", bucket.alias("bucket"), F.lit(False).alias("is_probe")
    )
    out_schema = _int_out_schema(codes, id_col)
    return bucketed.groupBy("bucket").applyInPandas(
        _exact_cos_topk_kernel(id_col, k, out_schema), out_schema
    )


def lsh_multiprobe_topk_int(
    codes: DataFrame,
    id_col: str = "vec_id",
    k: int = 5,
    prefix_bits: int = 6,
    dim: int = 64,
    n_flip: int = 2,
) -> DataFrame:
    """MULTI-PROBE sign-LSH top-k over integer codes (after Lv et al.
    2007, "Multi-Probe LSH"): each query additionally probes the
    `n_flip` buckets obtained by flipping its lowest-margin sign bits —
    the planes whose integer projection |d_p| is smallest are the ones a
    true neighbor most plausibly lands on the other side of, so probing
    them buys most of a second hash table's recall for zero extra index.

    Index membership stays single-bucket (the `lsh_topk_int` table,
    unchanged); only the QUERY side fans out 1+n_flip ways, so the
    shuffle grows by the probe factor while the index does not — the
    standard multi-probe trade.  Every step is exact integer arithmetic
    (margin = |d_p| with ties on plane index, probe bucket = XOR of one
    bit), so the whole probe schedule and ranking replays in any engine
    and the full pipeline carries a value-hash oracle.  Candidates per
    (query, neighbor) pair are unique — a neighbor is indexed in exactly
    one bucket and the probed buckets are distinct — so the global top-k
    over per-bucket top-ks equals ranking the candidate union directly
    (the `ivf_topk_int` cut argument).

    Recall vs the single-probe path is measured in
    tests/test_similarity_routing.py (monotone: the candidate set is a
    strict superset) and reported oracle-checked by
    `similarity_lsh_recall_report`'s multiprobe twin.
    """
    W = int_lsh_weights(dim, prefix_bits)
    dots = [
        _intdot_col(F.col("c"), W[p]).alias(f"d{p}") for p in range(prefix_bits)
    ]
    base = codes.where(F.col("n2") > 0).select(F.col(id_col), "c", "n2", *dots)
    bits = [(F.col(f"d{p}") > 0).cast("bigint") for p in range(prefix_bits)]
    bucket = sum(
        (bit * F.lit(1 << i) for i, bit in enumerate(bits[1:], start=1)), bits[0]
    )
    # margin-ordered probe schedule: array_sort on (|d_p|, p, mask)
    # structs = ORDER BY abs(d), p — the mask rides along so the flip is
    # a pure XOR downstream (F.shiftleft needs a literal bit count)
    margin = F.array(
        *[
            F.struct(
                F.abs(F.col(f"d{p}")).alias("m"),
                F.lit(p).alias("p"),
                F.lit(1 << p).cast("bigint").alias("mask"),
            )
            for p in range(prefix_bits)
        ]
    )
    flips = F.slice(F.array_sort(margin), 1, min(n_flip, prefix_bits))
    with_bucket = base.select(
        F.col(id_col), "c", "n2", bucket.alias("bucket"), flips.alias("flips")
    ).localCheckpoint(eager=False)  # feeds the member AND probe branches
    member = with_bucket.select(
        F.col(id_col), "c", "n2", "bucket", F.lit(False).alias("is_probe")
    )
    probes = with_bucket.select(
        F.col(id_col),
        "c",
        "n2",
        F.explode(
            F.transform(F.col("flips"), lambda s: F.col("bucket").bitwiseXOR(s["mask"]))
        ).alias("bucket"),
        F.lit(True).alias("is_probe"),
    )
    out_schema = _int_out_schema(codes, id_col, with_key=True)
    per_bucket = member.unionByName(probes).groupBy("bucket").applyInPandas(
        _exact_cos_topk_kernel(id_col, k, out_schema), out_schema
    )
    # merge on the kernel's exact single-rounded key, NOT the doubly-
    # rounded cos_sim: distinct keys can round to equal cos values and
    # the neighbor_id tie-break would diverge from the oracle's
    # `ORDER BY d*|d|/(na2*nb2) DESC, neighbor_id` at the k boundary
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("rank_key"), F.asc("neighbor_id")
    )
    return (
        per_bucket.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= k)
        .drop("__rn", "rank_key")
    )


def ivf_topk_int(
    codes: DataFrame,
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """Seeded IVF top-k over integer codes — the driver-verifiable twin of
    `ivf_topk`.

    Cells are seeded by the `n_cells` lowest-id vectors (the
    dedup_semantic_int8 convention: deterministic, no trained state), so
    cell assignment is an exact-integer argmax any engine replays; the
    kmeans-trained variant (`ivf_topk`) stays as the quality path with
    measured recall.  Every vector joins its 1 nearest cell as index
    member and its `n_probe` nearest as query; exact-int re-rank per
    cell, then global top-k per query (a superset-of-per-cell-top-k cut,
    so the two-stage ranking equals ranking the union directly).

    Scale: one broadcast of n_cells integer code rows + one shuffle on
    cell id — the IVF-Flat shape; nothing grows with corpus size on the
    driver.
    """
    live = codes.where(F.col("n2") > 0)
    seeds = live.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col("c").alias("sc"), F.col("n2").alias("sn2")
    )
    d = F.aggregate(
        F.zip_with(F.col("c"), F.col("sc"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = live.crossJoin(F.broadcast(seeds)).select(
        id_col, "c", "n2", "cell", "sn2", d.alias("d")
    )
    # assignment key d·|d|/sn2 is monotone in cosine-to-seed; exact ints
    # ≤2⁴⁰ through one IEEE division — deterministic in any engine
    w = Window.partitionBy(id_col).orderBy(
        F.desc((F.col("d") * F.abs("d")).cast("double") / F.col("sn2").cast("double")),
        F.asc("cell"),
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max(n_probe, 1))
        .select(
            id_col, "c", "n2", "cell", (F.col("rn") > 1).alias("is_probe")
        )
    )
    out_schema = _int_out_schema(codes, id_col, with_key=True)
    per_cell = assigned.groupBy("cell").applyInPandas(
        _exact_cos_topk_kernel(id_col, k, out_schema), out_schema
    )
    # same merge-key discipline as lsh_multiprobe_topk_int: order on the
    # kernel's exact ranking key so boundary ties match the oracle
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("rank_key"), F.asc("neighbor_id")
    )
    return (
        per_cell.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= k)
        .drop("__rn", "rank_key")
    )


def lsh_bucket_index_int(
    codes: DataFrame,
    id_col: str = "vec_id",
    prefix_bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """The PERSISTABLE ANN index: (id, c, n2, bucket) with bucket = the
    integer-lattice sign-LSH bucket of each vector — the similarity
    twin of `dedup.portable_band_index`.  This is the table the
    steady-state ANN pipeline writes once (hash-bucketed on `bucket`
    via `sources/writers.write_bucketed`) and probes per query batch
    with `lsh_probe_topk_int(indexed=...)`, so the corpus is neither
    re-quantized nor re-shuffled per search; bucket assignment is exact
    integer arithmetic (`int_lsh_weights`), so any engine can rebuild
    or verify the index from the formula alone."""
    W = int_lsh_weights(dim, prefix_bits)
    bits = [
        (_intdot_col(F.col("c"), W[p]) > 0).cast("bigint") for p in range(prefix_bits)
    ]
    bucket = sum(
        (bit * F.lit(1 << i) for i, bit in enumerate(bits[1:], start=1)), bits[0]
    )
    return codes.where(F.col("n2") > 0).select(
        F.col(id_col), "c", "n2", bucket.alias("bucket")
    )


def lsh_probe_topk_int(
    query_codes: DataFrame,
    index_codes: DataFrame | None = None,
    id_col: str = "vec_id",
    k: int = 5,
    prefix_bits: int = 6,
    dim: int = 64,
    n_flip: int = 2,
    indexed: DataFrame | None = None,
    validate_index: bool = True,
) -> DataFrame:
    """ASYMMETRIC ANN search: exact-integer cosine top-k over the INDEX
    for every QUERY vector — the search(queries, index) API the
    symmetric self-join variants (`lsh_topk_int`, which rank a corpus
    against itself) don't expose, and the scale sibling of the
    broadcast-bounded `cosine_topk_against_index` (which collects the
    whole index to every executor and stops at `IndexTooLargeError`).

    Index vectors are members of exactly one sign-LSH bucket; each
    query probes its own bucket plus its `n_flip` lowest-margin
    bit-flip buckets (the Lv et al. 2007 multi-probe schedule —
    identical to `lsh_multiprobe_topk_int`'s).  The per-bucket ranking
    is a COGROUP — query rows on one side, index members on the other —
    so only queries are ranked and only members are ranked into;
    candidates per (query, neighbor) are unique (single-bucket
    membership × distinct probed buckets), so the rank_key merge of
    per-bucket top-ks equals ranking the candidate union directly.

    Steady state: pass ``indexed`` — the PERSISTED `lsh_bucket_index_int`
    table, hash-bucketed on `bucket` at write time (`write_bucketed`) —
    instead of ``index_codes``: the bucketed scan satisfies the cogroup's
    index-side distribution, so the corpus is neither re-quantized NOR
    re-shuffled per batch — each search pays a query-batch-sized exchange
    only (plan-pinned by tests/test_bucketing.py; the shape
    `streaming_ann_probe` runs per micro-batch, and the dedup twin of
    this contract is `portable_neardup_against_index(index_bands=...)`).
    Every step is exact integer arithmetic, so the whole
    index+probe+search pipeline carries a value-hash SQL oracle.
    """
    if (index_codes is None) == (indexed is None):
        raise ValueError(
            "pass exactly one of index_codes (raw codes) or indexed "
            "(a persisted lsh_bucket_index_int table)"
        )
    if indexed is None:
        indexed = lsh_bucket_index_int(index_codes, id_col, prefix_bits, dim)
    elif validate_index:
        # a persisted index built with MORE prefix_bits than this probe
        # has buckets outside [0, 2**prefix_bits) — catch it from the
        # data with a min/max agg over the bucket column.  LAZY (r9
        # ADVICE): the check rides the probe plan as a 1-row asserted
        # aggregate broadcast-crossJoined onto the member side, instead
        # of an eager collect() at plan-construction time — constructing
        # a probe stays free, and the domain scan runs (and repeats) only
        # when the probe itself actually executes.  Built with FEWER
        # bits (a strict subset of the domain) is NOT observable here —
        # the registered plans close that direction with write_bucketed
        # TBLPROPERTIES (expect_table_properties); same asymmetry as the
        # dedup twin's band-domain check.  Pass validate_index=False on
        # repeat probes of a validated index (every registered plan
        # does, after its TBLPROPERTIES check).
        domain_ok = F.col("__lo").isNull() | (
            (F.col("__lo") >= 0) & (F.col("__hi") < (1 << prefix_bits))
        )
        guard = (
            indexed.agg(
                F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
            )
            .where(
                F.assert_true(
                    domain_ok,
                    F.concat(
                        F.lit("persisted ANN index bucket domain ["),
                        F.col("__lo").cast("string"),
                        F.lit(", "),
                        F.col("__hi").cast("string"),
                        F.lit(
                            f"] exceeds this probe's prefix_bits={prefix_bits} "
                            f"(domain [0, {1 << prefix_bits})) — the index was "
                            f"built with different parameters"
                        ),
                    ),
                ).isNull()
            )
            .select(F.lit(1).alias("__domain_checked"))
        )
        indexed = indexed.crossJoin(F.broadcast(guard)).drop("__domain_checked")
    member = indexed.select(
        F.col(id_col).alias("__iid"),
        F.col("c").alias("__ic"),
        F.col("n2").alias("__in2"),
        "bucket",
    )
    W = int_lsh_weights(dim, prefix_bits)
    dots = [
        _intdot_col(F.col("c"), W[p]).alias(f"d{p}") for p in range(prefix_bits)
    ]
    base = query_codes.where(F.col("n2") > 0).select(F.col(id_col), "c", "n2", *dots)
    bits = [(F.col(f"d{p}") > 0).cast("bigint") for p in range(prefix_bits)]
    bucket = sum(
        (bit * F.lit(1 << i) for i, bit in enumerate(bits[1:], start=1)), bits[0]
    )
    if n_flip > 0:
        margin = F.array(
            *[
                F.struct(
                    F.abs(F.col(f"d{p}")).alias("m"),
                    F.lit(p).alias("p"),
                    F.lit(1 << p).cast("bigint").alias("mask"),
                )
                for p in range(prefix_bits)
            ]
        )
        flips = F.slice(F.array_sort(margin), 1, min(n_flip, prefix_bits))
        with_bucket = base.select(
            F.col(id_col), "c", "n2", bucket.alias("bucket"), flips.alias("flips")
        ).localCheckpoint(eager=False)  # feeds the own-bucket AND probe branches
        own = with_bucket.select(F.col(id_col), "c", "n2", "bucket")
        probes = with_bucket.select(
            F.col(id_col),
            "c",
            "n2",
            F.explode(
                F.transform(
                    F.col("flips"), lambda s: F.col("bucket").bitwiseXOR(s["mask"])
                )
            ).alias("bucket"),
        )
        qside = own.unionByName(probes)
    else:
        qside = base.select(F.col(id_col), "c", "n2", bucket.alias("bucket"))
    out_schema = _int_out_schema(query_codes, id_col, with_key=True)
    per_bucket = (
        qside.groupBy("bucket")
        .cogroup(member.groupBy("bucket"))
        .applyInPandas(_exact_cos_probe_kernel(id_col, k, out_schema), out_schema)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("rank_key"), F.asc("neighbor_id")
    )
    return (
        per_bucket.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= k)
        .drop("__rn", "rank_key")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed → stable buckets)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim))


def _lsh_bucketize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    prefix_bits: int,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """(id, v, bucket) with bucket = first `prefix_bits` sign bits of the
    random-hyperplane projections — pure JVM column expressions, one pass."""
    # NULL vectors have no signature and would put the whole NULL-bucket
    # group's np.stack at crash risk — same boundary filter as
    # _collect_index (r11 hostile embeddings sweep, extended per ADVICE)
    df = df.where(F.col(vec_col).isNotNull())
    if dim is None:
        first = df.select(vec_col).head()
        dim = len(first[0]) if first is not None else 1
    hp = _hyperplanes(dim, planes, seed)[:prefix_bits]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig_bits = [
        (
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(c) for c in hp[p]]), lambda x, w: x * w),
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
    return df.select(F.col(id_col), F.col(vec_col).alias("v"), bucket.alias("bucket"))


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
    projections; exact cosine re-rank inside each bucket (grouped matmul
    in Arrow batches via applyInPandas).  Vectors in sparse buckets return
    fewer than k neighbors — the standard ANN recall/latency trade,
    measured against brute force in tests/test_similarity.py.

    Scale: one shuffle on the bucket key (2^prefix_bits buckets; tune
    prefix_bits ≈ log2(n / target_bucket_size)); within-bucket work is
    quadratic in bucket size only, and no index is broadcast — this is
    the partitioned (IVF-style) path for corpora beyond executor memory.
    """
    bucketed = _lsh_bucketize(df, id_col, vec_col, planes, prefix_bits, dim, seed)
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def rank_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos_sim": []})
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        S = (M @ M.T) / np.outer(norms, norms)
        np.fill_diagonal(S, -np.inf)
        kk = min(k, n - 1)
        part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        out_q, out_n, out_s = [], [], []
        for r in range(n):
            cand = part[r]
            order = np.lexsort((ids[cand], -S[r, cand]))
            sel = cand[order]
            out_q.extend([ids[r]] * len(sel))
            out_n.extend(ids[sel])
            out_s.extend(np.round(S[r, sel], 6))
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s})

    return bucketed.groupBy("bucket").applyInPandas(rank_bucket, schema)


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: int = 16,
    prefix_bits: int = 6,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs (cosine ≥ threshold, doc_a < doc_b) via
    LSH bucketing: candidate pairs share a sign-signature prefix, exact
    cosine verify inside each bucket.  Random-hyperplane LSH concentrates
    high-cosine pairs in equal buckets, so recall rises with threshold —
    exactly the regime near-dup detection runs in.

    Scale: one shuffle on the bucket key; within-bucket work quadratic in
    bucket size only; nothing broadcast, nothing collected — the
    beyond-memory fallback `cosine_neardup_auto` routes to."""
    bucketed = _lsh_bucketize(df, id_col, vec_col, planes, prefix_bits, dim, seed)
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("doc_a", id_type),
            T.StructField("doc_b", id_type),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def pairs_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cos_sim": []})
        ids = pdf[id_col].to_numpy()
        M = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        S = np.round((M @ M.T) / np.outer(norms, norms), 6)
        keep = (S >= threshold) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(keep)
        return pd.DataFrame({"doc_a": ids[r], "doc_b": ids[c], "cos_sim": S[r, c]})

    # a pair can share several prefix buckets only when prefix hashes
    # collide across seeds; with a single signature each pair appears in
    # at most one bucket, but dropDuplicates keeps the contract explicit
    return (
        bucketed.groupBy("bucket")
        .applyInPandas(pairs_bucket, schema)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def cosine_topk_auto(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    max_index_rows: int = DEFAULT_MAX_INDEX_ROWS,
    planes: int = 16,
    prefix_bits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k while the corpus fits the broadcast-index
    ceiling; beyond it, route to the LSH-bucketed partitioned index.

    The size probe is the bounded `limit(cap+1)` collect inside
    `_collect_index` — no unbounded `toPandas()` is reachable from here."""
    try:
        return cosine_topk_bruteforce(df, id_col, vec_col, k, max_index_rows)
    except IndexTooLargeError:
        return lsh_topk(
            df, id_col, vec_col, k=k, planes=planes, prefix_bits=prefix_bits
        )


def cosine_neardup_auto(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    max_index_rows: int = DEFAULT_MAX_INDEX_ROWS,
    planes: int = 16,
    prefix_bits: int = 6,
) -> DataFrame:
    """Exact near-dup pairs under the broadcast ceiling; LSH-bucketed
    candidate generation + exact verify beyond it."""
    try:
        return cosine_neardup_pairs(df, id_col, vec_col, threshold, max_index_rows)
    except IndexTooLargeError:
        return lsh_neardup_pairs(
            df, id_col, vec_col, threshold=threshold, planes=planes, prefix_bits=prefix_bits
        )


def cosine_topk_against_index(
    probe_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    index_id_col: str | None = None,
    index_vec_col: str | None = None,
    max_index_rows: int = DEFAULT_MAX_INDEX_ROWS,
) -> DataFrame:
    """Exact top-k cosine of every probe against a SEPARATE bounded index
    frame (the asymmetric sibling of `cosine_topk_bruteforce`, which
    scores a corpus against itself and masks self-matches; here probe
    and index are distinct frames — quantized indexes, frozen reference
    sets — and a probe that also lives in the index keeps its match).

    Returns (query_id, neighbor_id, cos_sim, rank), rank 1..k.  Ranking
    sorts on the ROUNDED similarity (1e-6) with neighbor-id tiebreak —
    the same total order a SQL `ROW_NUMBER() OVER (ORDER BY round DESC,
    id)` produces, so an engine-independent oracle can reproduce the
    winners even when two unrounded sims differ only in the last ulps.

    Scale: index is collected via the bounded limit-probe guard
    (`IndexTooLargeError` past `max_index_rows`) and broadcast; probes
    stream through one Arrow-batched pass — no shuffle of the probe
    side at all.  NULL probe vectors are dropped at the boundary (they
    have no geometry to rank with — same contract as `_collect_index`);
    zero-norm vectors are the CALLER's contract to filter (division
    here is IEEE: a zero norm yields ±inf/nan scores).
    """
    probe_df = probe_df.where(F.col(vec_col).isNotNull())
    spark = probe_df.sparkSession
    iid = index_id_col or id_col
    ivec = index_vec_col or vec_col
    idx_ids, idx_M, idx_norms = _collect_index(
        index_df.select(
            F.col(iid).alias(id_col), F.col(ivec).alias(vec_col)
        ),
        id_col,
        vec_col,
        max_index_rows,
    )
    b = spark.sparkContext.broadcast((idx_ids, idx_M, idx_norms))
    base = _out_schema(probe_df, id_col)
    schema = T.StructType(base.fields + [T.StructField("rank", T.IntegerType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_i, M_i, norms_i = b.value
        for pb in batches:
            if len(pb) == 0 or len(ids_i) == 0:
                continue
            q_ids = pb[id_col].to_numpy()
            Q = np.stack(pb[vec_col].to_numpy()).astype(np.float64)
            q_norms = np.linalg.norm(Q, axis=1)
            # round_det's exact floor-half-up form, NOT np.round (half-even)
            S = np.floor((Q @ M_i.T) / np.outer(q_norms, norms_i) * 1e6 + 0.5) / 1e6
            kk = min(k, S.shape[1])
            out_q, out_n, out_s, out_r = [], [], [], []
            for r in range(S.shape[0]):
                order = np.lexsort((ids_i, -S[r]))[:kk]
                out_q.extend([q_ids[r]] * len(order))
                out_n.extend(ids_i[order])
                out_s.extend(S[r, order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_n,
                    "cos_sim": out_s,
                    "rank": out_r,
                }
            )

    from dffoo_data_pipeline_spark.sources.readers import ensure_min_partitions

    return ensure_min_partitions(probe_df.select(id_col, vec_col), id_col).mapInPandas(
        gen, schema
    )
