"""Iterative graph operators: connected components for dedup clustering.

A training-data pipeline needs TRANSITIVE dedup: if A≈B and B≈C, all
three are one cluster even when A and C don't directly match.  That's
connected components over the near-dup pair graph — an ITERATIVE
algorithm, the one operator family that isn't a single declarative plan.

Implementation: min-label propagation.  Each node starts labeled with its
own id; every iteration, each node takes the min of its own and its
neighbors' labels; converges in O(graph diameter) iterations (near-dup
clusters are tiny cliques, so 2-4 rounds in practice).

Scale: each iteration is one equi-join (edges ⋈ labels on the src id) +
one min-aggregation — linear shuffles, no driver data collection (the
convergence check is a scalar count).  Lineage is truncated each round
so the plan doesn't grow unboundedly — reliable `checkpoint` when a
checkpoint dir is set (fault-tolerant, the cluster mode), else
`localCheckpoint` (see `_tracked_checkpoint`).  For
billion-edge graphs the same loop holds; the well-known large-star/
small-star variant halves the rounds but keeps this exact join shape.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceWarning(UserWarning):
    """Min-label propagation exited at max_iterations with labels still
    changing — the returned cluster ids are partially propagated."""


def _persistent_ids(sc) -> set:
    ids, it = set(), sc._jsc.getPersistentRDDs().keySet().iterator()
    while it.hasNext():
        ids.add(it.next())
    return ids


def _ckpt_rdd_dirs(sc) -> set:
    """List the rdd-* checkpoint directories under the app's resolved
    checkpoint dir (works for file://, hdfs://, s3a:// — whatever the
    Hadoop FS of the configured dir is)."""
    jvm = sc._jvm
    path = jvm.org.apache.hadoop.fs.Path(sc.getCheckpointDir())
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return set()
    return {st.getPath().toString() for st in fs.listStatus(path)}


def _unpersist_ids(sc, handles: set) -> None:
    # free an intermediate checkpoint's storage — int handles are
    # block-manager RDD ids (localCheckpoint mode: executor memory/disk
    # accumulates max_iterations label-table copies otherwise), str
    # handles are superseded reliable-checkpoint directories (durable
    # storage accumulates one full table copy per iteration otherwise)
    m = sc._jsc.getPersistentRDDs()
    fs = None
    for h in handles:
        if isinstance(h, str):
            jvm = sc._jvm
            p = jvm.org.apache.hadoop.fs.Path(h)
            fs = fs or p.getFileSystem(sc._jsc.hadoopConfiguration())
            fs.delete(p, True)
        else:
            r = m.get(h)
            if r is not None:
                r.unpersist(False)


def _tracked_checkpoint(sc, df: DataFrame) -> tuple[DataFrame, set]:
    """Truncate lineage between iterations.

    Reliable (`df.checkpoint`) when a checkpoint dir is configured
    (session honors SPARK_GRAFT_CHECKPOINT_DIR) — the production choice
    at 100 TB, where localCheckpoint's executor-local blocks die with a
    lost executor and take the whole iterative job down.  Falls back to
    `localCheckpoint` (fast, no durable storage needed) when no dir is
    set — fine on a healthy local run.  In reliable mode the returned
    handle set names the new checkpoint directory, so superseded
    generations are DELETED from durable storage by `_unpersist_ids`
    exactly like superseded block-manager copies — without this, an
    iterations-deep job leaks one full table copy per round into the
    checkpoint volume.
    """
    if sc.getCheckpointDir() is not None:
        before = _ckpt_rdd_dirs(sc)
        out = df.checkpoint(eager=True)
        return out, _ckpt_rdd_dirs(sc) - before
    before = _persistent_ids(sc)
    out = df.localCheckpoint(eager=True)
    return out, _persistent_ids(sc) - before


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
    on_nonconvergence: str = "warn",
) -> DataFrame:
    """(id, cluster_id) for every node; cluster_id = min node id reachable.

    `edges` may be directed pairs (a<b); they are symmetrized here.
    Isolated nodes cluster with themselves.

    Each round does min-label propagation over edges PLUS one pointer
    jump (label := min(label, label-of-label)), so the frontier doubles
    per round and convergence is O(log diameter) instead of O(diameter)
    — 25 rounds covers any graph a 64-bit id space can hold (the plain
    propagation form needed diameter rounds, so a 30-deep near-dup
    template chain silently exceeded 25; r10 self-review).  The jump is
    a self-join of the materialized, subgraph-sized label frame — cheap
    next to the edge join — and cannot change the fixpoint (min
    reachable id), only reach it sooner.

    ``on_nonconvergence``: 'warn' (default) or 'raise'.  Callers whose
    OUTPUT SEMANTICS depend on final labels — the leakage-safe split,
    where a partial cluster id scatters one near-dup cluster across
    train and test, the precise leak the op exists to prevent — must
    pass 'raise': partial labels there are not degraded, they are
    wrong.
    """
    if on_nonconvergence not in ("warn", "raise"):
        raise ValueError(f"on_nonconvergence must be warn|raise, got {on_nonconvergence!r}")
    sc = nodes.sparkSession.sparkContext

    def _unpersist(ids: set) -> None:
        _unpersist_ids(sc, ids)

    def _checkpoint(df: DataFrame) -> tuple[DataFrame, set]:
        return _tracked_checkpoint(sc, df)

    und, und_ids = _checkpoint(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    # Iterate ONLY over nodes that touch an edge.  In a dedup graph the
    # overwhelming majority of documents are singletons (no near-dup
    # pair); keeping them out of the loop turns every iteration's join +
    # re-aggregation from corpus-sized into subgraph-sized (≪1% at real
    # scale — there, iterations dominate and the win is proportional to
    # corpus size; at sf0.1 the pair plan dominates and this still cuts
    # the leakage-split query 4.1s → 3.1s).  Isolated nodes are
    # trivially their own cluster and union back at the end.
    # endpoints come from the already-materialized `und` (the caller's
    # edges frame may be an expensive subtree — e.g. the Jaccard pair
    # plan — and must be evaluated exactly once); the tiny endpoint set
    # is checkpointed itself so `isolated` can be evaluated inside the
    # returned result after und's blocks are freed.
    ids = nodes.select(F.col(id_col).alias("id"))
    endpoints, ep_ids = _checkpoint(und.select(F.col("src").alias("id")).distinct())
    active = ids.join(endpoints, "id", "semi")
    isolated = ids.join(endpoints, "id", "anti").select(
        "id", F.col("id").alias("cluster_id")
    )
    labels, labels_ids = _checkpoint(
        active.select("id", F.col("id").alias("cluster_id"))
    )

    changed = 0
    for _ in range(max_iterations):
        neighbor_labels = und.join(
            labels, und.src == labels.id, "inner"
        ).select(F.col("dst").alias("id"), "cluster_id")
        prop = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer jump: label := min(label, label(label)).  Every label
        # is itself an active node id (a min over node ids), so the
        # self-join always resolves; left + coalesce for safety.  prop
        # stays UN-checkpointed: its subtree (a join of two materialized
        # frames + a subgraph-sized agg) evaluates twice inside the one
        # checkpoint below, which is cheaper than a second per-round
        # materialization + job barrier.
        # The convergence test rides INSIDE the checkpointed frame as a
        # `__chg` flag (one more equi-join of two materialized label
        # frames in the same job) so the per-round `changed` count is a
        # scan of the just-materialized blocks instead of its own
        # join+count job — one Spark job per round, not two (at bench
        # scale job dispatch, not data, dominates the loop; at cluster
        # scale the fused join is subgraph-sized either way).
        new_labels, new_ids = _checkpoint(
            prop.alias("a")
            .join(
                prop.select(
                    F.col("id").alias("__lid"), F.col("cluster_id").alias("__lcl")
                ),
                F.col("a.cluster_id") == F.col("__lid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(
                    F.col("a.cluster_id"),
                    F.coalesce(F.col("__lcl"), F.col("a.cluster_id")),
                ).alias("cluster_id"),
            )
            .alias("n")
            .join(
                labels.select(
                    F.col("id").alias("__oid"), F.col("cluster_id").alias("__ocl")
                ),
                F.col("n.id") == F.col("__oid"),
            )
            .select(
                "n.id",
                "n.cluster_id",
                (F.col("n.cluster_id") != F.col("__ocl")).alias("__chg"),
            )
        )
        changed = new_labels.where("__chg").count()
        new_labels = new_labels.drop("__chg")
        _unpersist(labels_ids)  # superseded label generation
        labels, labels_ids = new_labels, new_ids
        if changed == 0:
            break
    _unpersist(und_ids)
    if changed:
        msg = (
            f"connected_components stopped at max_iterations={max_iterations} "
            f"with {changed} labels still changing; cluster ids are not final"
        )
        if on_nonconvergence == "raise":
            _unpersist(labels_ids)
            _unpersist(ep_ids)
            raise RuntimeError(msg)
        # silent partial labels would be wrong-without-warning for a
        # long-chain graph; surface it so callers can raise max_iterations
        warnings.warn(msg, ConvergenceWarning, stacklevel=2)
    # one final materialization so every intermediate (subgraph labels,
    # endpoint set) can be freed — exactly ONE persistent RDD leaves this
    # function: the result
    result, _result_ids = _checkpoint(
        labels.select(F.col("id"), F.col("cluster_id")).unionByName(isolated)
    )
    _unpersist(labels_ids)
    _unpersist(ep_ids)
    return result


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    scale: int = 10**9,
    damping_pct: int = 85,
    checkpoint_interval: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Weighted PageRank in scaled INTEGER arithmetic → (node, pr BIGINT).

    ``edges`` = (src, dst, w BIGINT).  Rank mass is carried as integer
    units of 1/`scale`, and every step is integer multiply + floor
    division:

        pr₀(v)   = scale ÷ N
        prₖ₊₁(v) = ((100−d)·scale ÷ 100) ÷ N
                   + Σ_{(u,v)∈E} ((prₖ(u)·d ÷ 100) · w_uv ÷ outw_u)

    (÷ = floor division, d = `damping_pct`).  Integer arithmetic makes
    the fixpoint iteration bit-identical on every engine and independent
    of partitioning / summation order — the property float PageRank
    lacks — at the cost of ≤1 unit of mass lost per edge per round to
    flooring.  Dangling nodes (no out-edges) keep the teleport term and
    drop their damped mass — the standard "remove dangling mass"
    variant; sinks never accumulate unboundedly.

    Scale: each iteration is one shuffle join (edges ⋈ pr on src — at
    web-host scale both sides hash-partition on src; outw pre-joins
    edges once before the loop) + one SUM aggregation keyed by dst —
    the Pregel message pattern as two relational ops.  Lineage is
    truncated every `checkpoint_interval` rounds (`_tracked_checkpoint`:
    reliable with a checkpoint dir, else local) and
    superseded checkpoints freed, so executor storage holds ONE rank
    table, not `iterations` of them.  For a billion-node host graph
    keep the default interval of 1 (each round's shuffle output is the
    thing worth truncating); for a small analytic graph (the nation
    query) a larger interval folds several 25-row rounds into one
    optimized plan — each eager checkpoint is a full Spark job, and at
    that size job scheduling, not data, is the entire cost (measured
    4.1s → 0.6s for 10 rounds at interval 5).  Overflow headroom:
    pr ≤ scale, so the contribution product needs pr·d·w < 2^63 — with
    the default 1e9 scale that allows edge weights up to ~1e10; beyond
    that, re-scale the weights (only ratios w/outw matter) or carry
    DECIMAL(38,0).
    """
    sc = nodes.sparkSession.sparkContext

    def _sized(df: DataFrame) -> DataFrame:
        # `num_partitions` pins the loop's parallelism: a web-host graph
        # wants the cluster default (None), but an analytic graph of a
        # few hundred edges schedules 32 near-empty tasks per round
        # otherwise — task dispatch, not data, becomes the runtime
        return df.coalesce(num_partitions) if num_partitions else df

    # materialize the (possibly expensive) node/edge subtrees once; the
    # loop replays them every round otherwise — `nodes` feeds the
    # per-iteration left join, so an unmaterialized node frame built
    # from a big join tree would re-run that tree `iterations` times
    nodes, node_ids = _tracked_checkpoint(sc, _sized(nodes))
    n_nodes = nodes.count()  # one scalar aggregate to the driver (bounded)
    if n_nodes == 0:
        # the returned frame still reads the checkpointed blocks — do
        # NOT unpersist them here (empty checkpoint, zero storage)
        return nodes.select(F.col("node"), F.lit(0).cast("bigint").alias("pr"))
    base = ((100 - damping_pct) * scale // 100) // n_nodes

    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew, ew_ids = _tracked_checkpoint(
        sc, _sized(edges.join(outw, "src").select("src", "dst", "w", "ow"))
    )
    pr, pr_ids = _tracked_checkpoint(
        sc, nodes.select("node", F.lit(scale // n_nodes).cast("bigint").alias("pr"))
    )
    zero = nodes.select(F.col("node").alias("dst"), F.lit(0).cast("bigint").alias("c"))
    for it in range(1, iterations + 1):
        # one shuffle per round: edge messages ∪ a zero row per node
        # (keeps zero-in-degree nodes alive without a second join),
        # SUM keyed by dst
        messages = ew.join(pr, ew.src == pr.node).select(
            F.col("dst"),
            F.expr(f"((pr * {damping_pct}) div 100) * w div ow").alias("c"),
        )
        new_pr = (
            messages.unionByName(zero)
            .groupBy("dst")
            .agg((F.lit(base) + F.sum("c")).cast("bigint").alias("pr"))
            .select(F.col("dst").alias("node"), "pr")
        )
        if it % checkpoint_interval == 0 or it == iterations:
            new_pr, new_ids = _tracked_checkpoint(sc, _sized(new_pr))
            _unpersist_ids(sc, pr_ids)
            pr, pr_ids = new_pr, new_ids
        else:
            pr = new_pr
    _unpersist_ids(sc, ew_ids)
    # the returned frame is the final pr checkpoint — it no longer reads
    # the node table's checkpoint, which would otherwise leak one copy
    # per pagerank call (executor blocks locally; durable checkpoint
    # dirs in reliable mode)
    _unpersist_ids(sc, node_ids)
    return pr
