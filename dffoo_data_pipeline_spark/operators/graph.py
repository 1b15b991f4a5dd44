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
convergence check is a scalar count).  `localCheckpoint` truncates the
lineage each round so the plan doesn't grow unboundedly.  For
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


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every node; cluster_id = min node id reachable.

    `edges` may be directed pairs (a<b); they are symmetrized here.
    Isolated nodes cluster with themselves.
    """
    und = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    und = und.distinct().localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    ).localCheckpoint(eager=True)

    changed = 0
    for _ in range(max_iterations):
        neighbor_labels = und.join(
            labels, und.src == labels.id, "inner"
        ).select(F.col("dst").alias("id"), "cluster_id")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed:
        # silent partial labels would be wrong-without-warning for a
        # long-chain graph; surface it so callers can raise max_iterations
        warnings.warn(
            f"connected_components stopped at max_iterations={max_iterations} "
            f"with {changed} labels still changing; cluster ids are not final",
            ConvergenceWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id"), F.col("cluster_id"))
