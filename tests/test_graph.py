"""Connected-components transitivity (operators/graph.py)."""

from __future__ import annotations

from dffoo_data_pipeline_spark.operators.graph import connected_components


def test_chain_and_isolated(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id bigint")
    # chain 1-2-3-4 (diameter 3), pair 5-6, isolated 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "src bigint, dst bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_label_flows_against_edge_direction(spark):
    # min id sits at the DST end: symmetrization must carry it back
    nodes = spark.createDataFrame([(i,) for i in (10, 20, 1)], "id bigint")
    edges = spark.createDataFrame([(10, 20), (20, 1)], "src bigint, dst bigint")
    got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {10: 1, 20: 1, 1: 1}


def test_warns_when_not_converged(spark):
    import pytest

    from dffoo_data_pipeline_spark.operators.graph import ConvergenceWarning

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id bigint")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "src bigint, dst bigint"
    )
    with pytest.warns(ConvergenceWarning):
        partial = connected_components(nodes, chain, max_iterations=1)
        partial.collect()
    # converged run on the same graph must NOT warn
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", ConvergenceWarning)
        done = connected_components(nodes, chain)
        assert {r.cluster_id for r in done.collect()} == {1}


def test_connected_components_frees_intermediate_checkpoints(spark):
    """The iteration must unpersist superseded label generations and the
    symmetrized edge table — only the returned materialized result may
    stay pinned (at scale, leaking max_iterations label-table copies is
    an executor-memory leak)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id bigint")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "src bigint, dst bigint"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = connected_components(nodes, edges)
    out.count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_connected_components_reliable_checkpoint_mode(spark, tmp_path):
    """With a checkpoint dir configured, iterations cut lineage through
    RELIABLE checkpoints (durable files an executor loss can recover
    from) instead of executor-local blocks — results identical, files
    actually written, and SUPERSEDED generations deleted from durable
    storage (an iterations-deep job must not leak one table copy per
    round into the checkpoint volume).  The dir is unset afterwards so
    other tests keep the localCheckpoint fast path."""
    import os

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        nodes = spark.createDataFrame([(i,) for i in range(6)], "id bigint")
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], "src bigint, dst bigint"
        )
        got = {r.id: r.cluster_id for r in connected_components(nodes, edges).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
        resolved = sc.getCheckpointDir().removeprefix("file:")
        remaining = [d for d in os.listdir(resolved) if d.startswith("rdd-")]
        # the returned result's checkpoint is live; every superseded
        # iteration/edge-table generation must be gone
        assert len(remaining) == 1, remaining
    finally:
        sc._jsc.sc().setCheckpointDir(None)
    assert sc.getCheckpointDir() is None


def test_connected_components_pointer_jump_converges_long_chains(spark):
    """A 60-node path has diameter 59: plain min-label propagation needs
    59 rounds, but with the per-round pointer jump (label := min(label,
    label-of-label)) the frontier doubles, so max_iterations=8 (2^8 >
    60) must fully converge (r10 self-review: a 30-deep near-dup chain
    silently exceeded the old 25-round budget and the leakage split got
    partial cluster ids)."""
    from dffoo_data_pipeline_spark.operators.graph import connected_components

    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    got = connected_components(
        nodes, edges, max_iterations=8, on_nonconvergence="raise"
    ).collect()
    assert {r.cluster_id for r in got} == {0} and len(got) == n


def test_connected_components_raise_on_nonconvergence(spark):
    """on_nonconvergence='raise' (used by the leakage-safe split, where
    partial labels ARE the leak) aborts loudly instead of warning."""
    import pytest as _pytest

    from dffoo_data_pipeline_spark.operators.graph import connected_components

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    with _pytest.raises(RuntimeError, match="max_iterations"):
        connected_components(nodes, edges, max_iterations=1, on_nonconvergence="raise")
