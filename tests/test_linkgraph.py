"""PageRank operator semantics: the Spark loop must reproduce a pure-
Python evaluation of the identical integer recurrence exactly (no
tolerance — that's the point of integer PageRank), plus structural
invariants of the registered nation-trade query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.operators.graph import pagerank
from dffoo_data_pipeline_spark.plans.linkgraph import (
    PR_DAMPING,
    PR_ITERS,
    PR_SCALE,
    graph_pagerank_nations,
)

# hand-built weighted digraph: a hub (n1) everyone cites, a dangling
# node (n4, no out-edges), and asymmetric weights
EDGES = [
    ("n2", "n1", 3),
    ("n3", "n1", 1),
    ("n1", "n2", 1),
    ("n3", "n2", 2),
    ("n2", "n4", 1),
]
NODES = ["n1", "n2", "n3", "n4"]


def _reference(iters: int, scale: int, d: int) -> dict[str, int]:
    outw: dict[str, int] = {}
    for s, _, w in EDGES:
        outw[s] = outw.get(s, 0) + w
    n = len(NODES)
    base = ((100 - d) * scale // 100) // n
    pr = {v: scale // n for v in NODES}
    for _ in range(iters):
        nxt = {v: base for v in NODES}
        for s, t, w in EDGES:
            nxt[t] += ((pr[s] * d) // 100) * w // outw[s]
        pr = nxt
    return pr


@pytest.mark.parametrize("iters", [1, 3, 10])
def test_pagerank_matches_integer_reference_exactly(spark, iters):
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    edges = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {r.node: r.pr for r in pagerank(nodes, edges, iterations=iters).collect()}
    assert got == _reference(iters, 10**9, 85)


def test_pagerank_mass_and_dangling(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], "node string")
    edges = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {r.node: r.pr for r in pagerank(nodes, edges).collect()}
    # flooring only ever LOSES mass; dangling mass (n4's) is dropped too
    assert 0 < sum(got.values()) <= 10**9
    # the dangling node keeps its teleport share
    assert got["n4"] >= ((100 - 85) * 10**9 // 100) // len(NODES)
    # the hub outranks the node nobody cites
    assert got["n1"] > got["n3"]


def test_nation_pagerank_rank_contract(spark, sf_dir):
    df = graph_pagerank_nations(spark, sf_dir)
    rows = df.collect()
    n = len(rows)
    assert 0 < n <= 25  # at most one node per nation
    assert sorted(r.pr_rank for r in rows) == list(range(1, n + 1))
    assert sum(r.pr for r in rows) <= PR_SCALE
    # ranking consistent with rank mass
    by_rank = sorted(rows, key=lambda r: r.pr_rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.pr > b.pr or (a.pr == b.pr and a.node < b.node)
    assert PR_ITERS == 10 and PR_DAMPING == 85
