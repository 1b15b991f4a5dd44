"""Link-graph analytics: PageRank centrality over a relationship graph.

Web-scale curation pipelines rank hosts by link centrality and use the
rank as a document quality prior (the Common-Crawl host-graph signal in
C4/RefinedWeb-style pipelines).  The testdata has no host graph, so the
registered query builds the analogous graph the TPC-H-ish tables do
support — the nation-level trade graph (supplier nation → customer
nation, weighted by shipped line items) — and runs the reusable
integer-exact operator (operators/graph.py:pagerank) over it.  Swap the
edge build for a (src_host, dst_host, n_links) frame and the identical
loop ranks the web.

The oracle unrolls the fixed ``PR_ITERS`` iterations as chained CTEs:
because the operator is pure BIGINT arithmetic, Spark's loop and the
DuckDB unroll agree bit-for-bit with no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


PR_ITERS = 10
PR_SCALE = 10**9
PR_DAMPING = 85  # percent


def _pagerank_oracle() -> str:
    """Unrolled-iteration DuckDB twin of the Spark loop (generated once at
    import; `//` is DuckDB floor division, matching Spark's `div`)."""
    base = f"((15 * CAST({PR_SCALE} AS BIGINT) // 100) // nn.n)"
    ctes = [
        f"""edges AS (
    SELECT sn.n_name AS src, cn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name)""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"pr0 AS (SELECT node, {PR_SCALE} // nn.n AS pr FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{k} AS (
    SELECT n2.node,
           {base} + COALESCE(SUM(((p.pr * {PR_DAMPING}) // 100) * e.w // o.ow), 0) AS pr
    FROM nodes n2 CROSS JOIN nn
    LEFT JOIN edges e ON e.dst = n2.node
    LEFT JOIN pr{k - 1} p ON p.node = e.src
    LEFT JOIN outw o ON o.src = e.src
    GROUP BY n2.node, nn.n)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(pr AS BIGINT) AS pr,
       CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS BIGINT) AS pr_rank
FROM pr{PR_ITERS}"""
    )


@_register("graph_pagerank_nations", _pagerank_oracle())
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation trade graph: an edge src→dst per
    (supplier-nation, customer-nation) pair weighted by the number of
    line items shipped between them (self-trade excluded); {PR_ITERS}
    integer-exact iterations at damping 0.85, rank mass in units of
    1e-9 (operators/graph.py:pagerank).

    Scale: the edge build is the q7-shaped join tree — lineitem joins
    supplier and orders⋈customer on their own keys (AQE broadcasts the
    small sides at test scale; at cluster scale they hash-join), with
    the 25-row nation dims explicitly broadcast — collapsing to a
    25×24-row edge list, checkpointed once so the 10-iteration loop
    never replays it.  On a host graph the same loop's per-iteration
    cost is one edges⋈rank shuffle + one dst-keyed SUM; nothing here is
    driver-bound except the scalar node count.
    """
    from dffoo_data_pipeline_spark.operators.graph import pagerank

    nat = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    edges = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")),
              F.col("s_nationkey") == F.col("sk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")),
              F.col("c_nationkey") == F.col("ck"))
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    # run the big join tree exactly once: the operator materializes its
    # inputs, but both `nodes` and `edges` here share the same expensive
    # subtree — checkpoint it at the source so neither re-runs it
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # interval 5 + one partition: two checkpoint jobs instead of ten,
    # single-task rounds — on a ≤25-node graph every round is
    # rows-trivial and task dispatch dominates; a host-scale graph
    # would keep the defaults (per-round truncation, cluster
    # parallelism)
    pr = pagerank(
        nodes,
        edges,
        iterations=PR_ITERS,
        scale=PR_SCALE,
        damping_pct=PR_DAMPING,
        checkpoint_interval=5,
        num_partitions=1,
    )
    rank = F.row_number().over(Window.orderBy(F.col("pr").desc(), "node"))
    return pr.select("node", "pr", rank.cast("bigint").alias("pr_rank"))
