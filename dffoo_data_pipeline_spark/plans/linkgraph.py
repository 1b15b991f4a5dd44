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
    # aggregate on the 4-byte nationkey ints and attach names to the
    # ≤25×24-row RESULT (guide §2.3: the fact-fact l_orderkey exchange
    # used to carry the src nation NAME string through the whole tree;
    # n_name is unique per n_nationkey, so filter and counts transfer)
    iedges = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy("s_nationkey", "c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    edges = (
        iedges.join(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")),
                    F.col("s_nationkey") == F.col("sk"))
        .join(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")),
              F.col("c_nationkey") == F.col("ck"))
        .select("src", "dst", "w")
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


_TRIANGLE_ORACLE = """
WITH dedges AS (
    SELECT DISTINCT sn.n_name AS src, cn.n_name AS dst
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name),
und AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM dedges),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM und e1
    JOIN und e2 ON e1.b = e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tri_nodes AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM tri_nodes GROUP BY node
"""


@_register("graph_triangle_count", _TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count over the undirected nation trade graph —
    the clustering-coefficient numerator used to score link-farm vs
    organic neighborhoods in host-graph curation (and the classic
    node-iterator graph benchmark).

    Each triangle {x<y<z} is enumerated exactly once by orienting every
    edge low→high and joining oriented 2-paths (x→y→z) against the
    closing edge (x→z); per-node counts come from exploding the three
    corners of each enumerated triangle.

    Scale: triangle enumeration is the standard two-shuffle oriented
    join — edge orientation caps each node's join fan-out by its
    HIGHER-id neighbors (on a real host graph: orient by degree, which
    bounds wedge fan-out by O(sqrt(|E|)) per node).  The trade-graph
    edge list collapses from the lineitem join tree to ≤ 25×24/2 rows
    and feeds three join sides, so it is checkpointed once (lazy — the
    one-time plan compile is the price of not re-running the 5-way join
    three times).
    """
    nat = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # distinct on the 4-byte nationkey ints, names attached to the
    # ≤25×24-row result (guide §2.3 — same int-key edge build as
    # graph_pagerank_nations; n_name is unique per n_nationkey, so the
    # self-edge filter and the distinct edge SET transfer exactly)
    idedges = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select("s_nationkey", "c_nationkey")
        .distinct()
    )
    dedges = (
        idedges.join(nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")),
                     F.col("s_nationkey") == F.col("sk"))
        .join(nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")),
              F.col("c_nationkey") == F.col("ck"))
        .select("src", "dst")
    )
    und = (
        dedges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )
    # one pass over the triangle join: the former 3-way unionAll of
    # per-corner projections gave the 2-SMJ triangle subtree three
    # consumers, and Spark clones unshared subtrees per consumer — the
    # whole enumeration ran three times (r12 before-plan: 6 SortMergeJoin
    # for a 2-join algorithm).  explode(array(x,y,z)) emits the same
    # three corner rows per triangle from a single enumeration.
    corners = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


_HIER_MAX_DEPTH = 8

_HIERARCHY_ORACLE = """
WITH RECURSIVE closure AS (
    SELECT p_partkey // 10 AS anc, p_partkey AS des, 1 AS depth
    FROM part WHERE p_partkey >= 10
  UNION ALL
    SELECT e.p_partkey // 10 AS anc, c.des, c.depth + 1
    FROM closure c JOIN part e ON c.anc = e.p_partkey
    WHERE e.p_partkey >= 10
)
SELECT anc AS ancestor_key,
       CAST(COUNT(*) AS BIGINT) AS n_descendants,
       CAST(MAX(depth) AS INT) AS max_depth,
       CAST(SUM(CAST(pr.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS subtree_retail
FROM closure JOIN part pr ON closure.des = pr.p_partkey
GROUP BY anc
"""


@_register("hierarchy_rollup_closure", _HIERARCHY_ORACLE)
def hierarchy_rollup_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-closure hierarchy rollup — the BOM-explosion / org-chart
    query engines express with WITH RECURSIVE, which Spark SQL lacks:
    every part's parent is p_partkey div 10 (a deterministic decimal-trie
    hierarchy over the real part table), and each ancestor aggregates its
    FULL subtree — descendant count, deepest level, total retail value.
    The oracle runs the genuine recursive CTE in DuckDB; the Spark side
    unrolls the recursion as a fixed-depth iterative expansion, the
    standard translation (same loop shape as operators/graph.py's
    connected components).

    Scale: each level is one equi-join of the previous frontier against
    the edge list on the ancestor key, so a depth-d hierarchy costs d
    co-keyed shuffles; the div-10 trie bounds d ≤ log10(max key)
    (depth 5 at sf0.1), and levels past exhaustion are empty joins AQE
    collapses at runtime.  The unroll depth of 8 covers keys < 10^8;
    deeper-than-unroll data belongs to the checkpointed doubling loop of
    the CC operator, not a longer union.  The rollup itself shuffles once
    on the ancestor key with map-side partials; retail money stays
    DECIMAL until the final DOUBLE cast.
    """
    part = load_table(spark, sf_dir, "part")
    edges = part.where(F.col("p_partkey") >= 10).select(
        F.col("p_partkey").alias("child"),
        F.expr("p_partkey div 10").alias("parent"),
    )
    closure = edges.select(
        F.col("parent").alias("anc"),
        F.col("child").alias("des"),
        F.lit(1).alias("depth"),
    )
    frontier = closure
    for depth in range(2, _HIER_MAX_DEPTH + 1):
        step = edges.select(
            F.col("child").alias("step_child"), F.col("parent").alias("step_parent")
        )
        frontier = frontier.join(
            step, frontier["anc"] == step["step_child"]
        ).select(
            F.col("step_parent").alias("anc"),
            F.col("des"),
            F.lit(depth).alias("depth"),
        )
        closure = closure.unionByName(frontier)
    retail = part.select("p_partkey", F.col("p_retailprice").cast("decimal(12,2)").alias("pr"))
    return (
        closure.join(retail, closure["des"] == retail["p_partkey"])
        .groupBy("anc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_descendants"),
            F.max("depth").cast("int").alias("max_depth"),
            F.sum("pr").cast("double").alias("subtree_retail"),
        )
        .withColumnRenamed("anc", "ancestor_key")
    )


_BFS_TOPK_EDGES = 3  # strongest outgoing partners kept per nation
_BFS_MAX_HOPS = 4

_BFS_EDGE_SQL = f"""
raw AS (
    SELECT sn.n_name AS src, cn.n_name AS dst, CAST(COUNT(*) AS BIGINT) AS w
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name),
edges AS (
    SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
        FROM raw)
    WHERE rn <= {_BFS_TOPK_EDGES}),
seed AS (SELECT MIN(src) AS node FROM edges)"""

_BFS_ORACLE = f"""
WITH RECURSIVE {_BFS_EDGE_SQL},
walk AS (
    SELECT node, CAST(0 AS BIGINT) AS d FROM seed
    UNION ALL
    SELECT e.dst, w.d + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.d < {_BFS_MAX_HOPS})
SELECT node, CAST(MIN(d) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@_register("graph_khop_distances", _BFS_ORACLE)
def graph_khop_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path distances (≤ 4 hops) from the lexicographically
    first nation over the SPARSIFIED trade graph — each nation keeps
    only its 3 strongest outgoing partners, which is both the realistic
    analytics shape ("primary trading partner" networks) and what makes
    hop distances informative (the full trade graph is near-complete,
    so everything would sit at distance 1).  The oracle runs DuckDB's
    genuine WITH RECURSIVE, depth-bounded so cycles terminate; the
    Spark side is the frontier-expansion loop every distributed BFS
    uses.

    Scale: the expensive part is the edge aggregation (one pass over
    the fact joins, checkpointed); each BFS round is a frontier⋈edges
    join plus an anti-join against settled nodes — Pregel's BFS as two
    relational ops, with frontier size bounded by the node set.
    Determinism: pure integer hops over a deterministic edge set
    (top-k ties broken on dst).
    """
    nat = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    raw = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            nat.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")),
            F.col("s_nationkey") == F.col("sk"),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            nat.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")),
            F.col("c_nationkey") == F.col("ck"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    wtop = Window.partitionBy("src").orderBy(F.desc("w"), "dst")
    edges = (
        raw.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") <= _BFS_TOPK_EDGES)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    dist = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    frontier = dist
    for _ in range(_BFS_MAX_HOPS):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            .join(dist.select(F.col("node").alias("seen")), F.col("node") == F.col("seen"), "left_anti")
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        ).localCheckpoint(eager=True)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist
