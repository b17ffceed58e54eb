"""Iterative graph analytics: exact-integer PageRank.

The registry's second iterative-algorithm class beside
``dedup.min_label_components`` (connected components): a fixed-iteration
PageRank over the customer-supplier trade graph, exact in scaled integer
arithmetic so a DuckDB oracle can check it bit-for-bit. The reference's
single-table pipeline has no graph step; this is part of the mandated
LLM-pipeline extension surface (link-graph quality signals -- PageRank
over a hyperlink/citation graph is a standard document-quality prior,
e.g. the Common Crawl harmonic/PageRank centrality lists used by CCNet
descendants).

Why fixed-iteration + integers: float PageRank accumulates in
engine-specific reduction orders, so equality-checking it cross-engine
is hopeless. Here every rank is a BIGINT in 1e-12 units, each
per-edge share is one integer division ``rank DIV out_degree``, the
damping step is ``(15 * base) DIV 100 + (85 * inflow) DIV 100`` -- all
order-insensitive integer sums and truncating divisions written
textually identically on both engines, and ITERS is a shared constant,
so Spark and the mechanically-unrolled SQL oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table

# Shared constants: the Spark loop and the unrolled oracle are generated
# from the SAME values (the _macd_oracle stance), so damping or scale
# cannot drift between engines.
PR_SCALE = 10**12  # rank unit = 1e-12 of total probability mass
PR_ITERS = 5
_D_NUM, _T_NUM, _DEN = 85, 15, 100  # damping 0.85 as exact integers
_TOP_K = 20


def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer-supplier trade graph: nodes
    are ``C<custkey>`` / ``S<suppkey>``, with a symmetric edge for every
    distinct (customer, supplier) trading pair in
    orders JOIN lineitem. Emits the top-20 nodes by rank -- "which
    counterparties are most central to the trade network", the
    graph-centrality question a curation pipeline asks of a link graph.

    Exactness: see the module docstring -- every emitted value is an
    exact BIGINT; the (rank DESC, node ASC) order is total, so the
    top-20 subset is deterministic.

    Scale shape: the fact tables are touched ONCE (the distinct-pair
    edge build); each of the 5 iterations joins the |V|-row rank table
    to the edge list and aggregates inflow per destination -- at fixture
    scale the rank/degree tables broadcast, so the only per-iteration
    shuffle is the edge-keyed groupBy. At 100 TB |V| outgrows broadcast:
    the same loop runs with ranks/degrees/edges co-hash-partitioned on
    the node key (every join and the groupBy then reuse ONE
    partitioning), which is exactly how the connected-components loop
    scales. ``localCheckpoint`` truncates lineage so iteration N's plan
    does not re-derive iterations 1..N-1."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank_core(edges).limit(_TOP_K)


def pagerank_core(edges: DataFrame) -> DataFrame:
    """Fixed-iteration exact-integer PageRank over a directed edge list
    ``(src, dst)`` (distinct rows). Returns every node with its final
    scaled rank, ordered (rank DESC, node ASC). Separated from the query
    so the hypothesis brute force can drive it on arbitrary graphs --
    including dangling nodes (dst-only: they receive inflow but emit
    none; their mass is dropped, the standard simplification, identical
    on both sides)."""
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("outd")
    )
    n_df = nodes.agg(F.count("*").cast("long").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"CAST({PR_SCALE} DIV n AS BIGINT)").alias("r")
    )
    for _ in range(PR_ITERS):
        shares = ranks.join(deg, "node").select(
            "node", F.expr("CAST(r DIV outd AS BIGINT)").alias("share")
        )
        inflow = (
            edges.join(
                F.broadcast(shares.withColumnRenamed("node", "src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").cast("long").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(F.broadcast(inflow), "node", "left")
            .select(
                "node",
                F.expr(
                    f"CAST(({_T_NUM} * ({PR_SCALE} DIV n)) DIV {_DEN}"
                    f" + ({_D_NUM} * COALESCE(s, CAST(0 AS BIGINT)))"
                    f" DIV {_DEN} AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", F.col("r").alias("rank_scaled")
    ).orderBy(F.col("rank_scaled").desc(), "node")


def _pagerank_oracle() -> str:
    """Mirror of pagerank_trade_graph: the iteration count, scale, and
    damping integers generate the unrolled CTE chain, so engine and
    oracle share every constant."""
    cte = [
        """pairs AS (
            SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                   'S' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )""",
        """edges AS (
            SELECT src, dst FROM pairs
            UNION ALL SELECT dst, src FROM pairs
        )""",
        """nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst AS node FROM edges
            )
        )""",
        """deg AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outd
            FROM edges GROUP BY src
        )""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"""r0 AS (
            SELECT node, CAST({PR_SCALE} // n AS BIGINT) AS r
            FROM nodes CROSS JOIN nn
        )""",
    ]
    for i in range(1, PR_ITERS + 1):
        cte.append(f"""s{i} AS (
            SELECT e.dst AS node, CAST(SUM(r.r // d.outd) AS BIGINT) AS s
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN deg d ON e.src = d.node
            GROUP BY e.dst
        )""")
        cte.append(f"""r{i} AS (
            SELECT nodes.node,
                   CAST(({_T_NUM} * ({PR_SCALE} // nn.n)) // {_DEN}
                        + ({_D_NUM} * COALESCE(s{i}.s, CAST(0 AS BIGINT)))
                        // {_DEN} AS BIGINT) AS r
            FROM nodes CROSS JOIN nn
            LEFT JOIN s{i} ON nodes.node = s{i}.node
        )""")
    body = ",\n        ".join(cte)
    return f"""
        WITH {body}
        SELECT node, r AS rank_scaled FROM r{PR_ITERS}
        ORDER BY r DESC, node LIMIT {_TOP_K}
    """


QUERIES = {
    "g_pagerank": pagerank_trade_graph,
}

ORACLES = {
    # Unrolled fixed-iteration integer PageRank; every value BIGINT.
    "g_pagerank": _pagerank_oracle(),
}
