"""Iterative graph analytics on relational data: weighted PageRank over the
nation-to-nation trade graph.

Goal-derived (SURVEY.md §2C — the reference has no relational operators).
Complements the min-label-propagation connected components in
`queries/llm.py::dedup_cluster_components`: that one iterates to a
data-dependent fixpoint, this one runs a FIXED number of damped power
iterations — the other canonical distributed-iteration shape (fixed rounds,
join + aggregate per round, loop on the driver, data never leaves the
cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table

DAMPING = 0.85
PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Chained-CTE oracle: p0 .. p5 unrolled (no recursion needed for a fixed
    iteration count)."""
    base = """
    WITH raw AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    outw AS (SELECT src, SUM(w) AS ow FROM raw GROUP BY 1),
    e AS (SELECT r.src, r.dst, r.w / o.ow AS frac FROM raw r JOIN outw o USING (src)),
    nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    p0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn)
    """
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f""",
    p{i} AS (
      SELECT n.node,
             (1 - {DAMPING}) / nn.n
               + {DAMPING} * COALESCE(s.m, 0) AS pr
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst, SUM(e.frac * p.pr) AS m
        FROM e JOIN p{i - 1} p ON p.node = e.src GROUP BY e.dst) s
        ON s.dst = n.node)"""
        )
    return (
        base
        + "".join(steps)
        + f"""
    SELECT node AS nation, ROUND(pr, 6) AS pagerank FROM p{PR_ITERS}
    """
    )


@query("graph_pagerank_trade", oracle=_pagerank_oracle(), category="llm")
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 5 power iterations) over the
    customer-nation -> supplier-nation trade graph, edge weight = lineitem
    count. Identifies the nations central to the supply network — the same
    iteration pattern ranks domains in a crawl graph for corpus curation.

    Simplified formulation (identical in both engines): no dangling-mass
    redistribution — every nation in this graph has out-edges, and a fixed
    iteration count replaces convergence detection. Scale shape: the rank
    vector is O(nodes) and stays distributed; each round is one
    broadcast-join of the (small) rank vector onto the partitioned edge list
    + one aggregate — edges are the 100 TB side and are scanned once per
    round, never reshuffled (the edge list is pre-normalized ONCE). The
    driver only orchestrates; no rank data is collected."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("dst")
    )
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint()  # the normalized edge list is reused every round
    )
    outw = raw.groupBy("src").agg(F.sum("w").alias("ow"))
    e = raw.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("frac")
    ).localCheckpoint()
    nodes = raw.select(F.col("src").alias("node")).union(
        raw.select("dst")
    ).distinct().localCheckpoint()
    n_nodes = float(nodes.count())
    pr = nodes.select("node", (F.lit(1.0) / F.lit(n_nodes)).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            e.join(F.broadcast(pr), e.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("pr")).alias("m"))
        )
        pr = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            (
                F.lit((1 - DAMPING) / n_nodes)
                + F.lit(DAMPING) * F.coalesce(F.col("m"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select(F.col("node").alias("nation"), F.round("pr", 6).alias("pagerank"))
