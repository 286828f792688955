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
    driver only orchestrates; no rank data is collected.

    The returned plan deliberately nests all PR_ITERS rounds (r10,
    measured): PR_ITERS is a compile-time constant, so plan depth is
    bounded by design — unlike kcore's data-dependent peel, which MUST
    checkpoint per round. Truncating lineage here with per-round
    localCheckpoint(eager=False) was built and interleave-measured at
    sf0.1: the flat plan costs +40..+120% wall clock (four checkpoint
    materialization barriers and extra broadcast builds of O(nations)
    frames replace one pipelined AQE execution whose per-round exchanges
    move only O(nations) rows), and a broadcast hint on the contrib join
    alone is noise-neutral. Both variants rejected; see
    OPTIMIZATION_r10.md resume 6."""
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
        .localCheckpoint(eager=False)  # the normalized edge list is reused every round
    )
    outw = raw.groupBy("src").agg(F.sum("w").alias("ow"))
    e = raw.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("ow")).alias("frac")
    ).localCheckpoint(eager=False)
    nodes = raw.select(F.col("src").alias("node")).union(
        raw.select("dst")
    ).distinct().localCheckpoint(eager=False)
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


_TRI_EDGES = """
    raw AS (
      SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE cn.n_name <> sn.n_name),
    edges AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw)
"""


@query(
    "graph_triangle_count",
    oracle="WITH "
    + _TRI_EDGES
    + """,
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY node),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b),
    per_node AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY node)
    SELECT d.node, d.degree, COALESCE(p.n_tri, 0) AS n_tri,
           ROUND(COALESCE(p.n_tri, 0) * 2.0
                 / (d.degree * (d.degree - 1)), 6) AS clustering
    FROM deg d LEFT JOIN per_node p ON p.node = d.node
    WHERE d.degree >= 2
    """,
    category="llm",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counting + local clustering coefficient on the
    undirected nation trade graph — the community-density primitive behind
    spam-graph detection and graph feature engineering. Triangles are
    enumerated ONCE each via canonical edge orientation (a < b < c): two
    joins over the oriented edge list, the standard distributed algorithm
    whose join fan-in is bounded by per-vertex degree (at web scale the
    orientation is by degree, which caps the heavy side at O(sqrt(m));
    lexicographic suffices for the 25-nation graph and keeps the oracle
    identical). Edge build reuses the PageRank dims-broadcast join chain;
    everything downstream shuffles only the tiny edge/triangle frames."""
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
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    edges = raw.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = edges
    e2 = edges.select(F.col("a").alias("a2"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("a3"), F.col("b").alias("b3"))
    tri = (
        e1.join(e2, (F.col("a2") == F.col("a")) & (F.col("c") > F.col("b")))
        .join(e3, (F.col("a3") == F.col("b")) & (F.col("b3") == F.col("c")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0).cast("long")).alias("n_tri"),
            F.round(
                F.coalesce(F.col("n_tri"), F.lit(0).cast("long"))
                * 2.0
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering"),
        )
    )


def _link_prediction_oracle() -> str:
    from db_core_spark.queries.tpch2 import _PARTSUPP_CTE

    return f"""
    WITH {_PARTSUPP_CTE},
    deg AS (
      SELECT ps_suppkey, CAST(COUNT(DISTINCT ps_partkey) AS BIGINT) AS d
      FROM partsupp GROUP BY 1),
    pairs AS (
      SELECT a.ps_suppkey AS supp_a, b.ps_suppkey AS supp_b,
             CAST(COUNT(*) AS BIGINT) AS common
      FROM partsupp a
      JOIN partsupp b ON a.ps_partkey = b.ps_partkey
                     AND a.ps_suppkey < b.ps_suppkey
      GROUP BY 1, 2)
    SELECT p.supp_a, p.supp_b, p.common,
           ROUND(p.common * 1.0 / (da.d + db.d - p.common), 6) AS jaccard
    FROM pairs p
    JOIN deg da ON da.ps_suppkey = p.supp_a
    JOIN deg db ON db.ps_suppkey = p.supp_b
    ORDER BY jaccard DESC, p.supp_a, p.supp_b
    LIMIT 20
    """


from db_core_spark.registry import query as _query  # noqa: E402


def _register_link_prediction() -> None:
    @_query(
        "graph_link_prediction_jaccard",
        oracle=_link_prediction_oracle(),
        category="llm",
    )
    def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Link prediction on the supplier co-supply graph (suppliers are
        linked through the parts they both stock, partsupp as the bipartite
        edge list): common-neighbor counts and Jaccard similarity per
        supplier pair, top-20 predicted links. The classic
        collaborative-filtering / who-else-supplies-this kernel.

        100 TB shape: pairs come from the POSTING-LIST self-join keyed on
        the shared part (per-part fan-out is bounded at C(4,2)=6 pairs, the
        same basket-bounded argument as itemset_cooccurrence_pairs), never
        an all-pairs supplier product; degrees are a tiny aggregate joined
        back broadcast; TakeOrderedAndProject bounds the output."""
        from db_core_spark.queries.tpch2 import synth_partsupp

        ps = synth_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
        deg = ps.groupBy("ps_suppkey").agg(
            F.countDistinct("ps_partkey").alias("d")
        )
        a = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("supp_a"))
        b = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("supp_b"))
        pairs = (
            a.join(b, "k")
            .filter(F.col("supp_a") < F.col("supp_b"))
            .groupBy("supp_a", "supp_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
        da = deg.select(F.col("ps_suppkey").alias("supp_a"), F.col("d").alias("da"))
        db_ = deg.select(F.col("ps_suppkey").alias("supp_b"), F.col("d").alias("db"))
        return (
            pairs.join(F.broadcast(da), "supp_a")
            .join(F.broadcast(db_), "supp_b")
            .select(
                "supp_a",
                "supp_b",
                "common",
                F.round(
                    F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6
                ).alias("jaccard"),
            )
            .orderBy(F.col("jaccard").desc(), "supp_a", "supp_b")
            .limit(20)
        )


_register_link_prediction()


def kcore_decompose(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """Iterative k-core peel over an undirected edge list (a, b): drop
    every node with degree < k, recompute, repeat to fixpoint — the
    classic O(rounds) distributed formulation. Each round is one degree
    aggregate + two semi-joins; only the shrinking edge frame shuffles,
    and the survivor set is what remains. Returns (node, core_degree).

    100 TB shape: identical to every fixed-round iteration here
    (pagerank/kmeans/closure): data stays distributed, the driver sees
    only the convergence counter. Rounds are bounded by max_rounds; the
    peel provably terminates in <= |V| rounds and empirically in a
    handful — and FAILS LOUDLY if max_rounds is exhausted before the
    fixpoint, because a partially-peeled graph is a silently wrong
    core, not an approximation. Note ``max_rounds`` must exceed the peel
    DEPTH by one: the fixpoint is only observed by an extra confirming
    round where the survivor count repeats (n == prev_n), so a peel that
    converges exactly on the last permitted round still raises —
    conservative by design (r9 ADVICE #4)."""
    ed = edges.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).unionAll(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
    # localCheckpoint, NOT persist: persist caches the data but keeps the
    # LOGICAL plan growing — by round ~50 of a deep peel the nested-join
    # plan stalls the optimizer (found by the r9 loud-fail pytest on a
    # 100-node path). Checkpointing truncates lineage each round, same as
    # the label-propagation loops, so round cost stays O(1) in rounds.
    cur = ed.localCheckpoint(eager=False)
    prev_n = -1
    for _ in range(max_rounds):
        deg = cur.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("x")
        n = keep.count()
        if n == prev_n:
            break
        prev_n = n
        cur = (
            cur.join(F.broadcast(keep), "x", "left_semi")
            .join(
                F.broadcast(keep.select(F.col("x").alias("y"))), "y", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    else:
        raise RuntimeError(
            f"kcore_decompose: peel did not reach a fixpoint in "
            f"{max_rounds} rounds; raise max_rounds (each round strictly "
            "shrinks the survivor set, so a larger cap always terminates)"
        )
    out = cur.groupBy("x").agg(F.count(F.lit(1)).alias("core_degree")).select(
        F.col("x").alias("node"), "core_degree"
    )
    return out


def _kcore_oracle(k: int = 3, unroll: int = 4) -> str:
    """Chained-CTE unroll of the k-core peel: `unroll` rounds of
    drop-degree<k + edge restriction. Peeling is monotone and idempotent at
    the fixpoint, so the unrolled result equals the true fixpoint whenever
    convergence happens within `unroll` rounds — the fixtures converge in
    ONE round at every SF (the synthetic co-supply graph is 4-regular-ish
    and sits entirely inside its 3-core; measured sf0.001/0.01/0.1), and
    the pytest fixpoint invariant (one more round changes nothing) guards
    the margin."""
    rounds = "".join(
        f"""
    k{r} AS (SELECT x FROM e{r} GROUP BY x HAVING COUNT(*) >= {k}),
    e{r + 1} AS (
      SELECT x, y FROM e{r}
      WHERE x IN (SELECT x FROM k{r}) AND y IN (SELECT x FROM k{r})),"""
        for r in range(unroll)
    )
    return f"""
    WITH ps AS (
      SELECT p_partkey AS pk,
             CAST((p_partkey + 7 + 13 * i.i) % s.ns AS BIGINT) AS supp
      FROM part
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      CROSS JOIN (SELECT COUNT(*) AS ns FROM supplier) s),
    e AS (
      SELECT DISTINCT a.supp AS a, b.supp AS b
      FROM ps a JOIN ps b ON a.pk = b.pk AND a.supp < b.supp),
    e0 AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),{rounds}
    _last AS (SELECT * FROM e{unroll})
    SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM _last GROUP BY x
    """


@query("graph_kcore_suppliers", oracle=_kcore_oracle(), category="llm")
def graph_kcore_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the supplier co-supply graph (edges = supplier pairs
    stocking a shared part, the graph_link_prediction_jaccard edge list):
    the maximal subgraph where every supplier has >= 3 co-supply
    partners — the dense-community filter used for seed expansion and
    spam-ring detection. The Spark side runs the true iterative fixpoint;
    the oracle unrolls 4 peel rounds as chained CTEs (exact because the
    peel is idempotent past convergence and the fixtures converge in 1
    round — see _kcore_oracle); pytest pins the invariants: every
    member's in-core degree >= k, the peel is a fixpoint (one more round
    changes nothing), and replay is deterministic."""
    from db_core_spark.queries.tpch2 import synth_partsupp

    ps = synth_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    a = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("a"))
    b = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("b"))
    edges = (
        a.join(b, "k")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return kcore_decompose(edges, k=3)


@query(
    "graph_degree_distribution",
    oracle="""
    WITH ps AS (
      SELECT p_partkey AS k,
             CAST((p_partkey + 7 + 13 * i.i) % s.ns AS BIGINT) AS supp
      FROM part
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      CROSS JOIN (SELECT COUNT(*) AS ns FROM supplier) s),
    edges AS (
      SELECT DISTINCT a.supp AS x, b.supp AS y
      FROM ps a JOIN ps b ON a.k = b.k AND a.supp < b.supp),
    deg AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT x FROM edges UNION ALL SELECT y FROM edges)
      GROUP BY x)
    SELECT d AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM deg), 4) AS pct
    FROM deg
    GROUP BY d
    """,
    category="llm",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier co-supply graph — the first
    diagnostic of any graph workload (a heavy tail says salt the hot
    vertices before any neighborhood join; a flat histogram says plain
    hash partitioning is fine). Edges from the bounded posting-list
    self-join (C(4,2) pairs per part); two tiny aggregates after."""
    from db_core_spark.queries.tpch2 import synth_partsupp

    ps = synth_partsupp(spark, sf_dir).select("ps_partkey", "ps_suppkey")
    a = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("x"))
    b = ps.select(F.col("ps_partkey").alias("k"), F.col("ps_suppkey").alias("y"))
    edges = (
        a.join(b, "k").filter(F.col("x") < F.col("y")).select("x", "y").distinct()
    )
    deg = (
        edges.select("x")
        .unionAll(edges.select(F.col("y").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tot = deg.agg(F.count(F.lit(1)).alias("t"))
    return (
        deg.groupBy(F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            "degree",
            "n_nodes",
            F.round(F.col("n_nodes") * 100.0 / F.col("t"), 4).alias("pct"),
        )
    )
