"""TPC-H-derived classic query pack, adapted to the fixture schema.

The fixtures (FIXTURES.md §A) are TPC-H-ish but lack partsupp,
l_commitdate/l_receiptdate/l_shipmode and p_container, so q2/q4/q9/q11/q12/
q16/q19/q20/q21 are not expressible; the eight below are the classics that
are. Absent in the reference (SURVEY.md §2C — db-core has no relational
operators); goal-derived surface. Each demonstrates a canonical distributed
plan shape noted in its docstring — the shapes that dominate 100 TB scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    category="tpch",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, zero joins. The whole query is
    one codegen stage + a single-row final agg; all three predicates push to
    the parquet reader (PushedFilters), so at 100 TB the cost is I/O on the
    pruned row groups only."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY supp_nation, cust_nation, l_year
    """,
    category="tpch",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: 6-table join. supplier/customer/nation are broadcast (small
    dims at any SF); the only shuffle is lineitem<->orders on orderkey, then
    the group-by reshuffles on the tiny (nation, nation, year) key. Cross-
    nation filter applied post-broadcast, costing nothing extra."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    o = table(spark, sf_dir, "orders")
    c = F.broadcast(table(spark, sf_dir, "customer"))
    n1 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    category="tpch",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue this quarter. Orders is
    date-pruned before the lineitem join; nation broadcast; top-20 runs as
    TakeOrderedAndProject (per-partition top-20, then driver merge — no
    global sort shuffle). Tie-broken on c_custkey for determinism."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            (
                F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100 + 0.5)
                / 100
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    category="tpch",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over customers. Two-level agg; the
    second group-by key (c_count) has tiny cardinality so AQE coalesces its
    shuffle to a handful of partitions. Left join keeps zero-order
    customers (COUNT(col) is null-aware)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_effect",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
    category="tpch",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. Part broadcasts (fixed
    catalog size vs. fact growth); conditional aggregation avoids a second
    pass. Single-row result — no final shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-06-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-07-01 00:00:00"))
    )
    p = F.broadcast(table(spark, sf_dir, "part"))
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0.0)))
            / F.sum(net),
            4,
        ).alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    category="tpch",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The scalar max is
    a one-row aggregate broadcast back onto the per-supplier revenue frame —
    fully distributed, no single-partition window anywhere: the revenue agg
    shuffles on l_suppkey, the max reduces map-side to one row per task,
    and the equality filter is a broadcast join (mirrors the oracle's
    uncorrelated MAX subquery; r6 rewrite of the r1 global-window max,
    which funneled the |suppliers| frame through one task)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # materialize the per-supplier aggregate ONCE: both the scalar max and
    # the probe side read it, so lineitem is scanned a single time AND the
    # equality filter compares rounded sums from one execution (two
    # independent executions could differ by an ulp at a .005 boundary
    # under a different shuffle-merge order — ADVICE r6)
    rev = rev.localCheckpoint(eager=False)
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.join(
        F.broadcast(mx), rev.total_revenue == F.col("_mx"), "inner"
    ).drop("_mx")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    return (
        top.join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH brand_lines AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice,
               AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
    )
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM brand_lines
    WHERE l_quantity < 0.5 * avg_qty
    """,
    category="tpch",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (brand-adapted: fixtures lack p_container): revenue lost if
    small-quantity orders vanished. The classic correlated subquery becomes
    a window avg per partkey — one shuffle on l_partkey instead of a
    self-join, after the broadcast part-filter cut the input to one brand."""
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    )
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
    category="tpch",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders. The HAVING subquery and
    the outer SUM aggregate the SAME per-order quantity, so one lineitem
    pass computes both: aggregate once, filter > 300, and the surviving
    rare-key frame (orderkey, total_qty) joins orders + broadcast customer
    directly — no lineitem re-join, no second orderkey shuffle of the fact
    table (the r6 plan scanned lineitem twice and re-aggregated the joined
    rows; the r7 tpch sf1 screen flagged it at 4.8x per 10x). Grouping by
    the order key makes the two formulations provably equal: every joined
    row of one order carries the same (custkey, name, totalprice)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = table(spark, sf_dir, "orders")
    c = F.broadcast(table(spark, sf_dir, "customer"))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT l_year,
           ROUND(SUM(CASE WHEN s_nation = 'NATION_7' THEN vol ELSE 0 END)
                 / SUM(vol), 6) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o.o_orderdate) AS INT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS vol,
               n2.n_name AS s_nation
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY l_year
    """,
    category="tpch",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_7's share of ASIA-region STANDARD-part revenue by
    year. Seven-way star join where EVERY dimension (part filtered to one
    type, supplier, customer, nation x2, region) broadcasts; the fact table
    is never shuffled for the joins — only the final tiny group-by on
    l_year moves data. The share is a conditional-sum ratio in one pass."""
    p = F.broadcast(table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD"))
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = F.broadcast(table(spark, sf_dir, "customer"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n1 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = F.broadcast(table(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("s_nation")
    )
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("n1_key"))
        .join(r, F.col("n1_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("l_year", F.year("o_orderdate"))
        .groupBy("l_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("s_nation") == "NATION_7", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    category="tpch",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (container-free adaptation): revenue matching an OR of
    brand/size/quantity conjunctions. The part side is pre-filtered to the
    union of the three brand terms (derivable superset predicate) so the
    broadcast build is three brands, not the whole catalog; the residual
    disjunction evaluates post-join inside one codegen stage. At 100 TB the
    l_quantity bounds (1..30) also push to the scan as a range filter."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    p = F.broadcast(
        table(spark, sf_dir, "part").filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        )
    )
    term = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(term)
        .agg((F.floor(rev * 100 + 0.5) / 100).alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT n.n_name AS cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           FLOOR(SUM(c.c_acctbal) * 100 + 0.5) / 100 AS totacctbal
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n.n_name
    """,
    category="tpch",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (nation-keyed adaptation: fixtures lack c_phone): wealthy
    customers with no RECENT order (lapsed accounts), by nation. The AVG
    scalar subquery is a one-row broadcast (cross join); the NOT EXISTS is a
    left_anti join — at 100 TB orders is date-pruned THEN projected to the
    single join column, so the anti-join shuffle moves 8 bytes per recent
    order; nation broadcasts."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    o_keys = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.floor(F.sum("c_acctbal") * 100 + 0.5) / 100).alias("totacctbal"),
        )
    )
