"""Joins: inner/left/right/full/semi/anti/cross, theta (non-equi), broadcast,
multiway. Absent in the reference (SURVEY.md §2C — db-core has no joins);
goal-derived surface. Catalyst picks broadcast vs sort-merge vs shuffled-hash;
we hint broadcast only where it is correct at ANY scale (region/nation are
fixed-cardinality dims) and let AQE convert the rest at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "join_inner_agg",
    oracle="""
    SELECT o.o_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey
    HAVING COUNT(*) >= 4
    """,
    category="join",
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation + HAVING. Both sides shuffle on the
    join key; the groupBy reuses the same hash partitioning (one shuffle,
    not two) because the agg key == join key.

    r10: the per-order revenue sums DECIMAL(18,4) on both engines — with
    28k output groups, order-dependent double-sum noise flipped the 2-dp
    round on 17 of them at sf0.1 (pre-existing; found by this round's
    full sf0.1 gate, the graded sf0.01 gate always passed). Same
    exact-and-order-free decimal pattern as pareto_revenue_concentration;
    the per-row product doubles are bit-identical across engines and
    never land exactly on a .xxxx5 cast boundary, so the cast is
    portable. Output stays DOUBLE."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 4)
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    category="join",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; COUNT(col) counts only matched rows (NULL-aware)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 400000
    """,
    category="join",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "c_name")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_orders AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
                        FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
    SELECT COALESCE(b.c_custkey, g.o_custkey) AS custkey,
           b.c_acctbal, g.n
    FROM big_cust b FULL OUTER JOIN big_orders g ON b.c_custkey = g.o_custkey
    """,
    category="join",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered sides with COALESCE'd key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big_cust = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    big_orders = (
        o.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = big_cust.join(big_orders, big_cust.c_custkey == big_orders.o_custkey, "full")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_acctbal", "n"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    """,
    category="join",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS. No row duplication, right side only probed."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS (customers with no orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    category="join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — only ever sane between tiny dimensions; Spark
    plans BroadcastNestedLoopJoin here."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_theta_pairs",
    oracle="""
    SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS regionkey
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
    category="join",
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component (regionkey) + non-equi inequality. The
    equi part keys the shuffle; the inequality is a post-join filter —
    the scalable shape for any 'pairs within group' problem."""
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
            F.col("n1.n_regionkey").alias("regionkey"),
        )
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region_name, ROUND(SUM(c.c_acctbal), 2) AS total_balance,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    category="join",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicit broadcast of the fixed-size dims
    (region=5, nation=25 rows at every SF) — zero shuffle for the joins;
    the only shuffle is the final 5-group aggregation."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "q5_multiway_join",
    oracle="""
    SELECT n.n_name AS nation_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
    category="join",
)
def q5_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join. The region filter prunes before joining
    (Catalyst pushes it through the join); nation/region broadcast; supplier
    and customer are broadcast-eligible at small SF and AQE decides at scale."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "join_range_events",
    oracle="""
    SELECT o.o_orderkey, CAST(COUNT(e.event_id) AS BIGINT) AS n_events_month_after
    FROM orders o
    JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts - INTERVAL 29 YEAR >= o.o_orderdate
     AND e.ts - INTERVAL 29 YEAR < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY o.o_orderkey
    """,
    category="join",
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: equi key (user) + time-range predicate. Shuffles on the
    equi key only — the range condition filters within co-located partitions,
    which scales linearly with per-key density rather than cross-product.
    The 29-year shift aligns the events fixture's 2024 epoch onto the
    orders' 1995+ calendar so the range predicate actually selects rows
    (identical expression on both engines)."""
    o = table(spark, sf_dir, "orders")
    e = table(spark, sf_dir, "events").withColumn(
        "ts_aligned", F.expr("ts - INTERVAL 29 YEAR")
    )
    return (
        o.join(
            e,
            (e.user_id == o.o_custkey)
            & (F.col("ts_aligned") >= o.o_orderdate)
            & (F.col("ts_aligned") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_month_after"))
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT l.l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l.l_quantity), 2) AS qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_orderkey
    """,
    category="join",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: identical semantics to a plain inner join (the
    oracle IS the plain join), but the big side's hot keys are spread over
    salt buckets so no single task owns a pathological key. At 100 TB this is
    the manual fallback when AQE skew-split can't help (e.g. a single key
    larger than one executor's memory)."""
    from db_core_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return (
        salted_join(li, o, "l_orderkey", salt_buckets=8)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


BLOOM_BITS = 1 << 16  # m: 65536 bits = 1024 longs
BLOOM_SEEDS = (1, 2, 3)  # k: 3 hash functions


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice >= 450000
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
    category="join",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-prefiltered join: build a 65536-bit / 3-hash Bloom filter
    over the selective dim side (orders with o_totalprice >= 450000, ~10%),
    test every fact row against it map-side, and only then run the exact
    equi-join. Semantically identical to the plain join (the oracle IS the
    plain join): Bloom filters have no false negatives, and the exact join
    removes the ~2% false positives.

    This is the manual form of runtime row-level filtering (Spark's own
    `spark.sql.optimizer.runtime.bloomFilter` injects the same shape): at
    100 TB the win is that the fact side sheds ~90% of rows BEFORE the
    shuffle — the filter itself is 1024 (word_idx, bits) rows built with one
    tiny aggregation and broadcast, so membership tests are 3 broadcast hash
    joins with zero fact-side shuffle. Every hash is xxhash64 (codegen),
    never a Python UDF."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dims = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 450000)
        .select("o_orderkey", "o_totalprice")
    )

    def pos(key: F.Column, seed: int) -> F.Column:
        return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(BLOOM_BITS))

    # build: one explode(k) + one 1024-group aggregate over the dim side
    # (shiftleft's shift amount must be a column expression here, so spell it
    # via F.expr — still the same codegen'd JVM expression)
    bloom = (
        dims.select(
            F.explode(
                F.array(*[pos(F.col("o_orderkey"), s) for s in BLOOM_SEEDS])
            ).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    # probe: k broadcast joins, each testing one bit position map-side
    probed = li
    for s in BLOOM_SEEDS:
        b = bloom.select(
            F.col("word_idx").alias(f"w{s}"), F.col("bits").alias(f"m{s}")
        )
        probed = (
            probed.withColumn(f"_p{s}", pos(F.col("l_orderkey"), s))
            .withColumn(f"_w{s}", (F.col(f"_p{s}") / 64).cast("long"))
            .withColumn(
                f"_b{s}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{s} % 64 AS INT))"),
            )
            .join(F.broadcast(b), F.col(f"_w{s}") == F.col(f"w{s}"), "inner")
            .filter(F.col(f"_b{s}").bitwiseAND(F.col(f"m{s}")) != 0)
            .drop(f"_p{s}", f"_w{s}", f"_b{s}", f"w{s}", f"m{s}")
        )
    # exact join removes Bloom false positives; survivors aggregate as usual
    return (
        probed.join(dims, probed.l_orderkey == dims.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "join_reconciliation_audit",
    oracle="""
    WITH c AS (SELECT c_custkey FROM customer),
    o AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT CAST(CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
                     THEN 'both'
                     WHEN o.o_custkey IS NULL THEN 'customer_only'
                     ELSE 'orders_only' END AS VARCHAR) AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
    category="join",
)
def join_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-system reconciliation: FULL OUTER join of the customer master
    against the distinct customer set observed in orders, rolled into
    both / left-only / right-only counts — the daily recon report every
    pair of systems-of-record runs (an orders_only row would mean orders
    referencing customers the master has never seen — here correctly
    absent, which the oracle pins). Complements dq_fk_orphans (the
    row-level anti-join) with the summary contract."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey").distinct()
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    status = (
        F.when(
            F.col("c_custkey").isNotNull() & F.col("o_custkey").isNotNull(), "both"
        )
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("orders_only")
    )
    return j.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))
