"""TPC-H completion pack: the 8 queries (q2, q4, q9, q11, q12, q16, q20,
q21) the fixtures could not previously express because they lack partsupp
and lineitem's shipmode/commitdate/receiptdate columns.

The missing inputs are SYNTHESIZED deterministically from existing keys with
the engine-portable md5 trick (same kernel as queries/geo.py coordinates):
both Spark and the DuckDB oracle derive bit-identical partsupp rows and
lineitem columns, so the queries remain fully oracle-checked. Adaptations
forced by synthesis are documented per query (e.g. q9/q20 map a lineitem to
one of its part's four synthetic partsupp rows via l_suppkey % 4, since
synthetic supplier assignments cannot agree with the fixture's l_suppkey).

Scale notes: partsupp is |part| x 4 rows derived row-locally from the part
table — at any SF it is the SMALL side and broadcasts; the lineitem synth
columns are pure row-local expressions on the fact scan (no extra pass, no
shuffle). Every query below keeps the classic TPC-H plan shape: facts
scan once, dims broadcast, one aggregation exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table

_SHIPMODES = ["AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK"]

_H = "CAST(('0x' || substr(md5({s}), 1, 4)) AS INT)"


def _h(expr: str) -> str:
    return _H.format(s=expr)


_PS_KEY = "'{tag}:' || CAST(p_partkey AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)"
_L_KEY = "'{tag}:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)"

_PARTSUPP_CTE = f"""partsupp AS (
      SELECT p_partkey AS ps_partkey,
             CAST((p_partkey + 7 + 13 * i.i) % s.ns AS BIGINT) AS ps_suppkey,
             CAST(i.i AS INT) AS ps_i,
             CAST(1 + ({_h(_PS_KEY.format(tag='aq'))} % 9999) AS BIGINT)
               AS ps_availqty,
             ROUND(1.0 + ({_h(_PS_KEY.format(tag='sc'))} % 99900) / 100.0, 2)
               AS ps_supplycost
      FROM part
      CROSS JOIN (SELECT unnest(range(0, 4)) AS i) i
      CROSS JOIN (SELECT COUNT(*) AS ns FROM supplier) s)"""

_LSYNTH_CTE = f"""lsynth AS (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_shipdate,
             (['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'])
               [1 + ({_h(_L_KEY.format(tag='sm'))} % 7)] AS l_shipmode,
             CAST(l_shipdate AS DATE)
               + ({_h(_L_KEY.format(tag='cd'))} % 61 - 30) AS l_commitdate,
             CAST(l_shipdate AS DATE)
               + (1 + {_h(_L_KEY.format(tag='rd'))} % 30) AS l_receiptdate
      FROM lineitem)"""


def _h16(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 suppliers per part (distinct mod any
    fixture supplier count), availqty in [1, 10000], supplycost in
    [1.00, 1000.00] — derived row-locally from the part scan; the supplier
    count is a broadcast 1-row aggregate. |part| x 4 rows: always the
    broadcast side."""
    p = table(spark, sf_dir, "part")
    ns = table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("ns"))
    ps = p.crossJoin(F.broadcast(ns)).select(
        "p_partkey", "ns", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    )
    key = lambda tag: F.concat(  # noqa: E731
        F.lit(f"{tag}:"),
        F.col("p_partkey").cast("string"),
        F.lit(":"),
        F.col("i").cast("string"),
    )
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") + 7 + 13 * F.col("i")) % F.col("ns"))
        .cast("long")
        .alias("ps_suppkey"),
        F.col("i").cast("int").alias("ps_i"),
        (1 + _h16(key("aq")) % 9999).cast("long").alias("ps_availqty"),
        F.round(1.0 + (_h16(key("sc")) % 99900) / 100.0, 2).alias("ps_supplycost"),
    )


def synth_lineitem(li: DataFrame) -> DataFrame:
    """Row-local synthesized l_shipmode / l_commitdate / l_receiptdate on
    the lineitem scan (no extra pass): shipmode uniform over the 7 TPC-H
    modes, commitdate within +/-30 days of shipdate, receiptdate 1-30 days
    after shipdate."""
    key = lambda tag: F.concat(  # noqa: E731
        F.lit(f"{tag}:"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    ship = F.col("l_shipdate").cast("date")
    return (
        li.withColumn(
            "l_shipmode",
            F.element_at(
                F.array(*[F.lit(m) for m in _SHIPMODES]), 1 + _h16(key("sm")) % 7
            ),
        )
        .withColumn("l_commitdate", F.date_add(ship, _h16(key("cd")) % 61 - 30))
        .withColumn("l_receiptdate", F.date_add(ship, 1 + _h16(key("rd")) % 30))
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    eu AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    flt AS (
      SELECT e.*, p.p_brand,
             MIN(e.ps_supplycost) OVER (PARTITION BY e.ps_partkey) AS mincost
      FROM eu e JOIN part p ON p.p_partkey = e.ps_partkey
      WHERE p.p_size <= 15 AND p.p_type = 'STANDARD')
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           CAST(ps_partkey AS BIGINT) AS p_partkey, p_brand,
           ROUND(ps_supplycost, 2) AS supplycost
    FROM flt WHERE ps_supplycost = mincost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
    category="tpch",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for small STANDARD parts, the
    EUROPE supplier(s) quoting each part's minimum supply cost. The
    correlated-min subquery is rewritten as a window MIN over the
    region-filtered join — one exchange on ps_partkey instead of a
    re-scan per part; top-20 by account balance.

    100 TB shape: partsupp/part/supplier/nation/region are all the small
    side (broadcast); the window partitions by part key, and
    TakeOrderedAndProject caps the output."""
    ps = synth_partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part")
    eu = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    flt = eu.join(
        F.broadcast(
            p.filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        ),
        eu.ps_partkey == F.col("p_partkey"),
    ).withColumn(
        "mincost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey"))
    )
    return (
        flt.filter(F.col("ps_supplycost") == F.col("mincost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle=f"""
    WITH {_LSYNTH_CTE}
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lsynth
                  WHERE l_orderkey = o_orderkey
                    AND l_commitdate < l_receiptdate)
    GROUP BY o_orderpriority
    """,
    category="tpch",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): Q1-1996 orders with at least
    one late lineitem (received after commitment), counted by priority.
    The EXISTS is a left-semi join against the distinct late-order key
    set; the synth commit/receipt dates are row-local on the fact scan."""
    o = table(spark, sf_dir, "orders")
    li = synth_lineitem(table(spark, sf_dir, "lineitem"))
    late = (
        li.filter(F.col("l_commitdate") < F.col("l_receiptdate"))
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    return (
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q9_product_profit",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_i = CAST(l.l_suppkey % 4 AS INT)
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    category="tpch",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on red parts by supplier
    nation and order year. Adaptation: the fixture's l_suppkey cannot
    agree with synthetic partsupp assignments, so each lineitem draws its
    supply cost from its part's (l_suppkey % 4)-th synthetic partsupp row
    — deterministic on both engines; supplier nation still comes from the
    REAL l_suppkey join, preserving the classic plan.

    100 TB shape: facts scan once; part filter, partsupp, supplier,
    nation are all broadcast; one aggregation exchange on
    (nation, year)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ps = synth_partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(ps),
            (ps.ps_partkey == li.l_partkey)
            & (ps.ps_i == (li.l_suppkey % 4).cast("int")),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ),
            2,
        ).alias("profit")
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    g AS (
      SELECT ps.ps_partkey,
             SUM(ps.ps_supplycost * ps.ps_availqty) AS value
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_8')
      GROUP BY ps.ps_partkey),
    tot AS (SELECT SUM(value) AS t, COUNT(*) AS c FROM g)
    SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
           ROUND(value, 2) AS value
    FROM g CROSS JOIN tot
    WHERE value > 2.0 * t / c
    """,
    category="tpch",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification): parts whose inventory
    value held by suppliers of two nations exceeds 2x the average part's
    value — a scale-invariant rewrite of the spec's SF-dependent fraction
    so selectivity holds at every fixture size. The total is a broadcast
    1-row aggregate over the already-aggregated per-part values."""
    ps = synth_partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    g = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .filter(F.col("n_name").isin("NATION_7", "NATION_8"))
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"))
    )
    tot = g.agg(F.sum("value").alias("t"), F.count(F.lit(1)).alias("c"))
    return (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 2.0 * F.col("t") / F.col("c"))
        .select(
            F.col("ps_partkey").cast("long").alias("ps_partkey"),
            F.round("value", 2).alias("value"),
        )
    )


@query(
    "q12_shipmode_priority",
    oracle=f"""
    WITH {_LSYNTH_CTE}
    SELECT l.l_shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lsynth l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipmode IN ('MAIL', 'SHIP')
      AND l.l_commitdate < l.l_receiptdate
      AND l.l_shipdate < l.l_commitdate
      AND l.l_receiptdate >= DATE '1996-01-01'
      AND l.l_receiptdate < DATE '1997-01-01'
    GROUP BY l.l_shipmode
    """,
    category="tpch",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority): 1996 lineitems that
    shipped before commitment but were received late, by MAIL/SHIP mode,
    split into high/low priority counts. All synth columns are row-local
    predicates pushed onto the fact scan; one join (orders) and one
    2-group aggregate."""
    li = synth_lineitem(table(spark, sf_dir, "lineitem"))
    o = table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01").cast("date")
    hi = F.lit("1997-01-01").cast("date")
    flt = li.filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= lo)
        & (F.col("l_receiptdate") < hi)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        flt.join(o, flt.l_orderkey == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q16_parts_supplier_cnt",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#9'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier
        WHERE {_h("'cmp:' || CAST(s_suppkey AS VARCHAR)")} % 20 = 0)
    GROUP BY 1, 2, 3
    """,
    category="tpch",
)
def q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier counts
    per (brand, type, size) for selected sizes, excluding one brand, the
    PROMO type family, and "complaint" suppliers — the spec derives those
    from s_comment, which the fixture lacks, so a deterministic 5% of
    suppliers (md5 of the key) play that role on both engines. The
    exclusion list is tiny and broadcast as an anti-join."""
    ps = synth_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    complaints = s.filter(
        _h16(F.concat(F.lit("cmp:"), F.col("s_suppkey").cast("string"))) % 20 == 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(
            F.broadcast(
                p.filter(
                    (F.col("p_brand") != "Brand#9")
                    & ~F.col("p_type").like("PROMO%")
                    & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
                )
            ),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(complaints), "ps_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    qty AS (
      SELECT l_partkey, CAST(l_suppkey % 4 AS INT) AS i,
             SUM(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'small%'
      JOIN qty ON qty.l_partkey = ps.ps_partkey AND qty.i = ps.ps_i
      WHERE ps.ps_availqty > 0.5 * qty.q)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN cand ON cand.ps_suppkey = s.s_suppkey
    WHERE n.n_name IN ('NATION_3', 'NATION_4')
    """,
    category="tpch",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers in two nations
    holding excess stock (availqty > half of 1996 shipped quantity) of
    'small' parts. Adaptation: shipped quantity aggregates to the part's
    (l_suppkey % 4) synthetic partsupp bucket (see q9's note). The fact
    table collapses through a (part, bucket) hash aggregate BEFORE
    touching partsupp; everything after is broadcast-sized."""
    ps = synth_partsupp(spark, sf_dir)
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    qty = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(
            F.col("l_partkey"), (F.col("l_suppkey") % 4).cast("int").alias("i")
        )
        .agg(F.sum("l_quantity").alias("q"))
    )
    cand = (
        ps.join(
            F.broadcast(p.filter(F.col("p_name").like("small%"))),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            qty,
            (qty.l_partkey == ps.ps_partkey) & (qty.i == ps.ps_i),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("n_name").isin("NATION_3", "NATION_4"))
        .join(
            F.broadcast(cand), s.s_suppkey == cand.ps_suppkey
        )
        .select("s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle=f"""
    WITH {_LSYNTH_CTE},
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_receiptdate > l_commitdate
                                 THEN l_suppkey END) AS n_late
      FROM lsynth GROUP BY 1)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lsynth l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN per_order po ON po.l_orderkey = l1.l_orderkey
                     AND po.n_supp >= 2 AND po.n_late = 1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_5'
    WHERE l1.l_receiptdate > l1.l_commitdate
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    category="tpch",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): NATION_5 suppliers
    whose late lineitems were the ONLY late deliveries on multi-supplier
    finalized orders. The spec's EXISTS / NOT EXISTS pair is rewritten as
    one per-order aggregate (distinct suppliers, distinct LATE suppliers)
    — late-and-sole iff n_late = 1 and the l1 row itself is late; the
    facts scan twice (once per role) but join on the order key only.

    100 TB shape: the fact table is scanned (and its synthesized date
    columns computed) exactly ONCE, and the whole pair-aggregate + window
    chain rides ONE exchange: the projected rows repartition by the ORDER
    KEY alone, which satisfies the (order, supplier) aggregate's clustered
    distribution AND the per-order window's, so neither inserts its own
    shuffle (r6: the groupBy-then-window form shuffled twice — once on
    the pair, once on the order — and measured consistently slower in an
    interleaved A/B at sf0.1). No count-distinct Expand anywhere; orders
    prune to F-status keys for a semi-shaped join; supplier and nation
    broadcast; TakeOrderedAndProject bounds the output."""
    from pyspark.sql import Window as W

    li = synth_lineitem(table(spark, sf_dir, "lineitem"))
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    late = (F.col("l_receiptdate") > F.col("l_commitdate")).cast("int")
    per_pair = (
        li.select("l_orderkey", "l_suppkey", late.alias("late"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("late").alias("any_late"),
            F.sum("late").alias("n_late_rows"),
        )
    )
    w_ord = W.partitionBy("l_orderkey")
    qualified = (
        per_pair.withColumn("n_supp", F.count(F.lit(1)).over(w_ord))
        .withColumn("n_late_supp", F.sum("any_late").over(w_ord))
        .filter(
            (F.col("any_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return (
        qualified.join(f_orders, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "supplier_otif_delivery",
    oracle=f"""
    WITH {_LSYNTH_CTE}
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(CASE WHEN l.l_receiptdate <= l.l_commitdate
                          THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4)
             AS on_time_pct,
           CAST(SUM(CASE WHEN l.l_receiptdate > l.l_commitdate
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM lsynth l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_name
    """,
    category="tpch",
)
def supplier_otif_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier on-time delivery scorecard: the share of each supplier's
    lineitems received by their commitment date (the OTIF KPI driving
    supplier reviews; q21 finds the BLAMEWORTHY late ones, this ranks
    everyone). Synth commit/receipt dates are row-local on the fact scan;
    supplier broadcasts; one supplier-keyed aggregate."""
    li = synth_lineitem(table(spark, sf_dir, "lineitem"))
    s = table(spark, sf_dir, "supplier")
    on_time = F.when(F.col("l_receiptdate") <= F.col("l_commitdate"), 1).otherwise(0)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(on_time) * 100.0 / F.count(F.lit(1)), 4).alias(
                "on_time_pct"
            ),
            F.sum(1 - on_time).cast("long").alias("n_late"),
        )
    )


@query(
    "supply_risk_single_source",
    oracle="""
    WITH src AS (
      SELECT l_partkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY 1)
    SELECT CAST(CASE WHEN n_supp = 1 THEN 'single_source'
                     WHEN n_supp <= 3 THEN 'dual_to_triple'
                     ELSE 'diversified' END AS VARCHAR) AS risk_band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(r), 2) AS revenue_at_risk,
           ROUND(SUM(r) * 100.0 / (SELECT SUM(r) FROM src), 4) AS revenue_pct
    FROM src
    GROUP BY 1
    """,
    category="tpch",
)
def supply_risk_single_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration risk: parts banded by how many distinct
    suppliers actually ship them, with the revenue riding on each band —
    the single-source exposure report procurement reviews quarterly
    (revenue flowing through 1-supplier parts is the firm's fragility
    number). One (part) aggregate with a count-distinct, a band rollup,
    and a broadcast grand total."""
    li = table(spark, sf_dir, "lineitem")
    src = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"),
    )
    band = (
        F.when(F.col("n_supp") == 1, "single_source")
        .when(F.col("n_supp") <= 3, "dual_to_triple")
        .otherwise("diversified")
    )
    tot = src.agg(F.sum("r").alias("t"))
    return (
        src.groupBy(band.alias("risk_band"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("r"), 2).alias("revenue_at_risk"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "risk_band",
            "n_parts",
            "revenue_at_risk",
            F.round(F.col("revenue_at_risk") * 100.0 / F.col("t"), 4).alias(
                "revenue_pct"
            ),
        )
    )
