"""Scans, projections, filters, distinct — the base of the operator surface.

The reference's only scan is a physical byte-stream object scan
(/root/reference/src/storage/block_driver.rs:489-527); here scans are
declarative parquet reads so Catalyst pushes predicates and prunes columns
(verify with .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter -> groupBy -> 8 aggregates -> sort.

    Scale notes: the filter pushes to the parquet scan; aggregation is
    partial (map-side combine) before the single shuffle on the 6-value
    group key; no further shuffle for the sort (tiny result)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_projection_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount > 0.05
    """,
)
def scan_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan with a computed projection.

    Per-row rounding uses floor(x*100+0.5)/100 in BOTH engines: engine
    ROUND() implementations disagree on values that land exactly on a .xx5
    boundary, while this arithmetic form is bit-identical IEEE754."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5) / 100).alias(
                "net_price"
            ),
        )
    )


@query(
    "filter_in_like_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus LIKE 'F%'
      AND o_totalprice IS NOT NULL
    """,
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, LIKE and NULL-check predicates (all pushdown-eligible)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").like("F%")
        & F.col("o_totalprice").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "distinct_values",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns (map-side partial first)."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N by sort+limit. Spark plans this as TakeOrderedAndProject —
    a per-partition top-N + single merge, no global sort shuffle; exactly
    what you want at 100 TB."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "unpivot_melt_measures",
    oracle="""
    SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(val), 2) AS total, ROUND(AVG(val), 6) AS mean
    FROM (
      UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
               FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME measure VALUE val)
    GROUP BY measure
    """,
    category="relational",
)
def unpivot_melt_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) of the four lineitem measures, then a
    per-measure profile. Unpivot is a row-local Expand (4x fan-out inside
    the scan stage, no shuffle); only the 4-group aggregate exchanges."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )


@query(
    "dq_profile_columns",
    oracle="""
    SELECT 'o_custkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_custkey) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_custkey), 4) AS min_val,
           ROUND(MAX(o_custkey), 4) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           ROUND(MIN(o_totalprice), 4), ROUND(MAX(o_totalprice), 4)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_orderkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
           ROUND(MIN(o_orderkey), 4), ROUND(MAX(o_orderkey), 4)
    FROM orders
    """,
    category="relational",
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profiling (the Deequ/expectations pattern): per
    column, row count, completeness (non-null), cardinality, and bounds — the
    stats a pipeline gate asserts before a corpus build is allowed to run.
    ONE scan computes every column's profile (all aggregates in a single
    global HashAggregate — no per-column passes); the long-form conversion
    is an explode of per-column structs over the 1-row result, so the
    aggregate subtree appears ONCE in the plan (a union of projections
    would inline — and re-execute — it once per column; the plan audit
    asserts the single scan)."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.count(c).alias(f"{c}__n_nonnull"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c).cast("double"), 4).alias(f"{c}__min_val"),
            F.round(F.max(c).cast("double"), 4).alias(f"{c}__max_val"),
        ]
    one = o.agg(*aggs)
    profile_rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nonnull").alias("n_nonnull"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_val").alias("min_val"),
                F.col(f"{c}__max_val").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(profile_rows).alias("r")).select("r.*")


@query(
    "dq_fk_orphans",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    """,
    category="relational",
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate: orphan counts per foreign-key edge via
    LEFT ANTI joins (the join-shaped NOT EXISTS). Each dimension side
    broadcasts where small; the fact side is scanned once per edge with
    only the key column read (column pruning). A 100 TB pipeline runs this
    before publishing a snapshot — orphans mean a partial upstream load."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def orphans(fact, key, dim, dim_key, label):
        n = (
            fact.select(key)
            .join(dim.select(dim_key), fact[key] == dim[dim_key], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return n.select(F.lit(label).alias("fk_edge"), "n_orphans")

    edges = [
        orphans(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders"),
        orphans(
            o,
            "o_custkey",
            table(spark, sf_dir, "customer"),
            "c_custkey",
            "orders.o_custkey->customer",
        ),
        orphans(
            li,
            "l_partkey",
            table(spark, sf_dir, "part"),
            "p_partkey",
            "lineitem.l_partkey->part",
        ),
        orphans(
            li,
            "l_suppkey",
            table(spark, sf_dir, "supplier"),
            "s_suppkey",
            "lineitem.l_suppkey->supplier",
        ),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


_CATALOG_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


@query(
    "dq_profile_catalog",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {k}) AS BIGINT) AS n_keys,
           CAST(COUNT(*) - COUNT({k}) AS BIGINT) AS n_null_keys
        FROM {t}"""
        for t, k in sorted(_CATALOG_KEYS.items())
    ),
    category="relational",
)
def dq_profile_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-level data-quality sweep: one row per table with row count,
    distinct primary-key count, and null-key count — the pre-flight gate a
    pipeline runs over EVERY input before anything expensive (n_rows ==
    n_keys and n_null_keys == 0 is the PK contract). Each table is one
    independent aggregate; the union is table-count-bounded. Complements
    the per-column `dq_profile_columns` and relational `dq_fk_orphans`
    gates."""
    parts = []
    for t, k in sorted(_CATALOG_KEYS.items()):
        df = table(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.col(k)).alias("n_keys"),
                (F.count(F.lit(1)) - F.count(F.col(k))).alias("n_null_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "dq_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id),
    stats AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_cnt FROM per_key)
    SELECT p.user_id, p.cnt,
           ROUND(p.cnt / s.avg_cnt, 4) AS skew_ratio
    FROM per_key p, stats s
    ORDER BY p.cnt DESC, p.user_id
    LIMIT 10
    """,
    category="relational",
)
def dq_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler: the top-10 heaviest join/agg keys and how
    many times the average key weight each carries — the pre-flight check
    that decides whether a 100 TB join on this key needs salting or AQE
    skew splitting. One hash aggregate builds per-key counts; the mean is a
    1-row broadcast back over that SAME aggregate (no second scan); the
    top-10 plans as TakeOrderedAndProject (per-partition heap + single
    merge), never a global sort."""
    e = table(spark, sf_dir, "events").select("user_id")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_cnt")
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt") / F.col("avg_cnt"), 4).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), F.col("user_id"))
        .limit(10)
    )


@query(
    "relational_keyset_pagination",
    oracle="""
    WITH page3 AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_orderkey > 200
      ORDER BY o_orderkey
      LIMIT 100)
    SELECT * FROM page3
    """,
    category="relational",
)
def relational_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: page N fetches WHERE key > last_seen
    ORDER BY key LIMIT page_size — cost stays O(page) forever because the
    key predicate pushes into the parquet scan, unlike OFFSET pagination,
    which reads and discards every earlier page (O(N · page) by page N —
    the classic API-backend scaling bug). Shown fetching page 3 (after
    two 100-row pages ending at key 200); TakeOrderedAndProject caps the
    work."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") > 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
