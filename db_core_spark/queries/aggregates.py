"""Aggregation surface: basic aggs, count-distinct, rollup/cube/grouping sets,
having, pivot, exact percentiles, stddev/variance. Absent in the reference
(SURVEY.md §2C); goal-derived. All built-ins — partial (map-side) aggregation
plus a single shuffle per grouping, which is the optimal shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.operators.litframe import literal_frame
from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "agg_basic_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregate",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT): Spark plans expand + two-phase aggregate —
    the standard scalable rewrite (no per-group hash sets on the driver)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("agg_approx_distinct", oracle=None, category="aggregate")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB answer to distinct
    cardinality (constant memory per group). No oracle: sketch results are
    engine-specific; driver does the rows-only check."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    category="aggregate",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (flag,status) -> (flag) -> ()."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    category="aggregate",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (Expand operator)."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    category="aggregate",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan as DF)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT l_partkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_partkey
    HAVING SUM(l_quantity) > 150
    """,
    category="aggregate",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 150)
        .select("l_partkey", "total_qty")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never let pivot discover values at
    scale — that is an extra job over 100 TB)."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles with BOUNDED state — quantile_cont
    semantics without quantile_cont's memory shape. `F.percentile` (like
    DuckDB's quantile_cont) buffers every group value inside the aggregate:
    O(group rows) executor memory, the one aggregate state that cannot
    survive a 100 TB group (the old formulation here documented "use
    approx_percentile at scale" as the escape hatch). The bucketed
    rank-finder (operators/quantile.bucketed_exact_quantiles) removes the
    concession: per-(group, bucket) COUNT histogram (shuffle is
    O(groups x buckets), map-side combined), a <=G x q x 2-row fence
    collect locating each quantile's neighbor ranks, then a pushed-down
    re-scan of only the fenced buckets where the grouped two-pass prefix
    sum ranks the residual values. Same statistic to the bit: the operator
    replicates F.percentile's own two-product interpolation
    (ceil(k)-k)*v_lo + (k-floor(k))*v_hi at k = (n-1)*q over identical
    neighbor order statistics; pytest pins parity against F.percentile
    across q values and partition counts."""
    from db_core_spark.operators.quantile import bucketed_exact_quantiles

    li = table(spark, sf_dir, "lineitem")
    qv = bucketed_exact_quantiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.95]
    )
    return (
        qv.groupBy("l_returnflag")
        .pivot("q", [0.5, 0.95])
        .agg(F.first("value"))
        .select(
            "l_returnflag",
            F.round(F.col("`0.5`"), 4).alias("p50_price"),
            F.round(F.col("`0.95`"), 4).alias("p95_price"),
        )
    )


@query(
    "agg_stddev_var",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price,
           ROUND(VAR_SAMP(o_totalprice), 2) AS var_price
    FROM orders GROUP BY o_orderstatus
    """,
    category="aggregate",
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
    )


@query(
    "agg_conditional_sum",
    oracle="""
    SELECT
      ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
        AS discounted_revenue,
      ROUND(SUM(l_extendedprice * l_discount), 2) AS q6_style_revenue,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_quantity < 24
    """,
    category="aggregate",
)
def agg_conditional_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style global aggregate with conditional sum — no group key,
    so Spark does a two-stage partial/final agg to a single row."""
    li = table(spark, sf_dir, "lineitem")
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi) & (F.col("l_quantity") < 24))
        .agg(
            F.round(
                F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0.0)),
                2,
            ).alias("discounted_revenue"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("q6_style_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_corr_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS price_at_zero,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates per group: Pearson correlation,
    population covariance, and OLS slope/intercept/R2 — all single-pass
    partial-aggregatable (sum/sum-of-squares/cross-product moments combine
    associatively), so the shuffle carries one moment tuple per group, the
    same shape as a SUM at any scale."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("price_per_qty"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("price_at_zero"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )


@query(
    "agg_median_iqr",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q1_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q3_qty,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_median_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + interquartile range per group (continuous
    interpolation, matching quantile_cont). F.percentile buffers the full
    per-group value multiset — at 100 TB either swap in percentile_approx
    (GK sketch: mergeable partial state, accept the documented error
    bound) or keep EXACTNESS with bounded state via
    operators/quantile.bucketed_exact_quantiles (the histogram + fenced
    re-scan path agg_percentiles now ships; one pipeline per value column,
    so this two-column query keeps the buffered form at fixture scale)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q3_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
    )


@query(
    "agg_histogram_fixed_buckets",
    oracle="""
    SELECT CAST(LEAST(FLOOR(l_extendedprice / 10000), 9) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(l_extendedprice), 2) AS lo,
           ROUND(MAX(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY 1
    """,
    category="aggregate",
)
def agg_histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via bucket arithmetic in the scan stage — the
    bucket id is a row-local expression, so the histogram costs exactly one
    partial-agg shuffle of (bucket -> counts), independent of data size."""
    li = table(spark, sf_dir, "lineitem")
    bucket = F.least(F.floor(F.col("l_extendedprice") / 10000), F.lit(9)).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                            (l_linestatus), ())
"""


@query("agg_grouping_sets_mix", oracle=_GROUPING_SETS_SQL, category="aggregate")
def agg_grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with a mixed lattice — (flag, status), each
    alone, and the grand total — which neither rollup nor cube expresses
    (cube would add no set here, but the POINT is arbitrary set lists, e.g.
    skipping an expensive intermediate level at scale). One Expand over the
    scan fans each row into its 4 set memberships, then a single hash
    aggregate — the same single-shuffle shape as rollup/cube. GROUPING_ID
    disambiguates real NULLs from subtotal rows. Runs through spark.sql:
    the SQL text IS the oracle text (one parser path, two engines)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "itemset_cooccurrence_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, support
    FROM pairs WHERE support >= 3
    """,
    category="aggregate",
)
def itemset_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair mining (the market-basket / association-rule kernel):
    parts that co-occur in >= 3 orders, via a self-join on the order key
    over the DISTINCT (order, part) item list. Scale shape: the join
    fan-out is bounded by per-order basket size (TPC-H ~7 lines), never
    corpus size — co-occurrence is Σ basket² over orders, the same
    posting-list blocking the near-dup kernels use. Support threshold
    applies after one partial-aggregable shuffle on the pair."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )


@query(
    "revenue_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
             CAST(MONTH(o_orderdate) AS INT) AS mo,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2)
    SELECT yr, mo, revenue,
           ROUND(LAG(revenue) OVER (ORDER BY yr, mo), 2) AS prev_revenue,
           FLOOR(CASE WHEN LAG(revenue) OVER (ORDER BY yr, mo) > 0
                 THEN (revenue / LAG(revenue) OVER (ORDER BY yr, mo) - 1) * 100
                 END * 10000 + 0.5) / 10000 AS growth_pct
    FROM monthly
    """,
    category="timeseries",
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: the lag-over-aggregate reporting pattern.
    The monthly rollup reduces the fact table to ~months rows FIRST, so the
    unpartitioned ordering window runs over a tiny frame (a global window
    over raw facts would single-thread the sort; over 80 aggregate rows it
    is free). Growth floor-rounds to 4 dp for engine-identical hashing."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    from pyspark.sql import Window as W

    w = W.orderBy("yr", "mo")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "yr",
        "mo",
        "revenue",
        F.round(prev, 2).alias("prev_revenue"),
        (
            F.floor(
                F.when(prev > 0, (F.col("revenue") / prev - 1) * 100) * 10000 + 0.5
            )
            / 10000
        ).alias("growth_pct"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS vbucket
      FROM events),
    c AS (SELECT event_type, vbucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    r AS (
      SELECT event_type, vbucket, cnt,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, vbucket) AS rn
      FROM c)
    SELECT event_type, vbucket AS mode_bucket, CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
    category="aggregate",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent value) per group. Built-in mode()
    leaves tie order engine-defined — useless for a reproducible pipeline —
    so this is the portable formulation: count per (group, value), then
    row_number ordered by (count DESC, value) picks a total-order winner.
    Two aggregations sharing one hash partitioning + a WindowGroupLimit-style
    top-1; no global sort, no nondeterminism at any scale."""
    e = table(spark, sf_dir, "events")
    b = e.select(
        "event_type", F.floor(F.col("value") / 10).cast("long").alias("vbucket")
    )
    c = b.groupBy("event_type", "vbucket").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.col("cnt").desc(), F.col("vbucket"))
    )
    return (
        c.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("vbucket").alias("mode_bucket"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "agg_entropy_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    t AS (SELECT user_id, SUM(n) AS total FROM c GROUP BY 1)
    SELECT c.user_id,
           CAST(t.total AS BIGINT) AS n_events,
           ROUND(-SUM((c.n * 1.0 / t.total) * LN(c.n * 1.0 / t.total)), 6)
             AS entropy
    FROM c JOIN t USING (user_id)
    GROUP BY c.user_id, t.total
    """,
    category="aggregate",
)
def agg_entropy_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity score (bots pin near 0, organic users near
    ln(5)). Same signal scores token distributions when run over documents.
    Shape: one (user, type) count, one per-user fold — the second aggregate
    and the total join reuse the first shuffle's partitioning; entropy sums
    at most |event_type| terms per user so float order effects stay below
    the 6-dp round."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "total")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select("user_id", F.col("total").alias("n_events"), "entropy")
    )


@query(
    "pareto_revenue_concentration",
    oracle="""
    WITH cr AS (
      SELECT o.o_custkey AS custkey,
             ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(18,4))), 2) AS revenue
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1),
    ranked AS (
      SELECT custkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, custkey) AS rk,
             COUNT(*) OVER () AS n_cust
      FROM cr),
    v AS (
      SELECT CAST(FLOOR(((rk - 1) * 20) / n_cust) AS INT) AS ventile,
             CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM ranked GROUP BY 1),
    tot AS (SELECT SUM(rev) AS total FROM v)
    SELECT v.ventile, v.n_customers, v.rev AS revenue,
           ROUND(SUM(v.rev) OVER (ORDER BY v.ventile
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / tot.total, 6) AS cum_share
    FROM v CROSS JOIN tot
    """,
    category="aggregate",
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: customers ranked by revenue,
    bucketed into 20 ventiles, cumulative revenue share per ventile — the
    'top 5% of customers drive X% of revenue' rollup.

    The global rank is the scale hazard (ROW_NUMBER over everything is a
    single-partition window), so it goes through the shared audited
    two-pass prefix rank (`operators/prefixrank.global_row_number` —
    range-partition by (revenue DESC, custkey) at cluster parallelism,
    O(parts) offset collect, rank = offset + local row_number, every
    stage parallel; r9 retired this query's hand-rolled copy of the
    pattern and its literal 8-partition staging with it). The running
    share then lives on the 20-row ventile spine only.

    r10: BOTH revenue summations run in DECIMAL, not double, on BOTH
    engines. The round-then-resum structure amplifies float noise twice:
    (1) each customer's ROUND(SUM(price x (1-disc)), 2) is an
    order-dependent double sum whose ~1e-9 noise flips the 2-dp round on
    boundary customers (the per-row PRODUCT doubles are bit-identical
    across engines; only summation order differs), and (2) each
    ~750-customer ventile re-sums those rounded values and rounds again.
    At sf0.1 this left 7 of 20 ventile revenues 0.01 off the oracle
    (pre-existing; exposed by this resume's sf0.1 spot-gate; sf1 drifted
    0.1). Casting the per-row product to DECIMAL(18,4) (the same double
    converts to the same decimal in both engines — a double is never
    exactly on a .xxxx5 boundary, so rounding-mode differences cannot
    bite) makes both sums exact and order-free; the 20-row cumulative
    share then sums identical doubles in deterministic ventile order."""
    from pyspark.sql import Window as W

    from db_core_spark.operators.prefixrank import global_row_number

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            ).alias("revenue")
        )
    )
    ranked, n_cust = global_row_number(
        cr, [F.col("revenue").desc(), F.col("custkey")], out="rk"
    )
    v = (
        ranked.withColumn(
            "ventile", (((F.col("rk") - 1) * 20) / F.lit(n_cust)).cast("int")
        )
        .groupBy("ventile")
        .agg(
            F.sum(F.col("revenue").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )
    tot = v.agg(F.sum("rev").alias("total"))
    wv = W.orderBy("ventile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            "ventile",
            "n_customers",
            F.col("rev").alias("revenue"),
            F.round(F.sum("rev").over(wv) / F.col("total"), 6).alias("cum_share"),
        )
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o.o_totalprice < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN o.o_totalprice > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           ROUND(AVG(o.o_totalprice), 4) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)), 4) AS mean_winsor
    FROM orders o JOIN b USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
    category="aggregate",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) mean per order priority: values below p05 / above
    p95 are clamped to the fence before averaging — the outlier-robust
    reduction feature pipelines apply to heavy-tailed metrics before model
    consumption. Two aggregation passes over the same shuffle key: exact
    per-group percentiles (full-multiset percentile; at 100 TB swap in
    percentile_approx's mergeable GK sketch, or stay exact with
    operators/quantile.bucketed_exact_quantiles), fences broadcast back, then a
    plain clip-and-average hash aggregate. No window, no second wide
    shuffle — the same broadcast-back shape as anomaly_mad_robust."""
    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    fences = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.05).alias("lo"),
        F.percentile("o_totalprice", 0.95).alias("hi"),
    )
    clipped = o.join(F.broadcast(fences), "o_orderpriority")
    return clipped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_lo"),
        F.sum(F.when(F.col("o_totalprice") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clip_hi"),
        F.round(F.avg("o_totalprice"), 4).alias("mean_raw"),
        F.round(
            F.avg(F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))), 4
        ).alias("mean_winsor"),
    )


@query(
    "agg_histogram_quantile_sketch",
    oracle="""
    WITH s AS (
      SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM lineitem),
    h AS (
      SELECT LEAST(255, CAST(FLOOR((l_extendedprice - s.mn)
                                   / ((s.mx - s.mn) / 256.0)) AS INT)) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem, s GROUP BY 1),
    c AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM h),
    qs(q) AS (SELECT CAST(v AS DOUBLE) FROM (VALUES (0.5), (0.9), (0.99)) t(v)),
    hit AS (
      SELECT qs.q, MIN(c.bucket) AS bsel
      FROM qs JOIN c ON c.cum >= qs.q * (SELECT n FROM s)
      GROUP BY qs.q)
    SELECT hit.q,
           ROUND(s.mn + hit.bsel * ((s.mx - s.mn) / 256.0)
                 + ((hit.q * s.n - (c.cum - c.cnt)) / c.cnt)
                   * ((s.mx - s.mn) / 256.0), 4) AS est_q
    FROM hit JOIN c ON c.bucket = hit.bsel, s
    ORDER BY hit.q
    """,
    category="aggregate",
)
def agg_histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE fixed-bin histogram sketch: one
    min/max pass fixes 256 equal-width bins, one hash-aggregate pass builds
    per-bin counts (partial counts merge associatively — the property that
    makes this a sketch: executors emit 256-long partials, the reduce is a
    vector add), then p50/p90/p99 are linearly interpolated inside the
    covering bin. Versus the exact per-group multiset of agg_percentiles,
    this is the O(bins) -never-holds-the-data shape that incremental /
    distributed quantile maintenance needs; the oracle replicates the exact
    arithmetic, so the gate pins the estimator bit-for-bit, and pytest
    separately bounds |est - exact| by one bin width. The cumulative window
    runs over <= 256 bin rows — bounded driver-free single-partition work,
    not a data-scale sort."""
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / 256.0
    bucket = F.least(
        F.lit(255),
        F.floor((F.col("l_extendedprice") - F.col("mn")) / width).cast("int"),
    )
    hist = (
        li.crossJoin(F.broadcast(stats))
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).crossJoin(F.broadcast(stats))
    qs = literal_frame(spark, [(0.5,), (0.9,), (0.99,)], "q double")
    hit = (
        qs.join(cum, F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min_by(F.struct("bucket", "cnt", "cum", "mn", "mx", "n"), F.col("bucket")).alias("s"))
        .select("q", "s.bucket", "s.cnt", "s.cum", "s.mn", "s.mx", "s.n")
    )
    w2 = (F.col("mx") - F.col("mn")) / 256.0
    est = (
        F.col("mn")
        + F.col("bucket") * w2
        + ((F.col("q") * F.col("n") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")) * w2
    )
    return hit.select("q", F.round(est, 4).alias("est_q")).orderBy("q")


@query(
    "itemset_association_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM lineitem),
    freq AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_support
      FROM items GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS pair_support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2)
    SELECT p.part_a AS antecedent, p.part_b AS consequent, p.pair_support,
           ROUND(p.pair_support * 1.0 / fa.item_support, 6) AS confidence,
           ROUND(p.pair_support * n.n_orders
                 / (fa.item_support * 1.0 * fb.item_support), 6) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b, n
    WHERE p.pair_support >= 3
      AND p.pair_support * 1.0 / fa.item_support >= 0.1
    """,
    category="aggregate",
)
def itemset_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: directed rules
    part_a => part_b with support >= 3 and confidence >= 0.1, scored by
    confidence (P(b|a)) and lift (observed co-rate over independence) —
    the classic market-basket second stage after frequent-pair counting
    (itemset_cooccurrence_pairs keeps the undirected support step).

    Scale shape: the pair generation is a self-equi-join on the basket key
    (never all-pairs across baskets; within-basket fan-out is bounded by
    basket size), item supports are one hash aggregate broadcast back to
    the pair frame, and the corpus size is a 1-row broadcast. The
    support/confidence thresholds prune in the same aggregate that counts
    — nothing low-support survives to the joins."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = li.agg(F.countDistinct("l_orderkey").cast("double").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("item_support"))
    a = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= 3)
    )
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("item_support").alias("support_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("item_support").alias("support_b")
    )
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n))
        .filter(F.col("pair_support") * 1.0 / F.col("support_a") >= 0.1)
        .select(
            F.col("part_a").alias("antecedent"),
            F.col("part_b").alias("consequent"),
            "pair_support",
            F.round(F.col("pair_support") * 1.0 / F.col("support_a"), 6).alias("confidence"),
            F.round(
                F.col("pair_support")
                * F.col("n_orders")
                / (F.col("support_a") * 1.0 * F.col("support_b")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps: keys
    hash to (bucket, bit); bitmap_construct_agg ORs per-(group, bucket)
    bitmaps, bitmap_count pops the bits, and a second aggregate sums
    buckets per group. Same answer as COUNT(DISTINCT) — the oracle — but
    the intermediate state is a mergeable binary bitmap instead of a
    per-group key set: partials OR together associatively, so incremental
    /resumable distinct (persist per-bucket bitmaps, OR in tomorrow's
    partition, re-count) costs O(bitmap) instead of a full re-scan. The
    exact-count sibling of the HLL sketch (agg_approx_distinct /
    agg_hll_mergeable_sketch) when error bounds aren't acceptable."""
    li = table(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag", F.bitmap_bucket_number("l_partkey").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("l_partkey")).alias("bm"))
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).alias("n_parts")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice, l_quantity,
             SUM(l_quantity) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem)
    SELECT l_returnflag,
           ROUND(MIN(l_extendedprice), 2) AS weighted_median,
           ROUND(MAX(tw), 2) AS total_weight
    FROM cum WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median: the smallest price whose cumulative quantity
    weight reaches half the group's total — the price at which half the
    shipped VOLUME is cheaper, which is the question unit-median price
    cannot answer.

    Bucketed two-pass distributed median — NO sort or prefix sum ever
    touches the full fact table. Pass 1 hash-aggregates quantity weight per
    (group, price-bucket) with map-side partial combine; the shuffle
    carries O(groups x buckets) rows regardless of N (the r7 rewrite this
    replaces range-partition-sorted ALL fact rows for a full prefix sum —
    correct parallelism, but still an O(N log N) sort whose shuffle grows
    with the corpus). The crossing bucket (first whose cumulative bucket
    weight reaches half the total — a tiny per-group window over the bucket
    frame) plus its exclusive below-weight offset come back as a <=G-row
    fence collect, the same centroid/fence pattern the k-means and rank
    queries use. Pass 2 re-scans ONLY that bucket: the fence is a literal
    price-range predicate, so parquet min/max row-group pruning applies at
    the scan (buckets are 64-wide, a power of two, so floor(price/64) and
    the literal bounds agree exactly in binary fp), and the within-bucket
    running sum collapses duplicate prices into a per-(group, price)
    weight first (map-side combined; prices are 2-dp, so one 64-wide
    bucket holds <= 6,400 distinct values BY CONSTRUCTION at any corpus
    size), then a bounded per-group window ranks the residual distinct
    values — the same pass-2 shape as
    operators/quantile.bucketed_exact_quantiles, at zero extra Spark jobs
    (r10: replaces the grouped_running_sum staging, whose range sample +
    localCheckpoint + offset collect cost three driver-blocking jobs per
    call). Quantities are integer-valued, so re-ordered additions stay
    exact; equal-price tie order cannot change the answer (any ordering of
    a tied run crosses the half-weight threshold inside the same run, and
    MIN collapses the run to one value). The answer's bucket IS the
    crossing bucket: every price below it has cumulative weight < tw/2
    (else an earlier bucket's end-cumulative would have crossed first).

    NULL group keys are handled like any other group: the pass-2 fence
    predicate and the fence join both match with ``eqNullSafe`` (same
    discipline as ``operators/quantile.bucketed_exact_quantiles``), so a
    NULL-keyed group flows through both passes intact instead of being
    silently dropped by plain-equality matching — regression-pytested
    with an injected NULL group."""

    width = 64.0  # power of two: floor(price/width) exact at bucket edges
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    per_bucket = li.groupBy(
        "l_returnflag", F.floor(F.col("l_extendedprice") / width).alias("bkt")
    ).agg(F.sum("l_quantity").alias("w"))
    wb = W.partitionBy("l_returnflag").orderBy("bkt")
    cum_b = per_bucket.withColumn(
        "cwb", F.sum("w").over(wb.rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("tw", F.sum("w").over(W.partitionBy("l_returnflag")))
    crossing = (
        cum_b.filter(F.col("cwb") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min_by(
                F.struct(
                    F.col("bkt"),
                    (F.col("cwb") - F.col("w")).alias("below"),
                    F.col("tw"),
                ),
                F.col("bkt"),
            ).alias("s")
        )
        .select("l_returnflag", "s.bkt", "s.below", "s.tw")
    )
    fences = crossing.collect()  # <= one row per group
    in_bucket = F.lit(False)  # empty input -> empty result, schema intact
    for r in fences:
        in_bucket = in_bucket | (
            F.col("l_returnflag").eqNullSafe(F.lit(r["l_returnflag"]))
            & (F.col("l_extendedprice") >= r["bkt"] * width)
            & (F.col("l_extendedprice") < (r["bkt"] + 1) * width)
        )
    fence_df = F.broadcast(
        literal_frame(spark, fences, crossing.schema).withColumnRenamed(
            "l_returnflag", "__grp"
        )
    )
    sel = (
        li.filter(in_bucket)
        .join(fence_df, F.col("l_returnflag").eqNullSafe(F.col("__grp")))
        .drop("__grp")
    )
    # Within-bucket prefix sum over DISTINCT PRICES, not rows (r10): prices
    # are fixed-precision (2 dp), so one 64-wide bucket holds <= 6,400
    # distinct values BY CONSTRUCTION at any corpus size — duplicates fold
    # into the per-price weight via a map-side-combined aggregate, and the
    # residual window runs over a bounded frame (the exact pass-2 shape
    # operators/quantile.bucketed_exact_quantiles already uses). This
    # replaces the grouped_running_sum staging (range partitioner sample +
    # localCheckpoint + offset collect = three driver-blocking jobs) with
    # ZERO extra jobs; the crossing price is unchanged because ties
    # collapse identically (any ordering of a tied run crosses the
    # half-weight threshold inside the run, and MIN collapses the run).
    per_price = sel.groupBy("l_returnflag", "l_extendedprice", "below", "tw").agg(
        F.sum("l_quantity").alias("__w")
    )
    wv = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = per_price.withColumn("cw_in", F.sum("__w").over(wv))
    return (
        cum.filter(F.col("below") + F.col("cw_in") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("weighted_median"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
    )


@query("agg_percentile_approx_error", oracle=None, category="aggregate")
def agg_percentile_approx_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side exact vs approx_percentile (Greenwald-Khanna sketch,
    accuracy=1000 => rank error <= n/1000) — the audit a pipeline runs
    ONCE at representative scale before switching its quantile surface to
    the mergeable sketch everywhere (agg_percentiles documents the swap;
    this query measures what it costs). Rows-only: the GK state is
    engine-specific, so DuckDB cannot replicate it; pytest bounds the
    observed error by the sketch's rank guarantee instead."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("exact_p50"),
        F.round(F.percentile_approx("l_extendedprice", 0.5, 1000), 4).alias("approx_p50"),
        F.round(F.percentile("l_extendedprice", 0.99), 4).alias("exact_p99"),
        F.round(F.percentile_approx("l_extendedprice", 0.99, 1000), 4).alias("approx_p99"),
    )


@query("agg_hll_datasketch_union", oracle=None, category="aggregate")
def agg_hll_datasketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Apache DataSketches HLL (Spark's hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate): per-group binary sketches whose
    UNION is re-aggregated into a corpus-wide distinct estimate — the
    interoperable-sketch path (the same binary sketch merges in any
    DataSketches runtime, unlike approx_count_distinct's internal HLL++
    state or the repo's hand-rolled register arrays in
    agg_hll_mergeable_sketch, which pin the arithmetic instead). Emits
    per-group AND unioned estimates next to exact distinct counts.
    Rows-only (sketch estimates are engine-specific); pytest bounds every
    relative error and checks the union estimate covers the global
    distinct count."""
    li = table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey", 12).alias("sk"),
        F.countDistinct("l_partkey").alias("exact_distinct"),
    )
    per_flag = per.select(
        F.col("l_returnflag").alias("scope"),
        F.round(F.hll_sketch_estimate("sk"), 2).alias("est_distinct"),
        "exact_distinct",
    )
    union_row = per.agg(
        F.hll_union_agg("sk").alias("u"),
        F.first(F.lit(1)).alias("_d"),
    ).select(
        F.lit("union").alias("scope"),
        F.round(F.hll_sketch_estimate("u"), 2).alias("est_distinct"),
        F.lit(None).cast("long").alias("exact_distinct"),
    )
    return per_flag.unionByName(union_row)


@query(
    "agg_top_modes_per_group",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS segment, c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2),
    r AS (
      SELECT segment, c_nationkey, n,
             row_number() OVER (PARTITION BY segment
                                ORDER BY n DESC, c_nationkey) AS rk
      FROM c)
    SELECT segment, c_nationkey AS nation_key, n, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
    category="aggregate",
)
def agg_top_modes_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 modes per group (most common nations per market segment) with
    deterministic tie-breaks — the multi-modal generalization of
    agg_mode_deterministic (single mode): count, rank, cut. rank<=3 over
    the collapsed count frame engages WindowGroupLimit pruning."""
    c = table(spark, sf_dir, "customer")
    counts = c.groupBy(
        F.col("c_mktsegment").alias("segment"), "c_nationkey"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("segment").orderBy(F.col("n").desc(), "c_nationkey")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("segment", F.col("c_nationkey").alias("nation_key"), "n", "rk")
    )


@query(
    "agg_geometric_harmonic_means",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS geo_mean_price,
           ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 4) AS harm_mean_price,
           ROUND(AVG(l_extendedprice), 4) AS arith_mean_price
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_geometric_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Pythagorean-means triple per group: geometric
    (exp-mean-log — the right average for ratios and growth rates),
    harmonic (n / sum of reciprocals — the right average for rates), and
    arithmetic, whose mandatory ordering harmonic <= geometric <=
    arithmetic doubles as a built-in self-check. All three are streaming
    one-pass aggregates over row-local transforms."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.exp(F.avg(F.log("l_extendedprice"))), 4).alias("geo_mean_price"),
        F.round(
            F.count(F.lit(1)) / F.sum(1.0 / F.col("l_extendedprice")), 4
        ).alias("harm_mean_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("arith_mean_price"),
    )


@query(
    "agg_weighted_avg_mix_adjusted",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(l_extendedprice / l_quantity), 4) AS simple_avg_unit,
           ROUND(SUM(l_extendedprice) / SUM(l_quantity), 4) AS wtd_avg_unit,
           ROUND(SUM(l_extendedprice) / SUM(l_quantity)
                 - AVG(l_extendedprice / l_quantity), 4) AS mix_effect
    FROM lineitem WHERE l_quantity > 0
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_weighted_avg_mix_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple vs quantity-weighted average unit price, and their gap (the
    MIX EFFECT): when the two diverge, big orders trade at different unit
    prices than small ones — the decomposition behind every 'average
    price moved, but why?' analysis. Both averages and the gap fold in
    one map-side-combined aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg(unit), 4).alias("simple_avg_unit"),
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias(
            "wtd_avg_unit"
        ),
        F.round(
            F.sum("l_extendedprice") / F.sum("l_quantity") - F.avg(unit), 4
        ).alias("mix_effect"),
    )


@query(
    "agg_value_deciles",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM t GROUP BY decile
    """,
    category="aggregate",
)
def agg_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value deciles with boundaries and per-decile totals — the
    equal-COUNT banding behind decile reports and monotonic-lift charts
    (quantile_bucket_features bands by VALUE cutpoints; ntile guarantees
    equal membership instead). Ties break on the unique key so both
    engines agree bit-for-bit.

    Scale shape: NOT a global ntile window (that funnels every order
    through one partition). The global rank comes from the two-pass prefix
    rank (`operators/prefixrank.py`), then ntile's exact bucket arithmetic
    is replayed from (rank, n): with base = n//10 and rem = n%10 the first
    rem deciles get base+1 members — bit-identical membership to the
    engines' NTILE, every stage parallel."""
    from db_core_spark.operators.prefixrank import global_row_number

    o = table(spark, sf_dir, "orders")
    ranked, n = global_row_number(
        o.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice"), F.col("o_orderkey")],
    )
    base, rem = n // 10, n % 10
    pivot = rem * (base + 1)
    rk = F.col("rk")
    decile = F.when(rk <= pivot, ((rk - 1) / (base + 1)).cast("long") + 1).otherwise(
        F.lit(rem) + ((rk - 1 - pivot) / base).cast("long") + 1
    ) if base > 0 else rk  # degenerate n < 10: ntile gives row i bucket i
    t = ranked.select("o_totalprice", decile.cast("long").alias("decile"))
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_decimal_exact_money",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
             AS exact_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS VARCHAR) AS exact_discounted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="aggregate",
)
def agg_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money aggregation in exact DECIMAL: sums accumulate in fixed-point,
    so the result is ORDER-INDEPENDENT — identical on every engine, every
    partitioning, every rerun — where double sums drift in their low bits
    with Spark's run-varying partial-sum order (this round's one test
    flake was exactly that drift flipping a rounding boundary; the fix
    was this technique). Emitted as exact decimal STRINGS, the financial
    reporting contract. Decimal hash aggregation stays whole-stage-
    codegen'd; the cost over doubles is negligible next to the shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("exact_revenue"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("string")
        .alias("exact_discounted"),
        F.count(F.lit(1)).alias("n"),
    )
