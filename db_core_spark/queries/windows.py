"""Window functions: ranking, lag/lead, running and range frames, top-k per
group. Goal-derived (reference has none, SURVEY.md §2C) — but the same
latest-per-key window implements the reference's MVCC visibility rule
(/root/reference/src/storage/block_driver.rs:461-486); see queries/mvcc.py.

Every ORDER BY inside a window here is a TOTAL order (unique tie-break keys)
so results are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    category="window",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: the canonical window + filter top-k.
    One shuffle on the partition key; rank computed within partitions."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS INT) AS size_dense_rank
    FROM part
    QUALIFY price_rank <= 5
    """,
    category="window",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w_price = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    w_size = W.partitionBy("p_brand").orderBy("p_size")
    return (
        p.withColumn("price_rank", F.rank().over(w_price))
        .withColumn("size_dense_rank", F.dense_rank().over(w_size))
        .filter(F.col("price_rank") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank", "size_dense_rank")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    category="window",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD over each customer's order history (total order by
    date+key). days_since_prev mirrors inter-arrival analysis."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("long").alias("days_since_prev"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(SUM(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS INT) AS seq
    FROM lineitem
    QUALIFY seq <= 20
    """,
    category="window",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per supplier with an explicit ROWS frame. The ORDER BY
    is a total order, so both engines accumulate in the same sequence and the
    rounded running sums are identical.

    Two-pass shape: rank-prune FIRST (row_number <= 20 alone triggers
    WindowGroupLimit — each input task forwards at most 20 rows per
    supplier, so the window shuffle moves O(suppliers x 20), not the fact
    table), then the running sum runs over the survivors. Correct because
    the frame is backward-only: the running sum over the first 20 rows
    equals the full-table value on those rows."""
    li = table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    top = (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .withColumn("seq", F.row_number().over(w))
        .filter(F.col("seq") <= 20)
    )
    return top.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.sum("l_extendedprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_revenue"),
        "seq",
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER (
             ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_10k
    FROM orders
    WHERE o_custkey <= 50
    """,
    category="window",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based): count of orders within $10k below each
    price — RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW.

    Scale shape: NOT an unpartitioned RANGE window (single partition, and
    Spark's range-frame scan is O(n·k) besides). The value-distance count
    is a BANDED RANGE SELF-JOIN — the geo_cell_join pattern in 1-D: prices
    collapse to a distinct-value count table, each value group lands in a
    width-10000 band and is replicated to the band above (a group can only
    serve probes in its own or the next band), probes equi-join on band and
    filter to the exact [p-10000, p] range, then sum group counts. Join
    fan-out per probe is <= 2 bands regardless of data size; everything
    shuffles on the band key."""
    band_w = 10000
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    probes = o.select("o_orderkey", "o_totalprice").withColumn(
        "band", F.floor(F.col("o_totalprice") / band_w).cast("long")
    )
    groups = (
        o.groupBy(F.col("o_totalprice").alias("gp"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("gband", F.floor(F.col("gp") / band_w).cast("long"))
        .select(
            F.explode(F.array(F.col("gband"), F.col("gband") + 1)).alias("band"),
            "gp",
            "cnt",
        )
    )
    return (
        probes.join(
            groups,
            (probes.band == groups.band)
            & (F.col("gp") <= F.col("o_totalprice"))
            & (F.col("gp") >= F.col("o_totalprice") - band_w),
        )
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("cnt").alias("n_within_10k"))
    )


@query(
    "window_share_of_group",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice / SUM(l_extendedprice) OVER (PARTITION BY l_orderkey)
                 * 1000000 + 0.5) / 1000000 AS price_share,
           FLOOR(AVG(l_extendedprice) OVER (PARTITION BY l_orderkey) * 10000 + 0.5) / 10000
             AS order_avg_price
    FROM lineitem WHERE l_orderkey <= 1000
    """,
    category="window",
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered analytic window (whole-partition frame): each line's share
    of its order's revenue. floor-based rounding in both engines — see
    scan_projection_filter."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = W.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w) * 1000000 + 0.5)
         / 1000000).alias("price_share"),
        (F.floor(F.avg("l_extendedprice").over(w) * 10000 + 0.5) / 10000).alias("order_avg_price"),
    )


@query(
    "window_moving_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FLOOR(MEDIAN(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100
             AS med4
    FROM orders WHERE o_custkey % 10 = 0
    """,
    category="window",
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving MEDIAN over an ordered row frame — Spark forbids median with
    an ORDER BY frame (no partial aggregation exists), but the frame here
    is FOUR rows, so the median is exact JVM arithmetic: collect_list over
    the frame, array_sort, take the middle (odd) or two-middle average
    (even). This replaced the r6 applyInPandas rolling(4).median() path:
    the per-group pandas overhead scaled with GROUP COUNT (12.3 s at sf1
    for a 60k-row input — Arrow batches of 4-row groups), where the array
    form is one shuffle + per-row expressions (sf1 0.49 s, 25x). The general
    wide-frame median stays a Pandas-UDF problem (udfs.py showcases that
    surface); a BOUNDED frame should never leave the JVM. Both engines
    interpolate even-count medians as the two-middle average of IDENTICAL
    doubles, so the floor-pinned comparison is bit-stable."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    w4 = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    s = F.array_sort(F.collect_list("o_totalprice").over(w4))
    n = F.size(s)
    mid_odd = F.element_at(s, ((n + 1) / 2).cast("int"))
    mid_even = (
        F.element_at(s, (n / 2).cast("int"))
        + F.element_at(s, (n / 2 + 1).cast("int"))
    ) / 2
    med = F.when(n % 2 == 1, mid_odd).otherwise(mid_even)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.floor(med * 100 + 0.5) / 100).alias("med4"),
    )


@query(
    "window_filtered_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FLOOR(COALESCE(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O')
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
             * 100 + 0.5) / 100 AS open_running
    FROM orders WHERE o_custkey % 15 = 0
    """,
    category="window",
)
def window_filtered_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause inside a window — Spark has no window FILTER,
    so the canonical emulation is a conditional projection feeding the
    aggregate: sum(when(cond, x)) with NO otherwise, which keeps SQL's
    FILTER null semantics (no qualifying rows in the frame -> NULL, not 0;
    both engines then coalesce to -1 to pin the hash). Same single shuffle
    as the plain running sum; the condition never leaves codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 15 == 0)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filtered_sum = F.sum(
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    ).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.floor(F.coalesce(filtered_sum, F.lit(-1.0)) * 100 + 0.5) / 100).alias(
            "open_running"
        ),
    )


@query(
    "window_rolling_count_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(DISTINCT o_orderstatus) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS INT) AS d_status
    FROM orders WHERE o_custkey % 15 = 0
    """,
    category="window",
)
def window_rolling_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) over a moving frame — Spark forbids DISTINCT
    aggregates in windows, so the emulation collects the frame into an
    array and counts distinct elements: size(array_distinct(collect_list
    OVER frame)). Frame width bounds the array (6 rows here), so memory is
    O(frame), not O(partition) — the constraint that makes this shape safe
    at scale. DuckDB runs the real DISTINCT window as the oracle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 15 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderkey").rowsBetween(-5, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.array_distinct(F.collect_list("o_orderstatus").over(w))).alias(
            "d_status"
        ),
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_last_hour,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2)
             AS sum_last_hour
    FROM events
    """,
    category="window",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per user, activity count and value sum over
    the TRAILING HOUR of event time (not row count) — the rate-limiting /
    burst-detection window, where rows-frames are wrong because event
    density varies. Ordering key is integer epoch microseconds, so the
    frame bound is exact and engine-portable. One shuffle on user_id; the
    range frame advances two pointers per partition — O(n) per user, no
    per-row rescan."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3600 * 1000 * 1000, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("sum_last_hour"),
    )


@query(
    "window_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1, 2),
    dd AS (
      SELECT flag, d, rev,
             MAX(rev) OVER (PARTITION BY flag ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS peak
      FROM daily)
    SELECT flag,
           ROUND(MAX(peak - rev), 2) AS max_drawdown,
           ROUND(MAX((peak - rev) / peak), 6) AS max_drawdown_pct,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM dd
    GROUP BY flag
    """,
    category="window",
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series per return flag: the
    largest peak-to-trough fall of daily revenue from its running maximum
    (absolute and as a fraction of the peak) — the standard risk metric
    for any monitored KPI series, same kernel as a price-series drawdown.

    100 TB shape: the raw facts collapse through a map-side-combined
    (flag, day) aggregate FIRST, so the running-max window runs over
    series-length rows (thousands), not fact rows (billions); window
    partitions are per-flag — bounded and balanced. The final per-flag
    reduction is a second tiny hash aggregate."""
    li = table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
    )
    w = (
        W.partitionBy("flag")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dd = daily.withColumn("peak", F.max("rev").over(w))
    return dd.groupBy("flag").agg(
        F.round(F.max(F.col("peak") - F.col("rev")), 2).alias("max_drawdown"),
        F.round(F.max((F.col("peak") - F.col("rev")) / F.col("peak")), 6).alias(
            "max_drawdown_pct"
        ),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "window_topk_trending",
    oracle="""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT h, event_type, n,
             row_number() OVER (PARTITION BY h
                                ORDER BY n DESC, event_type) AS rk,
             n - LAG(n) OVER (PARTITION BY event_type ORDER BY h) AS delta
      FROM hourly)
    SELECT h, event_type, n, CAST(rk AS BIGINT) AS rk,
           CAST(delta AS BIGINT) AS delta_vs_prev_hour
    FROM ranked WHERE rk <= 3
    """,
    category="window",
)
def window_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard kernel: top-3 event types per hour with their
    count delta vs the previous hour — rank answers "what's hot",
    delta answers "what's RISING", the pair every live-trends surface
    ships. Both windows (per-hour rank, per-type lag) run over the
    ALREADY-AGGREGATED hourly frame.

    100 TB shape: facts collapse through one (hour, type) map-side-
    combined aggregate and BOTH windows run over that tiny frame (the
    lag-delta window needs every aggregated row, so rank pruning cannot
    apply — the collapse is what bounds the cost); the streaming twin is
    stream_trending_topk (same plan fed by streaming state)."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = W.partitionBy("h").orderBy(F.col("n").desc(), "event_type")
    wl = W.partitionBy("event_type").orderBy("h")
    ranked = hourly.select(
        "h", "event_type", "n",
        F.row_number().over(wr).cast("long").alias("rk"),
        (F.col("n") - F.lag("n").over(wl)).cast("long").alias("delta_vs_prev_hour"),
    )
    return ranked.filter(F.col("rk") <= 3)


@query(
    "window_recency_features",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) // 1000000
                AS BIGINT) AS secs_since_prev,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS BIGINT)
             AS n_prior_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS n_prior_purchases
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    category="window",
)
def window_recency_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe per-event recency features: seconds since the user's
    previous event, prior event count, prior purchase count — every frame
    ends at 1 PRECEDING so the current row never sees itself (the
    training-feature hygiene point-in-time joins exist for, here in pure
    window form). All three features share ONE user-keyed sort/exchange."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(W.unboundedPreceding, -1)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor((us - F.lag(us).over(w)) / 1000000)
        .cast("long")
        .alias("secs_since_prev"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_prior_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(wp)
        .cast("long")
        .alias("n_prior_purchases"),
    )


@query(
    "window_vwap_running",
    oracle="""
    WITH daily AS (
      SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice) AS pv, SUM(l_quantity) AS vol
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1, 2)
    SELECT flag, d,
           floor(SUM(pv) OVER w / SUM(vol) OVER w * 10000 + 0.5) / 10000
             AS vwap_running,
           floor(pv / vol * 10000 + 0.5) / 10000 AS unit_price_day
    FROM daily
    WINDOW w AS (PARTITION BY flag ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    category="window",
)
def window_vwap_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running VWAP (volume-weighted average price) per return flag over
    Q1-1996: cumulative value / cumulative volume at each day against the
    day's own unit price — the benchmark-vs-spot pair every execution
    desk charts, and the general 'cumulative weighted average' kernel
    (works unchanged for rolling cost basis or blended rates). Facts
    collapse to the daily frame first; both running sums share one
    flag-keyed window."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_shipdate").cast("date").alias("d"),
    ).agg(
        F.sum("l_extendedprice").alias("pv"), F.sum("l_quantity").alias("vol")
    )
    w = (
        W.partitionBy("flag")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "flag",
        "d",
        (F.floor(F.sum("pv").over(w) / F.sum("vol").over(w) * 10000 + 0.5)
         / 10000).alias("vwap_running"),
        (F.floor(F.col("pv") / F.col("vol") * 10000 + 0.5) / 10000).alias(
            "unit_price_day"
        ),
    )


@query(
    "window_personal_percentile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(percent_rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice, o_orderkey),
                 6) AS personal_pctile,
           CAST(CASE WHEN percent_rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice, o_orderkey) >= 0.99
                     THEN 1 ELSE 0 END AS INT) AS personal_max_flag
    FROM orders
    WHERE o_orderkey < 2000
    """,
    category="window",
)
def window_personal_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order's percentile within ITS OWN customer's history — the
    personalization twin of global percentiles: a $500 order is routine
    for a whale and a fraud signal for a small account, and
    personal_pctile is the number that tells them apart (per-entity
    baselining, the same shape fraud velocity checks and 'biggest order
    yet!' notifications use). One customer-keyed percent_rank window;
    unique-key ties keep both engines bit-identical."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    pr = F.percent_rank().over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round(pr, 6).alias("personal_pctile"),
        F.when(pr >= 0.99, 1).otherwise(0).cast("int").alias("personal_max_flag"),
    )
