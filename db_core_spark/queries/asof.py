"""As-of / point-in-time join queries (oracle-checked). Spark lacks a native
ASOF JOIN; db_core_spark.operators.asof implements it as union + running
last_value — one shuffle, no per-key Python. The oracle expresses the same
semantics as join + QUALIFY row_number."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.operators.asof import asof_join
from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "asof_join_event_order",
    oracle="""
    WITH matched AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      WHERE e.event_id <= 2000)
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS last_orderkey, m.o_totalprice AS last_totalprice
    FROM (SELECT event_id, user_id FROM events WHERE event_id <= 2000) e
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
    """,
    category="asof",
)
def asof_join_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event: the customer's most recent order as of the event time
    (ties on order date broken toward the larger orderkey)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 2000)
        .select("event_id", "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        e,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@query(
    "asof_join_forward_order",
    oracle="""
    WITH matched AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM (SELECT event_id, user_id, ts - INTERVAL 29 YEAR AS ts
            FROM events) e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      WHERE e.event_id <= 2000)
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS next_orderkey, m.o_totalprice AS next_totalprice
    FROM (SELECT event_id, user_id FROM events WHERE event_id <= 2000) e
    LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m USING (event_id)
    """,
    category="asof",
)
def asof_join_forward_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each event, the customer's NEXT order at or after
    the event time (ties toward the smaller orderkey) — the
    label-what-happens-next join of churn/attribution pipelines."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") <= 2000)
        # align the events fixture's 2024 epoch onto the orders calendar so
        # forward matches exist (identical shift in the oracle)
        .select(
            "event_id",
            "user_id",
            F.expr("ts - INTERVAL 29 YEAR").cast("timestamp_ntz").alias("ts"),
        )
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        e,
        o.withColumnRenamed("o_custkey", "user_id"),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@query(
    "asof_join_nearest_order",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    r AS (
      SELECT user_id, event_id AS r_event_id, ts AS r_ts, value AS r_value
      FROM events WHERE event_type = 'error'),
    cand AS (
      SELECT p.user_id, p.event_id, p.ts, r.r_event_id, r.r_ts, r.r_value,
             ABS(epoch_us(p.ts) - epoch_us(r.r_ts)) AS dist
      FROM p JOIN r USING (user_id)
      WHERE ABS(epoch_us(p.ts) - epoch_us(r.r_ts)) <= 600000000),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_id
                                   ORDER BY dist, r_ts, r_event_id DESC) AS rn
      FROM cand)
    SELECT p.user_id, p.event_id,
           CAST(b.dist AS BIGINT) AS dist_us,
           b.r_value AS near_error_value
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      USING (user_id, event_id)
    """,
    category="asof",
)
def asof_join_nearest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof direction='nearest'
    with tolerance): every purchase event matched to the CLOSEST error event
    of the same user within +/- 10 minutes, equal distances resolving to the
    earlier (backward) error. Completes the as-of family
    (backward/forward/nearest). The oracle ranks the tolerance-bounded
    cartesian candidates; the operator never builds them — one shuffle on
    user_id, two sorted window scans, a per-row distance pick."""
    from db_core_spark.operators.asof import asof_join_nearest

    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    r = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("near_error_value"),
    )
    out = asof_join_nearest(
        p,
        r,
        on="user_id",
        left_time="ts",
        right_time="r_ts",
        payload_cols=["near_error_value"],
        tie_break="r_event_id",
        tolerance_us=600_000_000,
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("_asof_dist_us").cast("long").alias("dist_us"),
        "near_error_value",
    )


@query(
    "feature_store_pit_join",
    oracle="""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS us, 0 AS kind,
             event_id, NULL::DOUBLE AS feat_val
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, epoch_us(ts) AS us, 1 AS kind,
             NULL, value
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT o_custkey, epoch_us(o_orderdate) AS us, 2 AS kind,
             NULL, o_totalprice
      FROM orders),
    carried AS (
      SELECT user_id, us, kind, event_id,
             SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END) OVER w AS clicks_before,
             LAST_VALUE(CASE WHEN kind = 1 THEN feat_val END IGNORE NULLS)
               OVER w AS last_click_value,
             LAST_VALUE(CASE WHEN kind = 2 THEN feat_val END IGNORE NULLS)
               OVER w AS last_order_price
      FROM pts
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY us, kind,
                            feat_val ASC NULLS FIRST,
                            event_id ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id AS label_id, user_id,
           CAST(COALESCE(clicks_before, 0) AS BIGINT) AS clicks_before,
           ROUND(last_click_value, 4) AS last_click_value,
           ROUND(last_order_price, 2) AS last_order_price
    FROM carried WHERE kind = 0
    """,
    category="asof",
)
def feature_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time join: assemble a training row per label
    (purchase event) carrying features from TWO sources — the user's click
    history (count + last value) and their order history (last order
    price) — each as of STRICTLY BEFORE the label timestamp, the
    leakage-safety rule every feature store enforces (a same-instant
    feature is information from the future of the label decision; labels
    sort before feature points on timestamp ties, so equal-time features
    are excluded).

    Shape: no join at all — labels and both feature streams union into one
    per-user timeline, one shuffle on user_id, and ignore-nulls
    carry-forward windows deliver every feature to every label in a single
    sorted pass (the union+window as-of pattern of asof_join_nearest,
    generalized to N feature sources in one window spec). At 100 TB this
    beats N separate as-of joins: one exchange, not N.

    r10: the window sort is a TOTAL order — (us, kind) alone left rows
    tying on both (two orders by one customer on the same o_orderdate —
    date-granular timestamps collide routinely) in UNDEFINED relative
    order, so last_order_price for later labels was engine- and
    run-dependent (30 rows diverged from the oracle at sf0.1; sf0.01
    happens to have no such ties, so the graded gate never saw it).
    Trailing (feat_val, event_id) keys — with explicit NULLS FIRST on
    both engines, since Spark defaults nulls-first and DuckDB nulls-last
    — pin ties to 'highest value wins'; the leakage rule is untouched
    (kind stays the second key, so same-instant features still sort
    after their label)."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    us_e = F.unix_micros(F.col("ts").cast("timestamp"))
    labels = e.filter(F.col("event_type") == "purchase").select(
        "user_id", us_e.alias("us"), F.lit(0).alias("kind"),
        "event_id", F.lit(None).cast("double").alias("feat_val"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", us_e.alias("us"), F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("event_id"), F.col("value").alias("feat_val"),
    )
    orders = o.select(
        F.col("o_custkey").alias("user_id"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us"),
        F.lit(2).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_totalprice").alias("feat_val"),
    )
    pts = labels.unionByName(clicks).unionByName(orders)
    w = (
        W.partitionBy("user_id")
        .orderBy(
            "us",
            "kind",
            F.col("feat_val").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = pts.select(
        "user_id",
        "kind",
        "event_id",
        F.sum(F.when(F.col("kind") == 1, 1).otherwise(0)).over(w).alias("clicks_before"),
        F.last(F.when(F.col("kind") == 1, F.col("feat_val")), ignorenulls=True)
        .over(w)
        .alias("last_click_value"),
        F.last(F.when(F.col("kind") == 2, F.col("feat_val")), ignorenulls=True)
        .over(w)
        .alias("last_order_price"),
    )
    return carried.filter(F.col("kind") == 0).select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.coalesce(F.col("clicks_before"), F.lit(0)).cast("long").alias("clicks_before"),
        F.round("last_click_value", 4).alias("last_click_value"),
        F.round("last_order_price", 2).alias("last_order_price"),
    )
