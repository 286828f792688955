"""Time-series analytics over the events stream: OHLC bars, recursive EWMA
smoothing, rolling DAU/WAU engagement, and exact equi-depth quantile
bucketing.

Goal-derived (SURVEY.md §2C — the reference has no relational operators; its
only time notion is the CSN sequence, `src/common/defs.rs:96-136`). Each
operator is shaped for partition-parallel execution: per-key windows
partition by (event_type|user_id), never a global single-partition window;
the one genuinely sequential recurrence (EWMA) runs as an Arrow-batched
grouped-map kernel, parallel across keys.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "ohlc_time_bars",
    oracle="""
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_hour, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT event_type, bar_hour,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM e GROUP BY event_type, bar_hour
    """,
    category="timeseries",
)
def ohlc_time_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event_type — the canonical
    time-bar downsampling every monitoring/market pipeline runs. Open/close
    are position-based (first/last by (ts, event_id) — the event_id tie-break
    makes the result partitioning-independent), high/low/volume are plain
    aggregates.

    Single-shuffle shape: both row_number windows and the final aggregate
    share the (event_type, hour) hash partitioning, so Catalyst plans ONE
    exchange followed by sorts — at 100 TB the bars parallelize across
    event_type x hour with no global ordering anywhere."""
    e = table(spark, sf_dir, "events").withColumn(
        "bar_hour", F.date_trunc("hour", F.col("ts"))
    )
    wa = W.partitionBy("event_type", "bar_hour").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "bar_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "bar_hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


EWMA_ALPHA = 0.3
EWMA_MAX_EVENTS = 40


@query(
    "ewma_user_value",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    f AS (SELECT * FROM e WHERE rn <= {EWMA_MAX_EVENTS}),
    rec(user_id, rn, y) AS (
      SELECT user_id, rn, value FROM f WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn, {1 - EWMA_ALPHA} * r.y + {EWMA_ALPHA} * f.value
      FROM rec r JOIN f ON f.user_id = r.user_id AND f.rn = r.rn + 1)
    SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events,
           ROUND(arg_max(y, rn), 6) AS ewma
    FROM rec GROUP BY user_id
    """,
    category="timeseries",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values
    (recursive form y_t = (1-a)*y_prev + a*x_t, a=0.3, over the user's
    first 40 events by (ts, event_id)); emits the final smoothed level per
    user. The one genuinely sequential recurrence in the suite — it is NOT
    expressible as a Spark window frame (the weight of every prior row decays
    geometrically with distance), so it runs as an Arrow-batched grouped-map
    kernel: parallel across users, sequential only within a user's bounded
    event list. The oracle is the same recurrence as a recursive CTE, and
    both engines evaluate the identical float64 expression order, so results
    are bit-stable before the 6-dp round.

    At 100 TB this is exactly the shape you want: one shuffle on user_id,
    then an embarrassingly parallel per-key scan — state is O(1) per key, so
    the same kernel is the batch twin of a streaming stateful operator.
    The shuffle is an explicit size-aware repartition on the key (see
    applyinpandas_udaf_gini): AQE's byte-based coalescing is blind to the
    per-group Python-call cost of the grouped-map stage."""
    from db_core_spark.operators.prefixrank import resolve_num_parts

    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    e = e.repartition(resolve_num_parts(e, None), "user_id")

    def ewma_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).head(EWMA_MAX_EVENTS)
        y = None
        for x in pdf["value"].to_numpy():
            y = float(x) if y is None else (1 - EWMA_ALPHA) * y + EWMA_ALPHA * float(x)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "ewma": [round(y, 6)],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        ewma_block, "user_id bigint, n_events bigint, ewma double"
    )


@query(
    "rolling_dau_stickiness",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    spine AS (SELECT DISTINCT day FROM du),
    cover AS (
      SELECT DISTINCT CAST(du.day + i.i * INTERVAL 1 DAY AS DATE) AS cover_day,
             du.user_id
      FROM du, (SELECT UNNEST(range(0, 7)) AS i) i),
    wau AS (
      SELECT c.cover_day AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
      FROM cover c JOIN spine s ON s.day = c.cover_day GROUP BY 1),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1)
    SELECT d.day, d.dau, w.wau, ROUND(d.dau * 1.0 / w.wau, 6) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
    category="timeseries",
)
def rolling_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly active users, and the
    DAU/WAU stickiness ratio — the standard engagement rollup. COUNT(DISTINCT
    user) OVER a RANGE frame is not a thing in either engine, so WAU uses the
    scale-correct reformulation: each (day, user) activity row COVERS the
    next 7 calendar days; distinct (cover_day, user) then counts per day.

    That turns an O(days x scan) self-join into one explode (x7, bounded) +
    one distinct + one count — all hash-partitioned, no per-day rescans. The
    day spine semi-join keeps only days that exist in the data, so the two
    engines agree on edge days without a calendar table."""
    e = table(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct()
    cover = (
        du.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day", "user_id"
        )
        .select(F.date_add(F.col("day"), F.col("i")).alias("day"), "user_id")
        .distinct()
    )
    wau = (
        cover.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("date").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


_DECILES = [i / 10 for i in range(1, 10)]


@query(
    "quantile_bucket_features",
    oracle=f"""
    WITH q AS (
      SELECT quantile_cont(l_extendedprice,
                           {_DECILES}) AS qs
      FROM lineitem),
    b AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             1 + len(list_filter(q.qs, x -> l_extendedprice > x)) AS bucket
      FROM lineitem, q)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM b GROUP BY bucket
    """,
    category="timeseries",
)
def quantile_bucket_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) feature bucketing of l_extendedprice with
    per-bucket stats — the quantile-binning step of feature pipelines and the
    histogram-equalization step of layout planning. Deliberately NOT
    NTILE(): a global NTILE is a single-partition window (the anti-scale
    shape). Instead: exact decile boundaries via the percentile aggregate
    (distributed partial aggregation), broadcast the 9 boundaries back, and
    assign buckets with a map-side comparison — the corpus is scanned twice
    but never globally sorted and never funneled through one task.

    Ties sit with the lower bucket (strict >) in both engines, so bucket
    assignment is deterministic even at repeated prices."""
    li = table(spark, sf_dir, "lineitem")
    q = li.agg(
        F.percentile("l_extendedprice", F.array(*[F.lit(d) for d in _DECILES])).alias(
            "qs"
        )
    )
    b = li.crossJoin(F.broadcast(q)).select(
        "l_extendedprice",
        (
            1
            + F.size(
                F.filter(
                    F.col("qs"), lambda x: F.col("l_extendedprice") > x
                )
            )
        ).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@query(
    "anomaly_mad_robust",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type,
           ROUND(ANY_VALUE(d.med), 6) AS med,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    category="timeseries",
)
def anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event_type: median / MAD (median absolute
    deviation) with the standard 3-sigma-equivalent cut (1.4826 * MAD ~ one
    Gaussian sigma). Mean/stddev-based z-scores move with the outliers they
    hunt; the median/MAD pair doesn't — this is the robust twin of
    `window_rolling_zscore`.

    Two-pass shape, both passes distributed: exact median per group via the
    percentile aggregate (partial aggregation, no global sort), broadcast the
    tiny per-group medians back, aggregate absolute deviations the same way.
    At 100 TB: two scans, two small broadcasts, zero wide shuffles of the
    fact data."""
    e = table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "session_conversion_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM seq),
    per_sess AS (
      SELECT user_id, session_no,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
             MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS last_purchase
      FROM sess GROUP BY 1, 2)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase > first_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN first_view IS NOT NULL AND last_purchase > first_view
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS conv_rate
    FROM per_sess GROUP BY user_id
    """,
    category="timeseries",
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session view->purchase conversion per user: sessionize by
    30-minute inactivity gap (same lag/cumsum assignment as
    `sessionize_gap_events`, microsecond-exact), mark a session converted
    when a purchase strictly follows the session's first view, and roll up
    per user. The composition funnels run on: session boundaries + ordered
    containment + rate. One shuffle on user_id shared by both windows and
    both aggregates; the NULL-propagating min/max comparison avoids any
    per-event join."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > 1800 * 1000 * 1000), 1).otherwise(0)
    sess = e.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", us)).alias("last_purchase"),
    )
    converted = (
        F.col("first_view").isNotNull()
        & (F.col("last_purchase") > F.col("first_view"))
    ).cast("int")
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(converted).cast("long").alias("n_converted"),
        F.round(F.sum(converted) / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


@query(
    "new_users_cumulative",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1),
    daily AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY 1)
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
    FROM daily
    """,
    category="timeseries",
)
def new_users_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user acquisition curve: first-seen day per user, daily new-user
    counts, and the cumulative user base — the growth chart every product
    pipeline materializes. The global running sum runs over the DAILY
    aggregate (one row per calendar day — bounded, tiny), never over raw
    events: the heavy lifting is two hash aggregates on user_id/day, and the
    single-partition window touches only the date spine. Spark and DuckDB
    agree on the frame because the day grain is unique by construction."""
    e = table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    wd = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "n_new",
        F.sum("n_new").over(wd).cast("long").alias("cum_users"),
    )


@query(
    "streak_gaps_islands",
    oracle="""
    WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    seq AS (
      SELECT user_id, day,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM du),
    isl AS (
      SELECT user_id, day, CAST(day - rn * INTERVAL 1 DAY AS DATE) AS island
      FROM seq),
    streaks AS (
      SELECT user_id, island, MIN(day) AS start_day, MAX(day) AS end_day,
             CAST(COUNT(*) AS BIGINT) AS streak_len
      FROM isl GROUP BY 1, 2),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY streak_len DESC, start_day) AS brn
      FROM streaks)
    SELECT user_id, start_day, end_day, streak_len
    FROM best WHERE brn = 1
    """,
    category="timeseries",
)
def streak_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active days
    (ties -> earliest start) — the streak feature every engagement model
    wants, and the canonical rn-difference trick: within a user, day minus
    row_number is constant exactly along a gap-free run, so islands fall out
    of one window + one aggregate. Everything partitions by user_id; the
    per-user top-1 is a WindowGroupLimit, not a global sort."""
    e = table(spark, sf_dir, "events")
    du = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    wu = W.partitionBy("user_id").orderBy("day")
    isl = du.withColumn("rn", F.row_number().over(wu)).withColumn(
        "island", F.date_sub(F.col("day"), F.col("rn"))
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count(F.lit(1)).alias("streak_len"),
    )
    wb = W.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("start_day")
    )
    return (
        streaks.withColumn("brn", F.row_number().over(wb))
        .filter(F.col("brn") == 1)
        .select("user_id", "start_day", "end_day", "streak_len")
    )


_SESS_INTERVALS_SQL = """
    seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM seq),
    iv AS (
      SELECT user_id, CAST(session_no AS INT) AS session_no,
             MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
      FROM sess GROUP BY 1, 2)
"""


@query(
    "join_interval_overlap_sessions",
    oracle="WITH "
    + _SESS_INTERVALS_SQL
    + """
    SELECT a.user_id AS user_a, a.session_no AS session_a,
           b.user_id AS user_b, b.session_no AS session_b,
           CAST(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS BIGINT)
             AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    WHERE LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) >= 300000000
    """,
    category="timeseries",
)
def join_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN: pairs of sessions from DIFFERENT users that
    were concurrently active for >= 5 minutes — the interval-vs-interval
    join (concurrency analysis, co-occurrence, resource contention) that
    naive SQL writes as a non-equi self-join (the oracle does exactly that;
    DuckDB's IEJoin absorbs it at fixture scale).

    The Spark plan never builds the non-equi product: each session interval
    explodes to the HOUR BUCKETS it touches (bounded: sessions are
    gap-bounded at 30 min), candidates come from an equi-join on the bucket,
    exact overlap + dedup runs on that small candidate set — the same
    bucket-decomposition that keeps `join_range_bucketed_pure`
    nested-loop-free, extended to two interval sets."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(prev_us.isNull() | ((us - prev_us) > 1800 * 1000 * 1000), 1).otherwise(0)
    sess = e.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
    )
    iv = sess.groupBy("user_id", "session_no").agg(
        F.min(us).alias("s_us"), F.max(us).alias("e_us")
    )
    hour_us = 3600 * 1000 * 1000
    bucketed = iv.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("s_us") / hour_us).cast("long"),
                (F.col("e_us") / hour_us).cast("long"),
            )
        ).alias("hb"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    ov = F.least(F.col("a.e_us"), F.col("b.e_us")) - F.greatest(
        F.col("a.s_us"), F.col("b.s_us")
    )
    return (
        a.join(
            b,
            (F.col("a.hb") == F.col("b.hb"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") <= F.col("b.e_us"))
            & (F.col("b.s_us") <= F.col("a.e_us")),
        )
        .filter(ov >= 300 * 1000 * 1000)
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_no").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_no").alias("session_b"),
            ov.cast("long").alias("overlap_us"),
        )
        .dropDuplicates(["user_a", "session_a", "user_b", "session_b"])
    )


@query(
    "drift_psi_event_mix",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'ref' ELSE 'cur' END
               AS period
      FROM events),
    c AS (SELECT period, event_type, COUNT(*) AS n FROM tagged GROUP BY 1, 2),
    t AS (SELECT period, SUM(n) AS total FROM c GROUP BY 1),
    p AS (
      SELECT c.event_type,
             MAX(CASE WHEN c.period = 'ref' THEN c.n * 1.0 / t.total END) AS p_ref,
             MAX(CASE WHEN c.period = 'cur' THEN c.n * 1.0 / t.total END) AS p_cur
      FROM c JOIN t USING (period) GROUP BY 1)
    SELECT event_type,
           ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
    FROM p
    """,
    category="timeseries",
)
def drift_psi_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index (PSI) drift between the first and second
    half of the month: per event_type, reference vs current share and the
    PSI contribution (p_cur - p_ref) * ln(p_cur / p_ref) — the standard
    production-monitoring check that a pipeline's input mix hasn't shifted
    under it (psi_term summed > 0.2 = investigate). Two count aggregates +
    a tiny per-category fold; the event stream is scanned once."""
    e = table(spark, sf_dir, "events")
    tagged = e.select(
        "event_type",
        F.when(F.to_date("ts") < F.lit("2024-01-16").cast("date"), "ref")
        .otherwise("cur")
        .alias("period"),
    )
    c = tagged.groupBy("period", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("period").agg(F.sum("n").alias("total"))
    p = (
        c.join(t, "period")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("period") == "ref", F.col("n") / F.col("total"))).alias(
                "p_ref"
            ),
            F.max(F.when(F.col("period") == "cur", F.col("n") / F.col("total"))).alias(
                "p_cur"
            ),
        )
    )
    return p.select(
        "event_type",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")), 6
        ).alias("psi_term"),
    )


@query(
    "autocorr_daily_volume",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS n_prev
      FROM daily)
    SELECT event_type,
           CAST(COUNT(n_prev) AS BIGINT) AS n_pairs,
           ROUND(CORR(n, n_prev), 6) AS lag1_autocorr
    FROM lagged GROUP BY event_type
    """,
    category="timeseries",
)
def autocorr_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily volume — the
    seasonality/momentum probe run before forecasting or anomaly models.
    Windows and the correlation aggregate both partition by event_type;
    the lag runs over the tiny daily spine, never raw events."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    wl = W.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("n_prev", F.lag("n").over(wl))
    return lagged.groupBy("event_type").agg(
        F.count("n_prev").alias("n_pairs"),
        F.round(F.corr("n", "n_prev"), 6).alias("lag1_autocorr"),
    )


def psi_from_counts(counts: DataFrame, baseline: DataFrame) -> DataFrame:
    """PSI per window from (window_start, event_type, n) counts vs a
    (event_type, bn) baseline — the shared kernel of the batch
    `drift_psi_windowed` query and the streaming monitor (the live path
    materializes watermarked tumbling counts to a sink and runs THIS on
    the counts; pytest pins streamed PSI == batch PSI). Laplace smoothing
    (+0.5 per cell) keeps categories missing from a window finite and the
    arithmetic engine-replicable. Everything downstream of the counts is
    spine-sized: |windows| x |types| rows."""
    from pyspark.sql import functions as F

    k = baseline.count()
    bt = baseline.agg(F.sum("bn").alias("bt")).collect()[0].bt
    windows = counts.select("window_start").distinct()
    wt = counts.groupBy("window_start").agg(F.sum("n").alias("wt"))
    spine = (
        windows.crossJoin(F.broadcast(baseline))
        .join(counts, ["window_start", "event_type"], "left")
        .join(F.broadcast(wt), "window_start")
        .select(
            "window_start",
            "wt",
            ((F.coalesce(F.col("n"), F.lit(0)) + 0.5) / (F.col("wt") + 0.5 * k)).alias(
                "p_w"
            ),
            ((F.col("bn") + 0.5) / (bt + 0.5 * k)).alias("p_b"),
        )
    )
    return spine.groupBy("window_start").agg(
        F.max("wt").cast("long").alias("n_events"),
        F.round(
            F.sum((F.col("p_w") - F.col("p_b")) * F.log(F.col("p_w") / F.col("p_b"))), 6
        ).alias("psi"),
    )


def ks_from_binned_counts(counts: DataFrame, baseline: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per window from binned VALUE
    counts — (window_start, bin, n) vs a (bin, bn) reference — the shared
    kernel of the batch `drift_ks_windowed` query and the streaming
    monitor (the live path materializes watermarked tumbling bin counts to
    a sink and runs THIS on them; pytest pins streamed KS == batch KS).
    KS = max |CDF_w - CDF_ref| over the bin spine. The baseline's bins
    cover every window bin (a window is a subset of the corpus the
    baseline binned), so the spine join is complete; the cumulative runs
    per-window over <= |bins| rows — bounded, partitioned, never a global
    window."""
    from pyspark.sql import Window as W2
    from pyspark.sql import functions as F

    bt = baseline.agg(F.sum("bn").alias("bt")).collect()[0].bt
    windows = counts.select("window_start").distinct()
    wt = counts.groupBy("window_start").agg(F.sum("n").alias("wt"))
    spine = (
        windows.crossJoin(F.broadcast(baseline))
        .join(counts, ["window_start", "bin"], "left")
        .join(F.broadcast(wt), "window_start")
    )
    wcum = (
        W2.partitionBy("window_start")
        .orderBy("bin")
        .rowsBetween(W2.unboundedPreceding, W2.currentRow)
    )
    cum = spine.select(
        "window_start",
        "wt",
        (F.sum(F.coalesce(F.col("n"), F.lit(0))).over(wcum) / F.col("wt")).alias(
            "cdf_w"
        ),
        (F.sum("bn").over(wcum) / F.lit(bt)).alias("cdf_b"),
    )
    return cum.groupBy("window_start").agg(
        F.max("wt").cast("long").alias("n_events"),
        F.round(F.max(F.abs(F.col("cdf_w") - F.col("cdf_b"))), 6).alias("ks_stat"),
    )


@query(
    "drift_ks_windowed",
    oracle="""
    WITH bounds AS (
      SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events),
    binned AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '6 hours', ts)) AS BIGINT)
               AS window_start,
             LEAST(63, CAST(FLOOR((value - b.vmin) / ((b.vmax - b.vmin) / 64.0))
                            AS BIGINT)) AS bin
      FROM events, bounds b),
    counts AS (
      SELECT window_start, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM binned GROUP BY 1, 2),
    base AS (
      SELECT bin, CAST(SUM(n) AS BIGINT) AS bn
      FROM counts GROUP BY 1),
    bt AS (SELECT SUM(bn) AS bt FROM base),
    wt AS (SELECT window_start, SUM(n) AS wt FROM counts GROUP BY 1),
    spine AS (
      SELECT w.window_start, wt.wt, b.bin,
             COALESCE(c.n, 0) AS n, b.bn
      FROM (SELECT DISTINCT window_start FROM counts) w
      CROSS JOIN base b
      LEFT JOIN counts c ON c.window_start = w.window_start AND c.bin = b.bin
      JOIN wt ON wt.window_start = w.window_start),
    cum AS (
      SELECT window_start, wt,
             SUM(n) OVER (PARTITION BY window_start ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / wt AS cdf_w,
             SUM(bn) OVER (PARTITION BY window_start ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / (SELECT bt FROM bt) AS cdf_b
      FROM spine)
    SELECT window_start, CAST(MAX(wt) AS BIGINT) AS n_events,
           ROUND(MAX(ABS(cdf_w - cdf_b)), 6) AS ks_stat
    FROM cum GROUP BY window_start
    """,
    category="timeseries",
)
def drift_ks_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous VALUE-distribution drift: two-sample KS per 6-hour
    tumbling window against the whole-corpus distribution — the
    distributional sibling of `drift_psi_windowed` (PSI watches the
    categorical mix; KS watches a numeric column's shape, catching
    mean/variance/tail shifts a category monitor can't see). Values bin
    into 64 fixed-width buckets (edges from the corpus min/max — in a live
    deployment these come from the reference window's fit, exactly how the
    streaming twin takes them as parameters), one windowed hash aggregate
    over the scan, then the KS fold on the |windows| x 64 spine —
    metadata-sized at any scale. The streaming twin
    (`streaming/ops.py::tumbling_value_bins` + `ks_from_binned_counts`) is
    pinned bit-equal by a live pytest."""
    e = table(spark, sf_dir, "events")
    b = e.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax")).collect()[0]
    width = (b.vmax - b.vmin) / 64.0
    bin_col = F.least(
        F.lit(63), F.floor((F.col("value") - F.lit(b.vmin)) / F.lit(width))
    ).cast("long")
    counts = (
        e.groupBy(F.window("ts", "6 hours"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start").cast("timestamp"))
            .cast("long")
            .alias("window_start"),
            "bin",
            "n",
        )
    )
    baseline = counts.groupBy("bin").agg(F.sum("n").alias("bn"))
    return ks_from_binned_counts(counts, baseline)


@query(
    "drift_psi_windowed",
    oracle="""
    WITH counts AS (
      SELECT CAST(epoch(time_bucket(INTERVAL '6 hours', ts)) AS BIGINT)
               AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    base AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS bn
      FROM events GROUP BY 1),
    k AS (SELECT COUNT(*) AS k FROM base),
    bt AS (SELECT SUM(bn) AS bt FROM base),
    wt AS (SELECT window_start, SUM(n) AS wt FROM counts GROUP BY 1),
    spine AS (
      SELECT w.window_start, wt.wt,
             (COALESCE(c.n, 0) + 0.5) / (wt.wt + 0.5 * k.k) AS p_w,
             (b.bn + 0.5) / (bt.bt + 0.5 * k.k) AS p_b
      FROM (SELECT DISTINCT window_start FROM counts) w
      CROSS JOIN base b
      LEFT JOIN counts c
        ON c.window_start = w.window_start AND c.event_type = b.event_type
      JOIN wt ON wt.window_start = w.window_start, k, bt)
    SELECT window_start, CAST(MAX(wt) AS BIGINT) AS n_events,
           ROUND(SUM((p_w - p_b) * LN(p_w / p_b)), 6) AS psi
    FROM spine GROUP BY window_start
    """,
    category="timeseries",
)
def drift_psi_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous drift monitoring: PSI of the event-type mix per 6-hour
    tumbling window against the whole-corpus baseline — the windowed,
    always-on version of drift_psi_event_mix's one-shot split. Counts come
    from one windowed hash aggregate over the scan (the identical
    aggregation the STREAMING monitor runs under a watermark — see
    tumbling_counts; the live pytest pins streamed PSI bit-equal to this
    query); PSI itself folds over the |windows| x |types| spine, which is
    metadata-sized at any corpus scale."""
    e = table(spark, sf_dir, "events")
    counts = (
        e.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start").cast("timestamp"))
            .cast("long")
            .alias("window_start"),
            "event_type",
            "n",
        )
    )
    baseline = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("bn"))
    return psi_from_counts(counts, baseline)


@query(
    "seasonal_decompose_weekly",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds),
    daily AS (
      SELECT s.day, COALESCE(SUM(e.value), 0.0) AS revenue
      FROM spine s
      LEFT JOIN events e
        ON CAST(e.ts AS DATE) = s.day AND e.event_type = 'purchase'
      GROUP BY s.day),
    tr AS (
      SELECT day, revenue,
             AVG(revenue) OVER (ORDER BY day
                                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
      FROM daily),
    se AS (
      SELECT day, revenue, trend,
             AVG(revenue - trend) OVER (PARTITION BY dayofweek(day)) AS seasonal
      FROM tr)
    SELECT day, ROUND(revenue, 2) AS revenue, ROUND(trend, 4) AS trend,
           ROUND(seasonal, 4) AS seasonal,
           ROUND(revenue - trend - seasonal, 4) AS residual
    FROM se
    """,
    category="timeseries",
)
def seasonal_decompose_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily purchase revenue: trend = a
    7-day centered moving average over the gap-filled date spine, weekly
    seasonal = mean detrended value per day-of-week, residual = the rest —
    the classical decomposition behind anomaly baselines and
    seasonality-aware forecasts. The series frame is one row per DAY, so
    every window here runs over a calendar-bounded frame (years = O(100s)
    of rows) regardless of event volume; event-scale data is touched only
    by the first aggregate. Day-of-week keys align across engines
    (dayofweek-1 == DuckDB's Sunday-0)."""
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    daily = spine.join(purchases, "day", "left").select(
        "day", F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue")
    )
    w_tr = W.orderBy("day").rowsBetween(-3, 3)
    tr = daily.withColumn("trend", F.avg("revenue").over(w_tr))
    w_se = W.partitionBy(F.dayofweek("day") - 1)
    se = tr.withColumn("seasonal", F.avg(F.col("revenue") - F.col("trend")).over(w_se))
    return se.select(
        "day",
        F.round("revenue", 2).alias("revenue"),
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("revenue") - F.col("trend") - F.col("seasonal"), 4).alias("residual"),
    )


HOLT_ALPHA, HOLT_BETA = 0.5, 0.3


@query(
    "forecast_holt_linear",
    oracle=f"""
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds),
    daily AS (
      SELECT s.day, COALESCE(SUM(e.value), 0.0) AS y,
             ROW_NUMBER() OVER (ORDER BY s.day) AS rn
      FROM spine s
      LEFT JOIN events e
        ON CAST(e.ts AS DATE) = s.day AND e.event_type = 'purchase'
      GROUP BY s.day),
    holt AS (
      SELECT rn, y,
             (SELECT y FROM daily WHERE rn = 1) AS l,
             (SELECT y FROM daily WHERE rn = 2)
               - (SELECT y FROM daily WHERE rn = 1) AS b
      FROM daily WHERE rn = 1
      UNION ALL
      SELECT d.rn, d.y,
             {HOLT_ALPHA} * d.y + {1 - HOLT_ALPHA} * (h.l + h.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * d.y + {1 - HOLT_ALPHA} * (h.l + h.b)) - h.l)
               + {1 - HOLT_BETA} * h.b
      FROM daily d JOIN holt h ON d.rn = h.rn + 1),
    last AS (SELECT l, b FROM holt ORDER BY rn DESC LIMIT 1)
    SELECT CAST(h.h AS INT) AS horizon_days,
           ROUND(last.l + h.h * last.b, 4) AS forecast_revenue
    FROM last, (SELECT UNNEST(range(1, 8)) AS h) h
    """,
    category="timeseries",
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of daily purchase revenue: double
    exponential smoothing (level alpha=0.5, trend beta=0.3, init l=y1,
    b=y2-y1) folded over the gap-filled daily series, then a 7-day-ahead
    linear extrapolation. The recurrence is inherently sequential but runs
    over the CALENDAR-bounded daily frame (one grouped-map over ~rows =
    days — the ewma_user_value shape with a singleton key), never over
    raw events; the event stream is touched once by the daily aggregate.
    Identical float64 fold order on both engines (recursive-CTE oracle),
    so the forecast is pinned bit-for-bit like the EWMA twin."""
    import math  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    daily = (
        spine.join(purchases, "day", "left")
        .select("day", F.coalesce(F.col("rev"), F.lit(0.0)).alias("y"))
        .withColumn("g", F.lit(1))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = pdf["y"].to_numpy()
        level = float(ys[0])
        trend = float(ys[1]) - float(ys[0])
        for y in ys[1:]:
            y = float(y)
            new_level = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (level + trend)
            trend = HOLT_BETA * (new_level - level) + (1 - HOLT_BETA) * trend
            level = new_level
        return pd.DataFrame(
            {
                "horizon_days": pd.Series(range(1, 8), dtype="int32"),
                "forecast_revenue": [
                    # floor(x*1e4+0.5)/1e4 == SQL ROUND half-up (values are
                    # positive revenue levels; python round() is banker's)
                    math.floor((level + h * trend) * 10000 + 0.5) / 10000
                    for h in range(1, 8)
                ],
            }
        )

    return daily.groupBy("g").applyInPandas(
        holt, "horizon_days int, forecast_revenue double"
    )


@query(
    "survival_kaplan_meier",
    oracle="""
    WITH mx AS (SELECT CAST(max(ts) AS DATE) AS mdate FROM events),
    per_user AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE)) AS dur,
             CASE WHEN date_diff('day', CAST(max(ts) AS DATE),
                                 (SELECT mdate FROM mx)) > 7
                  THEN 1 ELSE 0 END AS churned
      FROM events GROUP BY user_id),
    by_dur AS (
      SELECT dur, SUM(churned) AS d, SUM(1 - churned) AS c, COUNT(*) AS tot
      FROM per_user GROUP BY dur),
    risk AS (
      SELECT dur, d, c,
             SUM(tot) OVER (ORDER BY dur DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS n_risk
      FROM by_dur),
    km AS (
      SELECT dur, d, c, n_risk,
             exp(SUM(CASE WHEN d > 0 AND d < n_risk
                          THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                          ELSE 0.0 END)
                 OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW)) AS s
      FROM risk)
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_churn,
           CAST(c AS BIGINT) AS c_censored,
           ROUND(s, 6) AS s_km
    FROM km
    """,
    category="timeseries",
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve with right-censoring: per-user
    lifetime = first-to-last activity span; users still active within 7
    days of the corpus horizon are CENSORED (their lifetime is a lower
    bound), everyone else churned. S(t) = prod over churn days <= t of
    (1 - d/n_risk) — the estimator that uses censored users correctly,
    which naive "percent still active" retention curves get wrong.
    (Convention: censor-only days contribute no factor; a terminal day
    where everyone at risk churns is also skipped to keep ln defined —
    both engines apply the identical guard.)

    100 TB shape: the fact scan collapses through a per-user min/max hash
    aggregate (map-side combined), then the KM fold runs over the tiny
    duration-histogram series — the cumulative product is
    exp(running-sum(ln)), all codegen window arithmetic. The horizon is
    a broadcast 1-row aggregate."""
    e = table(spark, sf_dir, "events")
    mx = e.agg(F.max(F.col("ts").cast("date")).alias("mdate"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("date")).alias("first_d"),
            F.max(F.col("ts").cast("date")).alias("last_d"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff("last_d", "first_d").alias("dur"),
            F.when(F.datediff("mdate", "last_d") > 7, 1).otherwise(0).alias("churned"),
        )
    )
    by_dur = per_user.groupBy("dur").agg(
        F.sum("churned").alias("d"),
        F.sum(1 - F.col("churned")).alias("c"),
        F.count(F.lit(1)).alias("tot"),
    )
    w_desc = (
        W.orderBy(F.col("dur").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = by_dur.withColumn("n_risk", F.sum("tot").over(w_desc))
    w_asc = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(0.0)
    km = risk.withColumn("s", F.exp(F.sum(term).over(w_asc)))
    return km.select(
        F.col("dur").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_churn"),
        F.col("c").cast("long").alias("c_censored"),
        F.round("s", 6).alias("s_km"),
    )


@query(
    "anomaly_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1),
    base AS (
      SELECT d, rev,
             AVG(rev) OVER () AS mu,
             stddev_pop(rev) OVER () AS sd
      FROM daily),
    y AS (
      SELECT d, rev, (rev - mu - 0.5 * sd) / sd AS yv FROM base),
    c AS (
      SELECT d, rev, yv,
             SUM(yv) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS cs
      FROM y),
    s AS (
      SELECT d, rev,
             cs - LEAST(0.0,
                        MIN(cs) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW)) AS cusum
      FROM c)
    SELECT d, ROUND(rev, 2) AS rev, ROUND(cusum, 6) AS cusum,
           CAST(CASE WHEN cusum > 5.0 THEN 1 ELSE 0 END AS INT) AS alarm
    FROM s
    WHERE cusum > 5.0
    """,
    category="timeseries",
)
def anomaly_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point monitor on daily revenue (slack k =
    0.5σ, threshold h = 5σ — the standard upward-shift detector): days
    where the cumulative standardized excursion exceeds the alarm line.
    The textbook recursion S_i = max(0, S_{i-1} + y_i) is rewritten
    WINDOW-ONLY via the identity S_i = cumsum_i - min(0, running-min of
    cumsum) — no recursion, no UDF, so the monitor runs as plain codegen
    window arithmetic on any engine (the oracle uses the identical
    rewrite; forecast_holt_linear is the recursive-CTE counterpart).

    100 TB shape: facts collapse through the (day) hash aggregate first;
    all windows run over the tiny daily series. Global mean/sd are
    unpartitioned window aggregates over that series, not the facts."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    wall = W.partitionBy()
    base = daily.select(
        "d", "rev",
        F.avg("rev").over(wall).alias("mu"),
        F.stddev_pop("rev").over(wall).alias("sd"),
    )
    y = base.withColumn(
        "yv", (F.col("rev") - F.col("mu") - 0.5 * F.col("sd")) / F.col("sd")
    )
    ww = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = y.withColumn("cs", F.sum("yv").over(ww))
    s = c.withColumn(
        "cusum", F.col("cs") - F.least(F.lit(0.0), F.min("cs").over(ww))
    )
    return s.filter(F.col("cusum") > 5.0).select(
        "d",
        F.round("rev", 2).alias("rev"),
        F.round("cusum", 6).alias("cusum"),
        F.when(F.col("cusum") > 5.0, 1).otherwise(0).cast("int").alias("alarm"),
    )


@query(
    "window_rolling_corr",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev,
             SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT d, rev, qty,
             corr(rev, qty) OVER (ORDER BY d ROWS BETWEEN 29 PRECEDING
                                                      AND CURRENT ROW) AS c,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 29 PRECEDING
                                                AND CURRENT ROW) AS n
      FROM daily)
    SELECT d, floor(rev * 100 + 0.5) / 100 AS rev, ROUND(c, 6) AS corr30
    FROM r WHERE n = 30
    """,
    category="window",
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day rolling correlation between daily revenue and
    shipped quantity — the co-movement monitor that flags when price mix
    decouples from volume (a mix-shift or pricing regime change). Only
    full 30-day windows emit, so the series has no warm-up artifacts.

    100 TB shape: facts collapse through the daily aggregate first;
    corr() runs as a window aggregate over the tiny series (single-pass
    covariance moments per frame). Same collapsed-series discipline as
    window_max_drawdown/anomaly_cusum_changepoint."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.sum("l_quantity").alias("qty"),
    )
    w = W.orderBy("d").rowsBetween(-29, W.currentRow)
    r = daily.select(
        "d",
        "rev",
        F.corr("rev", "qty").over(w).alias("c"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return r.filter(F.col("n") == 30).select(
        "d",
        (F.floor(F.col("rev") * 100 + 0.5) / 100).alias("rev"),
        F.round("c", 6).alias("corr30"),
    )


@query(
    "forecast_backtest_rolling",
    oracle=f"""
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds),
    daily AS (
      SELECT s.day, COALESCE(SUM(e.value), 0.0) AS y,
             ROW_NUMBER() OVER (ORDER BY s.day) AS rn
      FROM spine s
      LEFT JOIN events e
        ON CAST(e.ts AS DATE) = s.day AND e.event_type = 'purchase'
      GROUP BY s.day),
    origins AS (SELECT UNNEST(range(20, 27)) AS o),
    holt AS (
      SELECT og.o, d1.rn,
             (SELECT y FROM daily WHERE rn = 1) AS l,
             (SELECT y FROM daily WHERE rn = 2)
               - (SELECT y FROM daily WHERE rn = 1) AS b
      FROM origins og, daily d1 WHERE d1.rn = 1
      UNION ALL
      SELECT h.o, d.rn,
             {HOLT_ALPHA} * d.y + {1 - HOLT_ALPHA} * (h.l + h.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * d.y + {1 - HOLT_ALPHA} * (h.l + h.b)) - h.l)
               + {1 - HOLT_BETA} * h.b
      FROM daily d JOIN holt h ON d.rn = h.rn + 1 AND d.rn <= h.o),
    fitted AS (SELECT o, l, b FROM holt WHERE rn = o),
    fc AS (
      SELECT f.o, hh.h, f.l + hh.h * f.b AS yhat
      FROM fitted f, (SELECT UNNEST(range(1, 8)) AS h) hh
      WHERE f.o + hh.h <= (SELECT MAX(rn) FROM daily)),
    joined AS (
      SELECT fc.o, fc.yhat, d.y
      FROM fc JOIN daily d ON d.rn = fc.o + fc.h)
    SELECT CAST(o AS BIGINT) AS origin_rn,
           CAST(COUNT(*) AS BIGINT) AS n_horizons,
           ROUND(AVG(ABS(yhat - y)), 4) AS mae,
           ROUND(AVG(CASE WHEN y <> 0 THEN ABS(yhat - y) / y END), 6) AS mape
    FROM joined
    GROUP BY o
    """,
    category="timeseries",
)
def forecast_backtest_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast evaluation — the honest way to score a
    forecaster: for each origin day o (days 20..26 of the series), fit
    Holt on data THROUGH o only, forecast up to 7 days ahead, and score
    against the actuals that origin could not see (MAE + MAPE per
    origin). One grouped-map fits ALL origins in parallel (each group is
    its own truncated series — the replicate-and-truncate pattern turns
    sequential backtesting into one shuffle); the oracle runs the
    origin-parameterized recursive CTE, pinning every fold bit-for-bit.

    100 TB shape: raw events collapse to the calendar-bounded daily
    frame ONCE; replication is origins x days of that tiny frame, never
    of facts. More origins = more parallelism, not more passes."""
    import math  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum("value").alias("rev"))
    )
    daily = (
        spine.join(purchases, "day", "left")
        .select("day", F.coalesce(F.col("rev"), F.lit(0.0)).alias("y"))
        .withColumn("rn", F.row_number().over(W.orderBy("day")))
    )
    n_days = daily.count()
    origins = spark.range(20, 27).select(F.col("id").alias("o"))
    train = daily.crossJoin(F.broadcast(origins)).filter(F.col("rn") <= F.col("o"))

    def fit_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rn")
        o = int(pdf["o"].iloc[0])
        ys = pdf["y"].to_numpy()
        level = float(ys[0])
        trend = float(ys[1]) - float(ys[0])
        for y in ys[1:]:
            y = float(y)
            new_level = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (level + trend)
            trend = HOLT_BETA * (new_level - level) + (1 - HOLT_BETA) * trend
            level = new_level
        hs = [h for h in range(1, 8) if o + h <= n_days]
        return pd.DataFrame(
            {
                "o": [o] * len(hs),
                "rn": [o + h for h in hs],
                "yhat": [level + h * trend for h in hs],
            }
        )

    fc = train.groupBy("o").applyInPandas(fit_one, "o long, rn int, yhat double")
    joined = fc.join(daily.select("rn", "y"), "rn")
    return joined.groupBy(F.col("o").alias("origin_rn")).agg(
        F.count(F.lit(1)).alias("n_horizons"),
        (F.floor(F.avg(F.abs(F.col("yhat") - F.col("y"))) * 10000 + 0.5) / 10000)
        .alias("mae"),
        (
            F.floor(
                F.avg(
                    F.when(
                        F.col("y") != 0,
                        F.abs(F.col("yhat") - F.col("y")) / F.col("y"),
                    )
                )
                * 1000000
                + 0.5
            )
            / 1000000
        ).alias("mape"),
    )


@query(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                                    ORDER BY ts, event_id)
               AS gap_us
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           ROUND((CAST(SUM(gap_us) AS DOUBLE) / 1000000.0)
                 / COUNT(gap_us), 4) AS mean_gap_s,
           ROUND(quantile_cont(gap_us, 0.5) / 1000000.0, 4) AS p50_gap_s,
           ROUND(quantile_cont(gap_us, 0.95) / 1000000.0, 4) AS p95_gap_s,
           ROUND(CAST(MAX(gap_us) AS DOUBLE) / 1000000.0, 4) AS max_gap_s
    FROM gaps
    GROUP BY event_type
    """,
    category="timeseries",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (mean/median/p95/max
    gap seconds) — the queueing-theory view of a stream that sizes
    consumers and sets staleness alarms (a p95 gap above the alert
    threshold = the stream is bursty, not just slow).

    100 TB shape (the r7-verdict rewrite — this was the suite's last
    fact-scale tiny-key window): the lag goes through
    ``operators/prefixrank.grouped_lagged_value`` — range-partitioned on
    (event_type, ts) with O(num_parts + types) boundary stitching — so a
    <=5-value event_type key no longer caps the sort at 5 tasks, and the
    staging shuffle carries no tiebreak column (the lag value IS the sort
    key, so ties are value-harmless — the operator's documented
    exception). The gap frame (2 narrow columns) is pinned once via
    localCheckpoint; COUNT/SUM/MAX ride the quantile histogram pass as
    per-bucket aggregates (r10 fusion — no dedicated base-stats scan),
    and p50/p95 go through
    ``operators/quantile.bucketed_exact_quantiles`` over INTEGER
    microsecond gaps instead of ``F.percentile`` over continuous
    seconds: per-group value buffers (distinct ~ rows for
    microsecond-resolution doubles) become an O(types x buckets)
    histogram, and each 2^20-us bucket holds <= 2^20 distinct integer
    values BY CONSTRUCTION, bounded regardless of row count. All stats
    are exact: integer-sum mean (one double division at the end, no
    order-dependent float accumulation), and quantiles bit-identical to
    ``F.percentile`` on the same gaps."""
    from db_core_spark.operators.prefixrank import grouped_lagged_value
    from db_core_spark.operators.quantile import bucketed_exact_quantiles

    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # No event_id tiebreak (r10): the lag VALUE is the sort key itself, so
    # rows tying on (event_type, us) all carry the same predecessor value —
    # the gap multiset is deterministic without it (the operator's
    # documented value-equals-sort-key exception) and the range-partition
    # shuffle sheds a long column (guide §2.3: shuffle fewer bytes).
    src = e.select("event_type", us.alias("us"))
    lagged = grouped_lagged_value(
        src,
        ["event_type"],
        [F.col("us")],
        "us",
        out="prev_us",
    )
    # 2-column gap frame, materialized once: the quantile histogram and
    # the fenced re-scan each re-read it without re-running the staging
    # shuffle or the lag window.
    gaps = lagged.select(
        "event_type", (F.col("us") - F.col("prev_us")).alias("gap_us")
    ).localCheckpoint(eager=False)  # pins at the fence collect (full scan)
    # r10 fusion: COUNT/SUM/MAX ride the quantile pass as per-bucket
    # aggregates over the ORIGINAL integer gap_us (exact long arithmetic,
    # order-independent re-combine on the fence window), returned as a
    # literal per-group stats frame — the former dedicated base-stats scan
    # of the gap frame is gone, one O(rows) scan fewer at zero extra jobs.
    # gaps goes in UNFILTERED: each group's first row (NULL gap) lands in
    # a NULL-bucket histogram row, keeping single-event types visible in
    # stats (__n=0, NULL sum/max — exactly the old unfiltered groupBy)
    # while the operator excludes NULL values from the quantiles, same as
    # the old isNotNull pre-filter.
    qdf, stats = bucketed_exact_quantiles(
        gaps,
        "event_type",
        "gap_us",
        [0.5, 0.95],
        width=float(2**20),  # ~1.05 s buckets; <=2^20 distinct us values each
        bucket_aggs={
            "__s": (F.sum("gap_us"), F.sum("__s")),
            "__mx": (F.max("gap_us"), F.max("__mx")),
        },
    )
    # identical arithmetic to the former direct aggregation: sum-of-bucket
    # long sums == the long sum, max-of-bucket maxes == the max, and __n
    # counts only non-null values exactly like count(gap_us).
    base = stats.select(
        "event_type",
        F.col("__n").alias("n_gaps"),
        F.round(
            (F.col("__s").cast("double") / F.lit(1000000.0)) / F.col("__n"),
            4,
        ).alias("mean_gap_s"),
        F.round(F.col("__mx").cast("double") / F.lit(1000000.0), 4).alias(
            "max_gap_s"
        ),
    )
    qp = (
        qdf.groupBy("event_type")
        .pivot("q", [0.5, 0.95])
        .agg(F.first("value"))
        .withColumnsRenamed({"0.5": "p50v", "0.95": "p95v"})
        .withColumnRenamed("event_type", "__qt")
    )
    # eqNullSafe: every upstream stage (grouped_lagged_value,
    # bucketed_exact_quantiles) treats a NULL event_type as one ordinary
    # group — plain equality here would give that group stats but NULL
    # quantiles, diverging from the oracle (ADVICE r8).
    return base.join(
        F.broadcast(qp), F.col("event_type").eqNullSafe(F.col("__qt")), "left"
    ).drop("__qt").select(
        "event_type",
        "n_gaps",
        "mean_gap_s",
        F.round(F.col("p50v") / F.lit(1000000.0), 4).alias("p50_gap_s"),
        F.round(F.col("p95v") / F.lit(1000000.0), 4).alias("p95_gap_s"),
        "max_gap_s",
    )


@query(
    "orders_backlog_curve",
    oracle="""
    WITH marks AS (
      SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
      UNION ALL
      SELECT CAST(o_orderdate AS DATE)
               + (1 + CAST(('0x' || substr(md5('close:' ||
                     CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INT) % 90) AS d,
             -1 AS delta
      FROM orders),
    daily AS (
      SELECT date_trunc('month', d) AS month, SUM(delta) AS net
      FROM marks GROUP BY 1),
    curve AS (
      SELECT month,
             SUM(net) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND CURRENT ROW) AS backlog
      FROM daily)
    SELECT CAST(month AS DATE) AS month, CAST(backlog AS BIGINT) AS open_orders
    FROM curve
    """,
    category="timeseries",
)
def orders_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by interval accounting: every order
    contributes +1 at placement and -1 at its (deterministically
    synthesized, 1-90 day) close date; the monthly net folds through one
    running sum — concurrent-interval counting WITHOUT expanding any
    interval into its days (two marker rows per order, the only shape
    that survives when intervals span months and orders number billions).
    Same +1/-1 prefix-sum kernel as concurrent-sessions/occupancy
    counting."""
    o = table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("close:"), F.col("o_orderkey").cast("string"))),
            1, 4,
        ),
        16, 10,
    ).cast("int")
    opens = o.select(
        F.col("o_orderdate").cast("date").alias("d"), F.lit(1).alias("delta")
    )
    closes = o.select(
        F.date_add(F.col("o_orderdate").cast("date"), 1 + h % 90).alias("d"),
        F.lit(-1).alias("delta"),
    )
    daily = (
        opens.unionAll(closes)
        .groupBy(F.date_trunc("month", "d").alias("month"))
        .agg(F.sum("delta").alias("net"))
    )
    w = W.orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        F.col("month").cast("date").alias("month"),
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


@query(
    "window_peak_valley",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem GROUP BY 1),
    marked AS (
      SELECT d, rev,
             LAG(rev) OVER (ORDER BY d) AS prev,
             LEAD(rev) OVER (ORDER BY d) AS nxt,
             AVG(rev) OVER () AS mu,
             stddev_pop(rev) OVER () AS sd
      FROM daily)
    SELECT d, floor(rev * 100 + 0.5) / 100 AS rev,
           CAST(CASE WHEN rev > prev AND rev > nxt THEN 'peak'
                     ELSE 'valley' END AS VARCHAR) AS kind,
           ROUND((rev - mu) / sd, 4) AS z
    FROM marked
    WHERE prev IS NOT NULL AND nxt IS NOT NULL
      AND ((rev > prev AND rev > nxt) OR (rev < prev AND rev < nxt))
      AND ABS(rev - mu) > 1.5 * sd
    """,
    category="timeseries",
)
def window_peak_valley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prominent local extrema of the daily-revenue series: strict local
    peaks/valleys (greater/less than BOTH neighbors) that also clear a
    1.5-sigma prominence bar — the turning-point detector feeding
    annotation layers and alert digests (plain extrema fire on noise;
    the z-filter keeps the ones a human would circle).

    100 TB shape: facts collapse to the daily frame first; lag/lead and
    the global moments are windows over that tiny series."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    wo = W.orderBy("d")
    wall = W.partitionBy()
    m = daily.select(
        "d", "rev",
        F.lag("rev").over(wo).alias("prev"),
        F.lead("rev").over(wo).alias("nxt"),
        F.avg("rev").over(wall).alias("mu"),
        F.stddev_pop("rev").over(wall).alias("sd"),
    )
    is_peak = (F.col("rev") > F.col("prev")) & (F.col("rev") > F.col("nxt"))
    is_valley = (F.col("rev") < F.col("prev")) & (F.col("rev") < F.col("nxt"))
    return (
        m.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (is_peak | is_valley)
            & (F.abs(F.col("rev") - F.col("mu")) > 1.5 * F.col("sd"))
        )
        .select(
            "d",
            (F.floor(F.col("rev") * 100 + 0.5) / 100).alias("rev"),
            F.when(is_peak, "peak").otherwise("valley").alias("kind"),
            F.round((F.col("rev") - F.col("mu")) / F.col("sd"), 4).alias("z"),
        )
    )


@query(
    "dq_missing_days",
    oracle="""
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
                      CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
    spine AS (
      SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM b),
    have AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT s.d AS missing_day,
           CAST(dayofweek(s.d) + 1 AS INT) AS dow
    FROM spine s LEFT JOIN have h ON h.d = s.d
    WHERE h.d IS NULL
    """,
    category="timeseries",
)
def dq_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness monitor: calendar days inside the table's own
    span with ZERO rows — the silent-pipeline-failure detector (a feed
    that skips a day never announces it; the calendar anti-join does).
    Returns each hole with its weekday, since weekend-shaped holes are
    usually legitimate and alert routing wants the distinction.

    100 TB shape: the observed-day set is one distinct aggregate
    (|days| rows); the calendar spine derives from a broadcast 1-row
    bounds aggregate; the anti-join is spine-sized."""
    o = table(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    have = o.select(F.col("o_orderdate").cast("date").alias("d")).distinct()
    return (
        spine.join(have, "d", "left_anti")
        .select(
            F.col("d").alias("missing_day"),
            F.dayofweek("d").cast("int").alias("dow"),
        )
    )


@query(
    "events_heatmap_hour_dow",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    category="timeseries",
)
def events_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activity heatmap: event volume and mean value by (day-of-week,
    hour-of-day) — the load-shape fingerprint behind capacity planning,
    send-time optimization, and anomaly baselines (compare any hour to
    its own weekday-hour cell, not the global mean). One map-side-
    combined aggregate over row-local calendar extractions; at most
    7 x 24 output rows at any scale."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "window_momentum_rsi",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY 1),
    chg AS (
      SELECT d, rev,
             rev - LAG(rev) OVER (ORDER BY d) AS delta
      FROM daily),
    gl AS (
      SELECT d, rev,
             CASE WHEN delta > 0 THEN delta ELSE 0 END AS gain,
             CASE WHEN delta < 0 THEN -delta ELSE 0 END AS loss,
             COUNT(delta) OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING
                                                    AND CURRENT ROW) AS nw
      FROM chg WHERE delta IS NOT NULL),
    sm AS (
      SELECT d, rev, nw,
             AVG(gain) OVER w AS avg_gain,
             AVG(loss) OVER w AS avg_loss
      FROM gl
      WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT d, floor(rev * 100 + 0.5) / 100 AS rev,
           ROUND(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), 4) AS rsi14
    FROM sm
    WHERE nw = 14 AND avg_loss > 0
    """,
    category="timeseries",
)
def window_momentum_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (simple-average Cutler variant) of daily revenue: mean
    gain vs mean loss over a trailing 14-change window folded into
    100 - 100/(1+RS) — the overbought/oversold oscillator, applied to a
    business KPI exactly as chartists apply it to prices (RSI > 70 =
    unusually persistent growth run). Only full windows emit; the
    simple-average form keeps it window-expressible on both engines
    (Wilder's recursive smoothing is forecast_holt_linear territory).
    All windows run over the collapsed daily series."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    wo = W.orderBy("d")
    chg = daily.withColumn("delta", F.col("rev") - F.lag("rev").over(wo)).filter(
        F.col("delta").isNotNull()
    )
    ww = W.orderBy("d").rowsBetween(-13, W.currentRow)
    sm = chg.select(
        "d", "rev",
        F.count("delta").over(ww).alias("nw"),
        F.avg(F.when(F.col("delta") > 0, F.col("delta")).otherwise(0.0))
        .over(ww)
        .alias("avg_gain"),
        F.avg(F.when(F.col("delta") < 0, -F.col("delta")).otherwise(0.0))
        .over(ww)
        .alias("avg_loss"),
    )
    return sm.filter((F.col("nw") == 14) & (F.col("avg_loss") > 0)).select(
        "d",
        (F.floor(F.col("rev") * 100 + 0.5) / 100).alias("rev"),
        F.round(
            100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss")), 4
        ).alias("rsi14"),
    )


@query(
    "window_leader_changes",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    leaders AS (
      SELECT d, event_type, n
      FROM (SELECT d, event_type, n,
                   row_number() OVER (PARTITION BY d
                                      ORDER BY n DESC, event_type) AS rk
            FROM daily)
      WHERE rk = 1),
    marked AS (
      SELECT d, event_type AS leader, n,
             LAG(event_type) OVER (ORDER BY d) AS prev_leader
      FROM leaders)
    SELECT d, leader, prev_leader, n
    FROM marked
    WHERE prev_leader IS NOT NULL AND leader <> prev_leader
    """,
    category="timeseries",
)
def window_leader_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leader-change detection: days where the highest-volume event type
    DIFFERS from the previous day's — rank alone shows who leads,
    this shows WHEN the regime flips (mix-shift alerts key on exactly
    these rows). Per-day rank over the collapsed daily frame, then one
    lag over the 1-row-per-day leader series."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = W.partitionBy("d").orderBy(F.col("n").desc(), "event_type")
    leaders = (
        daily.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("d", F.col("event_type").alias("leader"), "n")
    )
    wl = W.orderBy("d")
    return (
        leaders.withColumn("prev_leader", F.lag("leader").over(wl))
        .filter(
            F.col("prev_leader").isNotNull()
            & (F.col("leader") != F.col("prev_leader"))
        )
        .select("d", "leader", "prev_leader", "n")
    )


@query(
    "window_same_weekday_growth",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY 1),
    g AS (
      SELECT d, rev,
             LAG(rev, 7) OVER (ORDER BY d) AS rev_prev_week,
             LAG(d, 7) OVER (ORDER BY d) AS d_prev
      FROM daily)
    SELECT d, floor(rev * 100 + 0.5) / 100 AS rev,
           ROUND((rev - rev_prev_week) * 100.0 / rev_prev_week, 4)
             AS wow_growth_pct
    FROM g
    WHERE rev_prev_week IS NOT NULL AND d_prev = d - 7
    """,
    category="timeseries",
)
def window_same_weekday_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth against the SAME WEEKDAY (lag 7 on the dense
    daily series): the calendar-adjusted growth retail reads instead of
    day-over-day, which mostly measures the weekly cycle itself. The
    d_prev guard proves the lag really landed 7 calendar days back (a
    gap in the series would silently compare wrong days otherwise)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    w = W.orderBy("d")
    g = daily.select(
        "d", "rev",
        F.lag("rev", 7).over(w).alias("rev_prev_week"),
        F.lag("d", 7).over(w).alias("d_prev"),
    )
    return g.filter(
        F.col("rev_prev_week").isNotNull()
        & (F.col("d_prev") == F.date_sub("d", 7))
    ).select(
        "d",
        (F.floor(F.col("rev") * 100 + 0.5) / 100).alias("rev"),
        F.round(
            (F.col("rev") - F.col("rev_prev_week")) * 100.0
            / F.col("rev_prev_week"),
            4,
        ).alias("wow_growth_pct"),
    )


@query(
    "dau_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d
      FROM events GROUP BY 1),
    daily AS (
      SELECT CAST(e.ts AS DATE) AS d, e.user_id,
             MIN(CASE WHEN CAST(e.ts AS DATE) = f.first_d
                      THEN 1 ELSE 0 END) AS is_new
      FROM events e JOIN firsts f ON f.user_id = e.user_id
      GROUP BY 1, 2)
    SELECT d,
           CAST(SUM(is_new) AS BIGINT) AS new_users,
           CAST(SUM(1 - is_new) AS BIGINT) AS returning_users,
           ROUND(SUM(1 - is_new) * 100.0 / COUNT(*), 4) AS returning_pct
    FROM daily
    GROUP BY d
    """,
    category="timeseries",
)
def dau_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: daily actives split into NEW (first-ever day)
    vs RETURNING users — the decomposition that tells acquisition apart
    from retention in the same DAU line (a flat DAU of all-new users is
    a leaky bucket). First-seen days come from one per-user aggregate
    joined back on the user key; the daily split is a per-(day, user)
    dedup then a day rollup."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    # ONE event-scale exchange (r7, the cohort_retention pattern): the
    # per-user aggregate carries the calendar-bounded set of active days;
    # a day is "new" iff it IS the set's minimum, so the first-day join
    # and the (day, user) dedup exchange both disappear
    per_user = e.groupBy("user_id").agg(F.collect_set("d").alias("days"))
    daily = per_user.select(
        "days", F.explode("days").alias("d")
    ).select(
        "d", (F.col("d") == F.array_min("days")).cast("int").alias("is_new")
    )
    return daily.groupBy("d").agg(
        F.sum("is_new").cast("long").alias("new_users"),
        F.sum(1 - F.col("is_new")).cast("long").alias("returning_users"),
        F.round(
            F.sum(1 - F.col("is_new")) * 100.0 / F.count(F.lit(1)), 4
        ).alias("returning_pct"),
    )
