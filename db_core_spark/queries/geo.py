"""Geospatial operators: grid-cell binning and blocked haversine KNN.

Goal-derived (SURVEY.md §2C — the reference has no relational operators at
all, let alone spatial ones): location analytics is a standard ask of an
analytics engine, and at 100 TB the viable shapes are exactly the two here —
cell-grid aggregation (one hash aggregate keyed on a computed cell id) and
top-k-nearest against a SMALL broadcast query set with rank-limit pruning.
Fixture tables carry no coordinates, so deterministic lat/lon are seeded
from row keys with the same engine-portable md5 trick as
sample_hash_deterministic (queries/sampling.py) — both engines derive
bit-identical doubles, so even the trig-heavy haversine ranking agrees
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table

# Synthetic but deterministic coordinates: a 1° x 1° box (~111 km square).
# lat in [40, 41), lon in [-74.5, -73.5); 16-bit md5 prefix => ~1.7 m grid.
_LAT0, _LON0 = 40.0, -74.5

_H16_SQL = "CAST(('0x' || substr(md5({s}), 1, 4)) AS INT)"
_LAT_KEY = "'lat:' || CAST({k} AS VARCHAR)"
_LON_KEY = "'lon:' || CAST({k} AS VARCHAR)"
_LAT_SQL = f"({_LAT0} + {_H16_SQL.format(s=_LAT_KEY)} / 65536.0)"
_LON_SQL = f"({_LON0} + {_H16_SQL.format(s=_LON_KEY)} / 65536.0)"


def _h16(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int")


def _lat(key: F.Column) -> F.Column:
    return F.lit(_LAT0) + _h16(F.concat(F.lit("lat:"), key.cast("string"))) / F.lit(65536.0)


def _lon(key: F.Column) -> F.Column:
    return F.lit(_LON0) + _h16(F.concat(F.lit("lon:"), key.cast("string"))) / F.lit(65536.0)


@query(
    "geo_cell_density",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, c_acctbal,
             {_LAT_SQL.format(k='c_custkey')} AS lat,
             {_LON_SQL.format(k='c_custkey')} AS lon
      FROM customer)
    SELECT CAST(floor(lat / 0.05) AS BIGINT) AS cell_x,
           CAST(floor(lon / 0.05) AS BIGINT) AS cell_y,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 4) AS avg_acctbal
    FROM pts
    GROUP BY 1, 2
    """,
    category="geo",
)
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid: customers binned into 0.05° (~5.5 km) cells
    with per-cell counts and balance means. The cell id is a row-local
    computed key, so this is ONE map-side-combined hash aggregate over the
    points table — the canonical heatmap/tiling shape that holds at any
    scale (shuffle volume = number of occupied cells, not points). The
    same computed-cell-key technique is the blocking stage of every
    distributed spatial join."""
    c = table(spark, sf_dir, "customer")
    lat, lon = _lat(F.col("c_custkey")), _lon(F.col("c_custkey"))
    return (
        c.select(
            F.floor(lat / 0.05).alias("cell_x"),
            F.floor(lon / 0.05).alias("cell_y"),
            "c_acctbal",
        )
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@query(
    "geo_haversine_knn",
    oracle=f"""
    WITH q AS (
      SELECT s_suppkey,
             {_LAT_SQL.format(k='s_suppkey')} AS qlat,
             {_LON_SQL.format(k='s_suppkey')} AS qlon
      FROM supplier WHERE s_suppkey <= 10),
    c AS (
      SELECT c_custkey,
             {_LAT_SQL.format(k='c_custkey')} AS clat,
             {_LON_SQL.format(k='c_custkey')} AS clon
      FROM customer),
    d AS (
      SELECT s_suppkey, c_custkey,
             12742.0 * asin(sqrt(
               sin(radians(clat - qlat) / 2) * sin(radians(clat - qlat) / 2)
               + cos(radians(qlat)) * cos(radians(clat))
                 * sin(radians(clon - qlon) / 2) * sin(radians(clon - qlon) / 2)
             )) AS dist
      FROM c CROSS JOIN q),
    r AS (
      SELECT s_suppkey, c_custkey, dist,
             row_number() OVER (PARTITION BY s_suppkey
                                ORDER BY dist, c_custkey) AS rk
      FROM d)
    SELECT s_suppkey, c_custkey, ROUND(dist, 4) AS dist_km,
           CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 5
    """,
    category="geo",
)
def geo_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-nearest customers to each of 10 supplier locations by
    haversine distance (2R·asin(√h), R=6371 km).

    100 TB shape: the query side is tiny and BROADCAST, so the points
    table is scanned once with a row-local distance expression (pure
    codegen trig — no UDF) and never reshuffled; the rank<=5 filter over
    the per-query window triggers Spark's WindowGroupLimit, which prunes
    each partition to its local top-5 BEFORE the exchange, capping
    shuffle volume at partitions x queries x 5 rows regardless of table
    size. For a LARGE query side this op composes with cell blocking
    (geo_cell_density's computed cell key as the equi-join key) instead
    of broadcast — same distance kernel, candidate pairs bounded by
    neighborhood cells."""
    q = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 10)
        .select(
            "s_suppkey",
            _lat(F.col("s_suppkey")).alias("qlat"),
            _lon(F.col("s_suppkey")).alias("qlon"),
        )
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("clat"),
        _lon(F.col("c_custkey")).alias("clon"),
    )
    sa = F.sin(F.radians(F.col("clat") - F.col("qlat")) / 2)
    sb = F.sin(F.radians(F.col("clon") - F.col("qlon")) / 2)
    h = sa * sa + F.cos(F.radians("qlat")) * F.cos(F.radians("clat")) * sb * sb
    dist = F.lit(12742.0) * F.asin(F.sqrt(h))
    rk = F.row_number().over(
        W.partitionBy("s_suppkey").orderBy("dist", "c_custkey")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("dist", dist)
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 5)
        .select(
            "s_suppkey",
            "c_custkey",
            F.round("dist", 4).alias("dist_km"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@query(
    "geo_cell_join_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             {_LAT_SQL.format(k='c_custkey')} AS lat,
             {_LON_SQL.format(k='c_custkey')} AS lon
      FROM customer),
    d AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             12742.0 * asin(sqrt(
               sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
             )) AS dist
      FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey)
    SELECT id_a, id_b, ROUND(dist, 4) AS dist_km
    FROM d WHERE dist <= 2.0
    """,
    category="geo",
)
def geo_cell_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 2 km — computed with NEIGHBOR-CELL
    BLOCKING while the oracle is the naive O(n²) self-join, so the gate
    PROVES the blocked plan computes exactly the brute-force semantics.

    Exactness argument: cells are 0.05° (>= ~4.2 km on the shortest axis
    at this latitude), so any pair within 2 km lies in the same or an
    adjacent cell. Each unordered pair is OWNED by the lexicographically
    smaller of its two home cells: the probe side stays in its home cell
    and the candidate side is replicated only into the 5 neighbor cells
    that are lex-greater-or-equal — offsets (0,0),(0,1),(1,-1),(1,0),
    (1,1) — so a cross-cell pair is enumerated exactly once (from its
    owner cell) and a same-cell pair twice, deduped by id order. This
    halves the classic 3x3 scheme's replication (5x vs 9x).

    100 TB shape: this is the distributed spatial-join pattern — bounded
    replication of one side into neighbor cells, then a hash EQUI-join on
    the cell key (never a cross join), distance verified row-locally
    after the join. Candidate volume is sum over cells of n_i * m_5,i —
    linear for bounded density — vs the quadratic brute force the oracle
    runs. Same blocking composes for polygon containment and trajectory
    joins."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    return blocked_radius_pairs(c, radius_km=2.0, cell_deg=0.05).select(
        F.col("id_a"), F.col("id_b"), F.round("dist", 4).alias("dist_km")
    )


def blocked_radius_pairs(
    points: DataFrame, radius_km: float, cell_deg: float
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (haversine), via
    owner-cell blocking. ``points`` needs columns (id, lat, lon);
    ``cell_deg`` must be large enough that every qualifying pair spans at
    most one cell boundary per axis (cell height 111.19*cell_deg km and
    width 111.19*cell_deg*cos(lat) km must both be >= radius_km).
    Returns (id_a, id_b, dist) with id_a < id_b, each pair exactly once.

    ``id`` must be UNIQUE: the same-cell dedupe keeps one of (p,q)/(q,p)
    via id ordering, so a duplicated id silently drops that pair. Unlike
    blocked_cosine_pairs (where the deterministic id hash co-locates
    duplicates in one diagonal tile, making the check free), duplicates
    here can sit in different cells, so enforcement would cost a
    count-distinct pre-pass — contract documented instead."""
    home = points.select(
        "id", "lat", "lon",
        F.floor(F.col("lat") / cell_deg).alias("cx"),
        F.floor(F.col("lon") / cell_deg).alias("cy"),
    )
    # Candidate side replicated only into the lex-greater-or-equal half
    # of its 3x3 neighborhood: the pair is reported from the lex-smaller
    # home cell, so 5 offsets cover every adjacent-cell pair exactly once.
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    ])
    neigh = (
        home.select("id", "lat", "lon", "cx", "cy",
                    F.explode(offsets).alias("o"))
        .select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("blat"),
            F.col("lon").alias("blon"),
            ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).alias("same_cell"),
            (F.col("cx") - F.col("o.dx")).alias("cx"),
            (F.col("cy") - F.col("o.dy")).alias("cy"),
        )
    )
    a = home.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
        "cx", "cy",
    )
    sa = F.sin(F.radians(F.col("blat") - F.col("alat")) / 2)
    sb = F.sin(F.radians(F.col("blon") - F.col("alon")) / 2)
    h = sa * sa + F.cos(F.radians("alat")) * F.cos(F.radians("blat")) * sb * sb
    dist = F.lit(12742.0) * F.asin(F.sqrt(h))
    return (
        a.join(neigh, ["cx", "cy"])
        # same-cell candidates appear as both (p,q) and (q,p): keep one by
        # id order; cross-cell candidates are enumerated exactly once by
        # the owner-cell construction, so only self-pairs need excluding.
        .filter(
            F.when(F.col("same_cell"), F.col("id_a") < F.col("id_b")).otherwise(
                F.col("id_a") != F.col("id_b")
            )
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(radius_km))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "dist",
        )
    )


@query(
    "geo_trajectory_length",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, ts, event_id,
             {_LAT_SQL.format(k='event_id')} AS lat,
             {_LON_SQL.format(k='event_id')} AS lon
      FROM events),
    hops AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plat,
             lag(lon) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS plon
      FROM pts),
    d AS (
      SELECT user_id,
             12742.0 * asin(sqrt(
               sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
               + cos(radians(plat)) * cos(radians(lat))
                 * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
             )) AS hop_km
      FROM hops WHERE plat IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_hops,
           ROUND(SUM(hop_km), 4) AS total_km,
           ROUND(MAX(hop_km), 4) AS max_hop_km
    FROM d
    GROUP BY user_id
    """,
    category="geo",
)
def geo_trajectory_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory statistics: total and maximum hop distance over
    the user's time-ordered event locations (telemetry's route-length /
    teleport-detection kernel; a max_hop threshold is the classic GPS
    glitch filter).

    100 TB shape: ONE window exchange keyed on user_id (bounded, balanced
    partitions) computes the lag pair; the haversine hop is row-local
    codegen trig and the per-user reduction is a map-side-combined hash
    aggregate over rows already co-partitioned by the window — AQE
    coalesces the second exchange away. Event coordinates are seeded
    deterministically from event_id (same portable md5 kernel as the rest
    of this module)."""
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    pts = e.select(
        "user_id", "ts", "event_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    sa = F.sin(F.radians(F.col("lat") - F.col("plat")) / 2)
    sb = F.sin(F.radians(F.col("lon") - F.col("plon")) / 2)
    h = sa * sa + F.cos(F.radians("plat")) * F.cos(F.radians("lat")) * sb * sb
    hop = F.lit(12742.0) * F.asin(F.sqrt(h))
    return (
        hops.withColumn("hop_km", hop)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hops"),
            F.round(F.sum("hop_km"), 4).alias("total_km"),
            F.round(F.max("hop_km"), 4).alias("max_hop_km"),
        )
    )
