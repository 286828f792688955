"""Privacy / compliance operators: k-anonymity profiling and deterministic
differentially-private release.

Goal-derived (SURVEY.md §2C): a training-data platform ships privacy
tooling next to dedup and PII redaction (queries/llm.py text_redact_pii is
the scrubbing side; these are the MEASUREMENT and RELEASE sides). Both are
single hash-aggregate shapes that hold at 100 TB, and the DP noise is
derived from md5 like sample_hash_deterministic, so the "randomized"
release is engine-portable and bit-reproducible — the property an audited
release pipeline actually needs (seeded noise, not ambient RNG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "privacy_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT c.c_mktsegment AS segment, n.n_name AS nation,
             CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS grp_n
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT CAST(CASE WHEN grp_n >= 5 THEN 'k>=5'
                     WHEN grp_n >= 2 THEN '2<=k<5'
                     ELSE 'k=1' END AS VARCHAR) AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_n) AS BIGINT) AS n_rows,
           ROUND(SUM(grp_n) * 100.0 /
                 (SELECT COUNT(*) FROM customer), 4) AS pct_rows
    FROM qi
    GROUP BY 1
    """,
    category="aggregate",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (market segment,
    nation, account-balance bucket): how many equivalence classes — and
    what share of ROWS — sit below re-identification thresholds (k=1
    unique, k<5 risky). This is the report a release gate reads before
    publishing any per-customer slice.

    100 TB shape: one hash aggregate on the QI tuple (map-side combined),
    then a trivial re-aggregation of the tiny class histogram; the
    denominator is a broadcast scalar subquery. Nation is a broadcast
    dim join (25 rows)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    total = c.count()  # driver-side scalar: one count over the dimension-free scan
    qi = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("grp_n"))
    )
    band = (
        F.when(F.col("grp_n") >= 5, "k>=5")
        .when(F.col("grp_n") >= 2, "2<=k<5")
        .otherwise("k=1")
    )
    return (
        qi.groupBy(band.alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("grp_n").cast("long").alias("n_rows"),
        )
        .withColumn(
            "pct_rows", F.round(F.col("n_rows") * 100.0 / F.lit(total), 4)
        )
    )


@query(
    "privacy_dp_counts",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM events GROUP BY 1),
    u AS (
      SELECT event_type, true_n,
             (CAST(('0x' || substr(md5('dp:' || event_type), 1, 4)) AS INT)
              + 0.5) / 65536.0 AS uu
      FROM g)
    SELECT event_type, true_n,
           ROUND(true_n + (CASE WHEN uu < 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(uu - 0.5)), 4) AS dp_n
    FROM u
    """,
    category="aggregate",
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (epsilon=1 Laplace mechanism,
    sensitivity 1, scale b=1): per-event-type counts plus the noised
    release. Noise is DETERMINISTIC — the Laplace draw inverts the CDF at
    a uniform derived from md5 of the group key — so the release is
    bit-reproducible on any engine and any partitioning, which is what
    lets an audit re-derive exactly what was published. (A production
    deployment would key the hash with a private salt; the mechanism and
    plan shape are identical.)

    100 TB shape: the noise is O(groups) post-aggregation arithmetic on
    top of one map-side-combined count — DP release costs nothing over
    the raw aggregate."""
    e = table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("true_n"))
    uu = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 4),
            16,
            10,
        ).cast("int")
        + F.lit(0.5)
    ) / F.lit(65536.0)
    noise = (
        F.when(uu < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    ) * F.log(F.lit(1.0) - 2.0 * F.abs(uu - F.lit(0.5)))
    return g.select(
        "event_type",
        "true_n",
        F.round(F.col("true_n") + noise, 4).alias("dp_n"),
    )
