"""UDF surface (SURVEY.md §2B row 'UDF surface'): scalar Pandas UDF,
grouped-map applyInPandas, and a UDAF-style one-row-per-group applyInPandas —
each oracle-checked against a pure-SQL equivalent so the Arrow boundary is
proven semantics-preserving, not just runnable.

UDFs are the slow path by design: these exist to prove the surface works;
every other query in the engine stays JVM-side."""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


@query(
    "pandas_udf_scalar_normalize",
    oracle="""
    SELECT doc_id,
           TRIM(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS norm_text,
           CAST(LENGTH(TRIM(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g'))) AS BIGINT)
             AS norm_len
    FROM documents WHERE doc_id <= 200
    """,
    category="udf",
)
def pandas_udf_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow-vectorized) text normalization; the oracle
    repeats it with SQL regexp functions — identical semantics across the
    Python/SQL boundary for this regex class."""

    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"[^a-z0-9 ]", "", regex=True).str.strip()

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200)
    return d.select(
        "doc_id",
        normalize("text").alias("norm_text"),
        F.length(normalize("text")).cast("long").alias("norm_len"),
    )


@query(
    "applyinpandas_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS mu,
             STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_custkey) AS sd
      FROM orders)
    SELECT o_custkey, o_orderkey,
           CASE WHEN sd IS NULL OR sd = 0 THEN NULL
                ELSE FLOOR((o_totalprice - mu) / sd * 10000 + 0.5) / 10000
           END AS zscore
    FROM stats
    """,
    category="udf",
)
def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer z-score of order totals.
    One shuffle on the group key; each group is a pandas DataFrame in an
    executor Python worker. The oracle repeats it with window functions
    (pandas .std(ddof=1) == STDDEV_SAMP).

    The group exchange is an explicit size-aware repartition (see
    applyinpandas_udaf_gini below — AQE's byte-based coalescing squeezed
    the 15k per-group Python calls onto 2 partitions; 20.1 s -> ~2 s at
    sf0.1), and the floor quantization is vectorized numpy instead of a
    per-element .apply(math.floor) round-trip (guide §4: the Python that
    does run must be vectorized)."""
    import math  # noqa: PLC0415

    import numpy as np

    from db_core_spark.operators.prefixrank import resolve_num_parts

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["o_totalprice"].std(ddof=1)
        mu = pdf["o_totalprice"].mean()
        if sd is None or (isinstance(sd, float) and (math.isnan(sd) or sd == 0.0)):
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = np.floor((pdf["o_totalprice"] - mu) / sd * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {"o_custkey": pdf["o_custkey"], "o_orderkey": pdf["o_orderkey"], "zscore": z}
        )

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    o = o.repartition(resolve_num_parts(o, None), "o_custkey")
    return o.groupBy("o_custkey").applyInPandas(
        zscore, schema="o_custkey long, o_orderkey long, zscore double"
    )


@query(
    "applyinpandas_udaf_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS i,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n,
             SUM(o_totalprice) OVER (PARTITION BY o_custkey) AS total
      FROM orders)
    SELECT o_custkey,
           FLOOR((2.0 * SUM(i * o_totalprice) / (n * total) - (n + 1.0) / n)
                 * 1000000 + 0.5) / 1000000 AS gini,
           CAST(n AS BIGINT) AS n_orders
    FROM ranked
    GROUP BY o_custkey, n, total
    HAVING n >= 2
    """,
    category="udf",
)
def applyinpandas_udaf_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF-via-applyInPandas: one output row per group (Gini coefficient of
    each customer's order values — a spend-concentration metric with no
    built-in aggregate). The oracle derives the same estimator with window
    functions.

    The group exchange is an EXPLICIT size-aware repartition on the group
    key (resolve_num_parts — cores floor, 512 MB partitions at scale; the
    grouped Python stage reuses it, so no second exchange): AQE's
    byte-based coalescing is blind to per-group PYTHON-call cost and
    squeezed the 15k customer groups onto 2 post-coalesce partitions —
    2 cores eating 15k interpreter round-trips (measured 14.6 s in the
    Python stage at sf0.1; ~1 s spread over the cluster). The same guard
    every Arrow pass here carries, driven by the shared resolver instead
    of a constant."""
    import math  # once per executor import of this module, not per group

    import numpy as np

    from db_core_spark.operators.prefixrank import resolve_num_parts

    def gini(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(pdf["o_totalprice"].to_numpy())
        n = len(x)
        if n < 2:
            return pd.DataFrame(columns=["o_custkey", "gini", "n_orders"]).astype(
                {"o_custkey": "int64", "gini": "float64", "n_orders": "int64"}
            )
        i = np.arange(1, n + 1)
        g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        g = math.floor(g * 1000000 + 0.5) / 1000000
        return pd.DataFrame(
            {"o_custkey": [pdf["o_custkey"].iat[0]], "gini": [g], "n_orders": [n]}
        )

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    o = o.repartition(resolve_num_parts(o, None), "o_custkey")
    return o.groupBy("o_custkey").applyInPandas(
        gini, schema="o_custkey long, gini double, n_orders long"
    )


@query(
    "pandas_udf_iter_minmax_scale",
    oracle="""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT e.event_id,
           ROUND((e.value - b.lo) / (b.hi - b.lo), 6) AS value_scaled
    FROM events e CROSS JOIN b
    WHERE e.event_id < 500
    """,
    category="udf",
)
def pandas_udf_iter_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF (the iterator form: one generator per
    partition, Arrow batches streamed through it) min-max scaling event
    values against broadcast global bounds — the UDF shape for per-
    partition one-time setup (model load, dictionary mmap) amortized
    across every batch, which the plain scalar form re-pays per batch.
    The bounds ride in as regular columns (broadcast 1-row aggregate);
    the UDF itself is pure arithmetic, so the oracle can pin it
    exactly."""
    @F.pandas_udf("double")
    def scale(
        it: Iterator[Tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # per-partition setup would run HERE, once, before the batch loop
        for value, lo, hi in it:
            yield (value - lo) / (hi - lo)

    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    b = table(spark, sf_dir, "events").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    return (
        e.crossJoin(F.broadcast(b))
        .select(
            "event_id",
            F.round(scale("value", "lo", "hi"), 6).alias("value_scaled"),
        )
    )
