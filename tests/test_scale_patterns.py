"""Scale-pattern tests: salted joins (skew), bucketed co-located joins
(shuffle elimination) — correctness here, plan-shape assertions where the
pattern's whole point is the plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from db_core_spark.operators.skew import salted_join
from db_core_spark.tables import table
from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark):
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").groupBy("l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", salt_buckets=4).groupBy("l_orderkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    c = table(spark, SF_SMALL, "customer").select(F.col("c_custkey").alias("k"), "c_name")
    o = table(spark, SF_SMALL, "orders").select(F.col("o_custkey").alias("k"), "o_orderkey")
    plain = c.join(o, "k", "left")
    salted = salted_join(c, o, "k", salt_buckets=4, how="left")
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("o_orderkey").isNull()).count()
        == salted.filter(F.col("o_orderkey").isNull()).count()
    )


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Co-located bucketed tables join without an Exchange — the physical
    layout that makes repeated 100 TB joins on the same key affordable."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
        o = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
            "li_bkt"
        )
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
            "o_bkt"
        )
        j = spark.table("li_bkt").join(
            spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = plan_of(j)
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        # and it's still correct
        n = j.count()
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert n == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_hll_sketch_merge_identity_and_accuracy(spark):
    """union of per-group HLL sketches must estimate the same cardinality
    as one whole-table sketch, and both within 5% of exact."""
    from pyspark.sql import functions as F

    from db_core_spark.tables import table
    from tests.conftest import SF_MED

    o = table(spark, SF_MED, "orders")
    exact = o.select("o_custkey").distinct().count()
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).collect()[0].e
    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]
        .e
    )
    # union-of-parts and one-pass sketches agree to sketch precision (they
    # are not bit-identical: sparse->dense promotion differs by build order)
    assert abs(whole - merged) / exact < 0.01
    assert abs(whole - exact) / exact < 0.05
    assert abs(merged - exact) / exact < 0.05


def test_bucket_hash_jvm_python_equivalence(spark):
    """bucket_expr (JVM crc32 of the canonical string) and bucket_of_py
    (zlib.crc32) MUST agree for every supported key type — the invariant
    the whole bucketed layout rests on. Checked elementwise over ints
    (incl. negatives/extremes), strings (unicode, NUL-adjacent), NULLs,
    booleans, dates and timestamps, in one Spark job."""
    import datetime as dt

    from pyspark.sql import types as T

    from db_core_spark.plans.versioned import bucket_expr, bucket_of_py

    rows = [
        (0, "a", True, dt.datetime(2020, 1, 1, 0, 0, 0)),
        (-1, "", False, dt.datetime(2020, 1, 1, 12, 34, 56, 789000)),
        (2**62, "héllo wörld", True, dt.datetime(1999, 12, 31, 23, 59, 59)),
        (-(2**62), "x" * 500, False, dt.datetime(2024, 2, 29, 6, 7, 8, 123456)),
        (42, None, None, None),
        (7, "None", True, dt.datetime(1970, 1, 1)),
        (8, "tab\tand\nnewline", False, dt.datetime(2030, 6, 15, 1, 2, 3)),
    ] + [(i * 7919, f"key_{i}", i % 2 == 0, dt.datetime(2021, 1, 1) + dt.timedelta(hours=i)) for i in range(200)]
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.BooleanType()),
            T.StructField("d", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    B = 64
    got = df.select(
        "a", "b", "c", "d", bucket_expr(["a", "b", "c", "d"], B).alias("jvm")
    ).collect()
    for r in got:
        py = bucket_of_py([r.a, r.b, r.c, r.d], B)
        assert py == r.jvm, (r.a, r.b, r.c, r.d, py, r.jvm)


def test_pareto_distributed_rank_matches_global_window(spark):
    """pareto_revenue_concentration's two-pass distributed rank must emit
    exactly the rows a naive global-window formulation produces."""
    from db_core_spark.registry import all_queries
    from db_core_spark.tables import table
    from pyspark.sql import Window as W, functions as F

    got = {
        r.ventile: (r.n_customers, r.revenue, r.cum_share)
        for r in all_queries()["pareto_revenue_concentration"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    o = table(spark, SF_SMALL, "orders")
    li = table(spark, SF_SMALL, "lineitem")
    cr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    n = cr.count()
    wg = W.orderBy(F.col("revenue").desc(), F.col("custkey"))
    v = (
        cr.withColumn("rk", F.row_number().over(wg))
        .withColumn("ventile", (((F.col("rk") - 1) * 20) / F.lit(n)).cast("int"))
        .groupBy("ventile")
        .agg(F.sum("revenue").alias("rev"), F.count(F.lit(1)).alias("n_customers"))
    )
    tot = v.agg(F.sum("rev").alias("total")).collect()[0].total
    wv = W.orderBy("ventile").rowsBetween(W.unboundedPreceding, W.currentRow)
    expect = {
        r.ventile: (r.n_customers, r.revenue, r.cum_share)
        for r in v.select(
            "ventile",
            "n_customers",
            F.round(F.col("rev"), 2).alias("revenue"),
            F.round(F.sum("rev").over(wv) / F.lit(tot), 6).alias("cum_share"),
        ).collect()
    }
    assert got == expect


def test_aqe_skew_join_splits_hot_partition(spark):
    """The non-salting answer to key skew: AQE's runtime skew-join split.
    Build a join where one key carries ~90% of the left side, force skewed
    sort-merge execution with thresholds scaled to the tiny fixture, and
    assert (a) the result is exactly the plain join and (b) the FINAL
    adaptive plan actually marked the sort-merge join as skew-handled —
    proving the knob the 100 TB deployment relies on does engage, not just
    that it is configured."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.shuffle.partitions", "8")
        left = (
            spark.range(0, 40000)
            .select(
                F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 97)
                .alias("k"),
                F.col("id").alias("payload"),
            )
        )
        right = spark.range(0, 97).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        joined = left.join(right, "k")
        # execute THIS dataframe (count() would execute a different plan
        # whose AQE result we could not inspect)
        rows = joined.collect()
        # correctness: every left row matches exactly one right row
        assert len(rows) == 40000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, "AQE did not mark the join skew-handled"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_observe_inline_metrics_single_pass(spark):
    """Inline data-quality metrics via df.observe: null/row counters ride
    the SAME job as the real aggregation — one scan, no second
    metrics-only pass (the observability shape a 100 TB pipeline needs;
    a separate DQ scan doubles the read bill)."""
    from pyspark.sql import Observation

    li = table(spark, SF_SMALL, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )
    result = observed.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q")).collect()
    assert result
    got = obs.get
    assert got["rows_seen"] == li.count()
    assert got["null_qty"] == 0
    assert got["max_price"] > 0


def test_cbo_table_stats_flow_into_plan_estimates(spark, tmp_path):
    """Cost-based optimization plumbing: ANALYZE TABLE writes row-count /
    size statistics into the catalog and the optimizer's plan estimates
    pick them up — the prerequisite for stats-driven join ordering and
    broadcast decisions on a real warehouse (fixtures are read straight
    from parquet elsewhere, so this is the one place catalog stats are
    exercised)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbo_t LOCATION '{tmp_path}/wh'")
    saved_cbo = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        table(spark, SF_SMALL, "orders").limit(500).write.mode("overwrite").saveAsTable(
            "cbo_t.orders_s"
        )
        spark.sql("ANALYZE TABLE cbo_t.orders_s COMPUTE STATISTICS")
        row = spark.sql("DESCRIBE EXTENDED cbo_t.orders_s").filter(
            F.col("col_name") == "Statistics"
        ).collect()
        assert row and "rows" in row[0].data_type, row
        est = (
            spark.table("cbo_t.orders_s")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert est.rowCount().isDefined() and est.rowCount().get() == 500
        assert est.sizeInBytes() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved_cbo)
        spark.sql("DROP DATABASE IF EXISTS cbo_t CASCADE")


def test_salted_join_random_parity_row_exact(spark):
    """Row-exact parity vs the plain join on random data with duplicate
    keys on BOTH sides (fan-out joins) and unmatched keys, inner and
    left — the salt must replicate the small side exactly once per salt
    bucket, never duplicating or dropping a fan-out row."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    kv = st.tuples(st.integers(0, 3), st.integers(0, 9))

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture, HealthCheck.too_slow
        ],
    )
    @given(
        lrows=st.lists(kv, min_size=1, max_size=6),
        rrows=st.lists(kv, min_size=0, max_size=6),
        how=st.sampled_from(["inner", "left"]),
    )
    def check(lrows, rrows, how):
        big = spark.createDataFrame(lrows, "k long, a long")
        small = spark.createDataFrame(rrows, "k long, b long") if rrows else (
            spark.createDataFrame([], "k long, b long")
        )
        plain = sorted(
            map(tuple, big.join(small, "k", how).select("k", "a", "b").collect())
        )
        salted = sorted(
            map(
                tuple,
                salted_join(big, small, "k", salt_buckets=3, how=how)
                .select("k", "a", "b")
                .collect(),
            )
        )
        assert salted == plain

    check()


def test_headline_queries_are_partition_invariant(spark):
    """Every headline bench query must give the IDENTICAL answer under a
    hostile partitioning regime (3 shuffle partitions, 256 KB input splits)
    as under the tuned defaults — the in-suite guard for the full-registry
    sweep in tools/partition_invariance.py. Any operator whose result
    depends on partition count/ordering (a mapPartitions accumulator, a
    prefix sum assuming one partition, a split-boundary-tied sample) flips
    between regimes and fails here before it ships."""
    from bench import HEADLINE
    from db_core_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.001"
    qs = all_queries()
    knobs = {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.files.maxPartitionBytes": str(256 * 1024),
    }
    defaults = {k: spark.conf.get(k) for k in knobs}

    def canon(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    bad = []
    for name in HEADLINE:
        try:
            a = canon(qs[name].fn(spark, sf_dir))
            for k, v in knobs.items():
                spark.conf.set(k, v)
            b = canon(qs[name].fn(spark, sf_dir))
        finally:
            for k, v in defaults.items():
                spark.conf.set(k, v)
        if a != b:
            bad.append(name)
    assert not bad, f"partition-sensitive results: {bad}"
