"""Physical-plan audits: the scale claims in query docstrings must be
visible in `explain` output — broadcasts actually broadcast, filters
actually push to the parquet scan, top-k actually avoids a global sort,
and nothing degenerates to a cartesian product. These are the properties
that decide whether a plan survives a 100x scale-up, so they are asserted,
not assumed."""

from __future__ import annotations

import re

import pytest

from db_core_spark.registry import all_queries
from tests.conftest import SF_SMALL


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def queries():
    return all_queries()


BROADCAST_QUERIES = [
    # every TPC-H adaptation that joins a dimension table must broadcast it
    "q3_shipping_priority",
    "q5_multiway_join",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_effect",
    "q19_disjunctive_revenue",
]


@pytest.mark.parametrize("name", BROADCAST_QUERIES)
def test_dim_joins_are_broadcast(spark, queries, name):
    plan = plan_of(queries[name].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


def test_q6_filters_push_to_parquet_scan(spark, queries):
    plan = plan_of(queries["q6_forecast_revenue"].fn(spark, SF_SMALL))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "q6: no pushed filters on the scan"
    pushed = m.group(1)
    assert "l_shipdate" in pushed and "l_quantity" in pushed


def test_scan_projection_prunes_columns(spark, queries):
    """The projection needs 5 of lineitem's 11 columns; the scan must read
    exactly those, not the full schema."""
    plan = plan_of(queries["scan_projection_filter"].fn(spark, SF_SMALL))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    assert len(m.group(1).split(",")) <= 5, f"scan reads too wide: {m.group(1)}"


def test_orderby_limit_uses_topk_not_global_sort(spark, queries):
    plan = plan_of(queries["orderby_limit"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_uses_window_group_limit(spark, queries):
    plan = plan_of(queries["window_topk_per_group"].fn(spark, SF_SMALL))
    assert "WindowGroupLimit" in plan, "per-group top-k should prune pre-shuffle"


def test_no_cartesian_products_anywhere(spark, queries):
    """No oracle-checked relational query may plan a CartesianProduct.
    (BroadcastNestedLoop is allowed: the intentionally-theta joins bound one
    side; a CartesianProduct would shuffle both full sides.)"""
    offenders = []
    for name, rq in queries.items():
        if rq.category in ("llm", "vector", "object", "multimodal"):
            continue  # pair generators audited separately (bounded by design)
        plan = plan_of(rq.fn(spark, SF_SMALL))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_semi_anti_joins_stay_semi(spark, queries):
    """q18's HAVING subquery and q22's NOT EXISTS must plan as semi/anti
    joins (not inner joins against materialized subqueries)."""
    p18 = plan_of(queries["q18_large_orders"].fn(spark, SF_SMALL))
    assert "LeftSemi" in p18
    p22 = plan_of(queries["q22_idle_customers"].fn(spark, SF_SMALL))
    assert "LeftAnti" in p22


def test_exact_dedup_shuffles_hashes_not_bodies(spark, queries):
    """dedup_exact_groups must hash-then-shuffle: the exchange key is the
    sha256, and document text must not survive past the scan stage."""
    plan = plan_of(queries["dedup_exact_groups"].fn(spark, SF_SMALL))
    m = re.search(r"\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert m, "no exchange in dedup plan"
    assert "text#" not in m.group(1), f"document bodies ride the shuffle: {m.group(1)}"
    # and the partial aggregate (map-side combine) must run before it
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """Hive-partitioned writes must prune at planning time: a predicate on
    the partition column appears under PartitionFilters and the scan reads
    only matching directories — the mechanism that turns a 100 TB scan into
    a single-partition read."""
    from db_core_spark.sources.formats import write_parquet
    from db_core_spark.tables import table
    from pyspark.sql import functions as F

    li = table(spark, SF_SMALL, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    out = str(tmp_path / "lineitem_by_year")
    write_parquet(li, out, partition_by=["ship_year"])

    df = spark.read.parquet(out).filter(F.col("ship_year") == 1996)
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_year" in m.group(1), f"no partition filter: {plan[:500]}"
    # and it is handled at the directory level, NOT as a row-level data
    # filter (PushedFilters must not mention the partition column)
    d = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert d is None or "ship_year" not in d.group(1)
    # values survive the partitioned roundtrip
    want = li.filter(F.col("ship_year") == 1996).count()
    assert df.count() == want > 0


def test_tfidf_df_join_is_broadcast(spark, queries):
    """tfidf's document-frequency side is vocabulary-sized -> must broadcast;
    a sort-merge join here would shuffle the whole tf table twice."""
    plan = plan_of(queries["tfidf_top_terms"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan


def test_gapfill_spine_join_is_broadcast(spark, queries):
    plan = plan_of(queries["gapfill_daily_revenue"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cohort_retention_broadcasts_cohorts(spark, queries):
    """the one-row-per-user cohort table must broadcast into the activity
    side — a sort-merge join here would re-shuffle the event stream."""
    plan = plan_of(queries["cohort_retention"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantize_has_no_shuffle(spark, queries):
    """int8 quantization is embarrassingly parallel: any Exchange in the
    plan would be a scale bug."""
    plan = plan_of(queries["embedding_quantize_int8"].fn(spark, SF_SMALL))
    assert "Exchange" not in plan


def test_shuffle_hash_hint_respected(spark, queries):
    plan = plan_of(queries["join_shuffle_hash_hint"].fn(spark, SF_SMALL))
    assert "ShuffledHashJoin" in plan


def test_corpus_pipeline_is_single_shuffle(spark, queries):
    """pipeline_corpus_prepare claims scan -> ONE dedup shuffle -> map; any
    extra Exchange means a stage got un-fused (e.g. the split bucketing
    accidentally repartitioning)."""
    plan = plan_of(queries["pipeline_corpus_prepare"].fn(spark, SF_SMALL))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected 1 shuffle, saw {n_exchanges}"


def test_pure_range_join_avoids_nested_loop(spark, queries):
    """the bucketed decomposition must plan as an equi hash/merge join on
    the bucket — BroadcastNestedLoop or CartesianProduct would mean the
    rewrite regressed to quadratic."""
    plan = plan_of(queries["join_range_bucketed_pure"].fn(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
