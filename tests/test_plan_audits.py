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


@pytest.mark.heavy
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
    """q22's NOT EXISTS must plan as an anti join (not an inner join
    against a materialized subquery); q18 (r7 rewrite) no longer has a
    semi join at all — its HAVING aggregate IS the output aggregate, so
    the audit pins ONE lineitem scan and no re-aggregation after the
    orders join instead."""
    p22 = plan_of(queries["q22_idle_customers"].fn(spark, SF_SMALL))
    assert "LeftAnti" in p22
    p18 = plan_of(queries["q18_large_orders"].fn(spark, SF_SMALL))
    # three scans total (lineitem ONCE + orders + customer; the pre-r7
    # shape read lineitem twice) and exactly one partial/final aggregate
    # pair — a fourth scan or third HashAggregate means the re-join
    # re-aggregation shape regressed
    assert len(re.findall(r"\(\d+\) Scan parquet", p18)) == 3
    assert len(re.findall(r"\(\d+\) HashAggregate", p18)) <= 2


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


def test_cohort_retention_is_joinless_single_event_shuffle(spark, queries):
    """r7 rewrite: the per-user aggregate carries BOTH the cohort week and
    the distinct active weeks, so the plan has NO join at all and exactly
    two exchanges (user agg + the tiny weeks x offsets rollup) — a join or
    a third exchange means the old cohort-join shape regressed."""
    plan = plan_of(queries["cohort_retention"].fn(spark, SF_SMALL))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
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


# ---------------------------------------------------------------------------
# Bucketed VersionedTable layout: IO pruning audits (VERDICT r1 item #1).
# Parity target: per-object chain walk, /root/reference/src/storage/
# block_driver.rs:461-486 — a single-key read touches O(that bucket), not
# O(table).


def _mk_bucketed_table(spark, tmp_path, n=200):
    from pyspark.sql import types as T

    from db_core_spark.plans import VersionedTable

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    vt = VersionedTable.create(
        spark, str(tmp_path / "bkt"), key_cols=["k"], schema=schema, num_buckets=8
    )
    for batch in range(3):
        t = vt.begin()
        t.upsert(
            spark.createDataFrame(
                [(i, f"v{batch}_{i}") for i in range(n)], schema
            )
        )
        t.commit()
    return vt, schema


def test_single_key_lookup_reads_one_bucket_only(spark, tmp_path):
    """A keyEquals read plans exactly ONE partition whose file listing
    contains only the target key's bucket=<b>/ dirs — layout-pruned IO."""
    import json as _json

    from db_core_spark.plans.versioned import bucket_of_py
    from db_core_spark.sources.versioned_datasource import VersionedSnapshotReader

    vt, schema = _mk_bucketed_table(spark, tmp_path)
    reader = VersionedSnapshotReader(
        schema, {"path": vt.path, "keyequals": _json.dumps({"k": 7})}
    )
    parts = reader.partitions()
    assert len(parts) == 1
    want_bucket = bucket_of_py([7], 8)
    listed = reader.dirs_for_partition(parts[0])
    assert listed, "lookup partition lists no dirs"
    for d, _op, pruned in listed:
        assert pruned, f"unpruned full-op scan in lookup path: {d}"
        assert d.endswith(f"bucket={want_bucket}"), d
    # and the lookup answers correctly
    rows = vt.lookup({"k": 7}).collect()
    assert [(r.k, r.v) for r in rows] == [(7, "v2_7")]


def test_full_snapshot_partitions_cover_each_bucket_dir_exactly_once(spark, tmp_path):
    """No partition reads another partition's files, and together they read
    every bucket dir exactly once (no overlap => no duplicate rows, full
    cover => no lost rows)."""
    from db_core_spark.sources.versioned_datasource import VersionedSnapshotReader

    vt, schema = _mk_bucketed_table(spark, tmp_path)
    reader = VersionedSnapshotReader(schema, {"path": vt.path})
    seen = []
    for p in reader.partitions():
        for d, _op, pruned in reader.dirs_for_partition(p):
            assert pruned
            seen.append(d)
    assert len(seen) == len(set(seen)), "bucket dir read by two partitions"
    import glob
    import os

    on_disk = {
        d
        for d in glob.glob(os.path.join(vt.path, "data", "tsn=*", "opseq=*", "bucket=*"))
        if os.path.isdir(d)
    }
    assert set(seen) == on_disk
    # correctness: bucketed in-partition resolution == window resolution
    got = {(r.k, r.v) for r in vt.snapshot().collect()}
    want = {(r.k, r.v) for r in vt.snapshot(engine="window").collect()}
    assert got == want and len(got) == 200


def test_snapshot_plan_has_no_exchange(spark, tmp_path):
    """The bucketed snapshot read resolves versions in-partition: the
    physical plan contains NO shuffle exchange (the round-1 global window
    shuffle is gone — the 100 TB win)."""
    vt, _schema = _mk_bucketed_table(spark, tmp_path)
    plan = vt.snapshot()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    legacy = (
        vt.snapshot(engine="window")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in legacy  # the old cost, kept only as explicit fallback


def test_weighted_sample_uses_topk_not_global_sort(spark, queries):
    """A-ES weighted sampling is only scale-sane as per-partition top-k +
    single merge; a global sort of the keyed corpus would be the bottleneck
    at 100 TB."""
    plan = plan_of(queries["sample_weighted_topk"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_dq_fk_orphans_broadcasts_every_dimension(spark, queries):
    """All four FK edges check against dimension/key sides small enough to
    broadcast; a shuffle-hash anti join of the fact table per edge would
    quadruple the shuffle volume for no reason."""
    plan = plan_of(queries["dq_fk_orphans"].fn(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_bm25_broadcasts_vocab_and_stats(spark, queries):
    """df (vocabulary-sized) and the 1-row corpus stats must broadcast; the
    only large shuffle is the (doc_id, term) tf aggregate."""
    plan = plan_of(queries["bm25_top_terms"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_dq_profile_single_scan_single_aggregate(spark, queries):
    """The column profile must come from ONE scan + one global aggregate
    chain (multi-distinct Expand is fine), not one pass per column — a
    union of per-column projections would inline the aggregate subtree
    once per column and re-execute the scan each time."""
    import re as _re

    plan = plan_of(queries["dq_profile_columns"].fn(spark, SF_SMALL))
    # "formatted" explain names each node once in the tree and once in the
    # details section — count the numbered detail headers only
    n_scans = len(_re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"profile plans {n_scans} scans"


def test_sessionize_single_shuffle_shared_by_windows_and_agg(spark, queries):
    """Both window passes and the per-session aggregate must reuse the one
    hash partitioning on user_id — extra Exchanges mean the plan re-shuffles
    what is already co-located."""
    plan = plan_of(queries["sessionize_gap_events"].fn(spark, SF_SMALL))
    import re as _re

    n_exchanges = len(_re.findall(r"\bExchange\b", plan)) - plan.count("ReusedExchange")
    assert n_exchanges <= 2, f"sessionize plans {n_exchanges} exchanges"


def test_bloom_prefilter_probes_are_broadcast(spark, queries):
    """The 3 Bloom membership tests must be broadcast hash joins (the filter
    is 1024 rows) — a shuffled probe would defeat the whole point of
    shedding fact rows before the shuffle."""
    plan = plan_of(queries["join_bloom_prefilter"].fn(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 3, "bloom probes not broadcast"
    assert "CartesianProduct" not in plan


def test_contamination_bench_set_is_broadcast(spark, queries):
    """The benchmark shingle set must broadcast against the training posting
    list — at 100 TB the training side cannot reshuffle for a semi join
    against a MB-scale eval suite."""
    plan = plan_of(queries["contamination_ngram_overlap"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan) or "LeftSemi" in plan


def test_perplexity_vocab_is_broadcast(spark, queries):
    plan = plan_of(queries["perplexity_unigram_proxy"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, "vocab join must broadcast"


def test_ohlc_windows_and_agg_share_one_exchange(spark, queries):
    """Both row_number windows and the final aggregate group on
    (event_type, bar_hour): exactly one exchange of the events data."""
    plan = plan_of(queries["ohlc_time_bars"].fn(spark, SF_SMALL))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}"


def test_quantile_buckets_avoid_global_window(spark, queries):
    """Decile bucketing must NOT plan a single-partition window (the NTILE
    shape); boundaries come from a percentile aggregate + broadcast."""
    plan = plan_of(queries["quantile_bucket_features"].fn(spark, SF_SMALL))
    assert "Exchange SinglePartition" not in plan or "Window" not in plan
    assert "Window" not in plan, "global window found — NTILE-shaped plan"


def test_ewma_is_grouped_map_not_global(spark, queries):
    """EWMA must parallelize across users: one hash exchange on user_id into
    FlatMapGroupsInPandas — never a single-partition sort."""
    plan = plan_of(queries["ewma_user_value"].fn(spark, SF_SMALL))
    assert "FlatMapGroupsInPandas" in plan
    assert "Exchange SinglePartition" not in plan


def test_interval_overlap_join_is_equi_bucketed(spark, queries):
    """The interval-vs-interval join must candidate-generate via the hour
    bucket equi-key — a nested-loop/cartesian plan here would be quadratic
    in sessions at scale."""
    plan = plan_of(queries["join_interval_overlap_sessions"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_asof_single_exchange_no_join(spark, queries):
    """Nearest as-of must stay the union+two-window-scans shape: exactly one
    hash exchange of event data and NO join operator at all (the oracle's
    ranked cartesian is what this plan avoids)."""
    plan = plan_of(queries["asof_join_nearest_order"].fn(spark, SF_SMALL))
    assert "Join" not in plan, "nearest as-of should not plan any join"
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected 1 exchange, saw {n_exchanges}"


def test_source_mix_prefilter_before_rank_window(spark, queries):
    """The per-source cap must pre-filter on the hash prefix BEFORE the rank
    window (the window input is the filtered pool, not the raw table), with
    both side-aggregates broadcast — otherwise every source is one giant
    sort partition at scale."""
    plan = plan_of(queries["source_mix_rebalance"].fn(spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2, "counts/flags not broadcast"
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_winsorized_fences_are_broadcast(spark, queries):
    plan = plan_of(queries["agg_winsorized_mean"].fn(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, "percentile fences must broadcast back"
    assert "SortMergeJoin" not in plan


def test_histogram_sketch_is_hash_aggregate_not_sort(spark, queries):
    """The histogram build must be a hash aggregate over the scan; the only
    window runs over <=256 bin rows. No data-scale sort may appear before
    the aggregate."""
    plan = plan_of(queries["agg_histogram_quantile_sketch"].fn(spark, SF_SMALL))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    # stats / quantile frames join in as 1-row broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_session_overlap_join_not_nested_loop(spark, queries):
    """Cross-stream session overlap must join hash-partitioned on user_id;
    the interval predicate filters within join groups."""
    plan = plan_of(queries["stream_session_overlap_batch"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_sample_gather_is_equi_join(spark, queries):
    """The negative-feature gather must be a plain equi-join on the sampled
    id (shuffle or broadcast), never a nested loop; the only cross join is
    the 1-row corpus-size broadcast."""
    plan = plan_of(queries["negative_pair_sample"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan or plan.count("BroadcastHashJoin") >= 1


def test_key_skew_topk_avoids_global_sort(spark, queries):
    plan = plan_of(queries["dq_key_skew_profile"].fn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, "top-10 must not be a global sort"


@pytest.mark.heavy
def test_no_row_at_a_time_python_udf_anywhere(spark, queries):
    """No registered query may plan a BatchEvalPython node (row-at-a-time
    Python UDF — the 10-100x slow path). Arrow-vectorized Python
    (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas) is the only
    sanctioned Python in any plan."""
    offenders = []
    for name, rq in queries.items():
        if rq.category in ("mvcc", "object"):
            continue  # table-building fixtures; their reads are datasource scans
        plan = plan_of(rq.fn(spark, SF_SMALL))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"


def test_geo_knn_prunes_with_window_group_limit(spark, queries):
    """geo_haversine_knn's rank<=5 must plan a partition-local
    WindowGroupLimit BELOW the exchange (local top-5 before shuffle) and
    broadcast the query-point side."""
    plan = plan_of(queries["geo_haversine_knn"].fn(spark, SF_SMALL))
    assert "WindowGroupLimit" in plan
    first_wgl = plan.index("WindowGroupLimit")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # formatted plans list operators leaves-last; a WGL both above AND
    # below the exchange shows the partial (pre-shuffle) instance exists
    assert plan.count("WindowGroupLimit") >= 2


def test_geo_cell_join_is_hash_equi_join_not_nlj(spark, queries):
    """The blocked spatial self-join must plan a HASH equi-join on the
    cell key — never a nested-loop/cartesian over points."""
    plan = plan_of(queries["geo_cell_join_pairs"].fn(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_trending_topk_collapses_before_windows(spark, queries):
    """window_topk_trending must aggregate facts to the hourly frame
    BEFORE any window (the windows run over the aggregate, never raw
    events) — visible as a HashAggregate below the Window operators and
    no WindowExec over the scan. (WindowGroupLimit can NOT apply here:
    the lag-delta window needs every row, which is why the rank filter
    does not prune — asserting the aggregate-first shape instead.)"""
    plan = plan_of(queries["window_topk_trending"].fn(spark, SF_SMALL))
    assert "HashAggregate" in plan and "Window" in plan
    # formatted plans print root-first: Window above the aggregate means
    # the aggregate executes FIRST (it is deeper in the tree)
    assert plan.index("Window") < plan.index("HashAggregate")


GLOBAL_WINDOW_FIXED = [
    # round 5: rewrote each from a global single-partition window to the
    # two-pass prefix rank/sum (operators/prefixrank.py); these audits pin
    # the fix — any reintroduced unpartitioned window over unbounded input
    # fails here before it ships
    "agg_value_deciles",
    "stats_mann_whitney_u",
    "pack_training_sequences",
    "corpus_heaps_law_fit",
    "pipeline_multimodal_prepare",
    "abc_part_classification",
    # found by the new detector itself (value-filter-bounded at fixture
    # scale, but rewritten so the shape survives the filter being lifted)
    "skyline_pareto_frontier",
    "window_range_frame",
    # round 6: flagged by the tightened bounded-key rule (an aggregate
    # below the exchange no longer exempts unless its grouping keys are a
    # bounded spine) — q15's global-window max became a broadcast scalar-max
    # join; zipf's vocab rank became the two-pass prefix rank
    "q15_top_supplier",
    "zipf_token_slope",
]


def test_global_window_detector_flags_regression(spark):
    """The smell detector must SEE a deliberately-built global window over
    an unbounded (raw scan) input — guards the detector itself."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from db_core_spark.plans.planaudit import global_window_smells
    from db_core_spark.tables import table

    o = table(spark, SF_SMALL, "orders")
    w = W.orderBy("o_orderkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    bad = o.select("o_orderkey", F.sum("o_totalprice").over(w).alias("c"))
    assert global_window_smells(plan_of(bad)), "detector missed a global window"

    # bounded input (top-k below the exchange) must NOT flag
    ok = (
        o.orderBy(F.desc("o_totalprice"))
        .limit(50)
        .select("o_orderkey", F.sum("o_totalprice").over(w).alias("c"))
    )
    assert not global_window_smells(plan_of(ok)), "detector flagged a bounded window"


def test_global_window_detector_flags_per_entity_aggregate(spark):
    """r5-verdict tightening: an aggregate below the exchange exempts ONLY
    when its grouping keys are a bounded spine. A per-entity (per-customer)
    aggregate is data-proportional — a global window over it must flag,
    where the old any-aggregate exemption silently passed it."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from db_core_spark.plans.planaudit import global_window_smells
    from db_core_spark.tables import table

    o = table(spark, SF_SMALL, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    w = W.orderBy("spend").rowsBetween(W.unboundedPreceding, W.currentRow)
    bad = per_cust.select("o_custkey", F.sum("spend").over(w).alias("running"))
    smells = global_window_smells(plan_of(bad))
    assert smells, "per-entity aggregate window escaped the tightened detector"
    assert "o_custkey" in smells[0]

    # calendar-spine aggregate (bounded domain) must still be exempt, even
    # through Catalyst's opaque _groupingexpression alias
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    wm = W.orderBy("m").rowsBetween(W.unboundedPreceding, W.currentRow)
    ok = monthly.select("m", F.sum("rev").over(wm).alias("cum"))
    assert not global_window_smells(plan_of(ok)), "calendar spine wrongly flagged"


@pytest.mark.parametrize("name", GLOBAL_WINDOW_FIXED)
def test_no_unbounded_global_window(spark, queries, name):
    from db_core_spark.plans.planaudit import global_window_smells

    plan = plan_of(queries[name].fn(spark, SF_SMALL))
    assert global_window_smells(plan) == [], f"{name}: unbounded global window"


def test_percentile_buffer_sites_are_whitelisted():
    """Pin the exact-percentile class shut (r8): every ``F.percentile``
    call site under db_core_spark/queries/ holds an O(group-distinct)
    value buffer in one task's aggregate, so each must carry a written
    justification in planaudit.PERCENTILE_BUFFER_WHITELIST that its input
    domain is quantized/bounded — or be migrated to
    operators/quantile.bucketed_exact_quantiles (as
    events_interarrival_stats, funnel_latency_percentiles and
    rfm_customer_segments were). Asserts set EQUALITY so stale whitelist
    entries fail too."""
    import ast
    import pathlib

    from db_core_spark.plans.planaudit import PERCENTILE_BUFFER_WHITELIST

    qdir = pathlib.Path(__file__).resolve().parent.parent / "db_core_spark" / "queries"
    sites: set[str] = set()
    for p in sorted(qdir.glob("*.py")):
        tree = ast.parse(p.read_text())
        funcs = [
            (n.lineno, n.end_lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "percentile"
            ):
                enc = [nm for s, e, nm in funcs if s <= node.lineno <= e]
                sites.add(f"{p.name}:{enc[-1] if enc else '<module>'}")
    assert sites == set(PERCENTILE_BUFFER_WHITELIST), (
        f"unjustified new F.percentile sites: {sites - set(PERCENTILE_BUFFER_WHITELIST)}; "
        f"stale whitelist entries: {set(PERCENTILE_BUFFER_WHITELIST) - sites}"
    )
