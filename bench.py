"""Benchmark harness: runs the headline operator set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count()-style full materialization (collect of
the result — results are small aggregates / bounded top-k outputs).

Warm-up protocol: before timing, every headline query runs once at sf0.001
(~1/100 of the timed scale). That compiles the whole-stage-codegen classes
and JITs the hot paths WITHOUT meaningfully warming data caches (different
files; <1% of the data volume), so the timed pass measures steady-state
query cost at the target SF — the quantity that scales to a real cluster —
rather than one-time JVM/codegen compilation (measured up to 5s on the
widest plan, constant in data size, fully amortized in any real
deployment).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_core_spark.registry import all_queries  # noqa: E402
from db_core_spark.session import get_spark  # noqa: E402

# Headline set: one representative per operator family, weighted toward the
# scan/join/agg/window core that dominates real workloads.
HEADLINE = [
    "q1_pricing_summary",
    "q5_multiway_join",
    "join_inner_agg",
    "join_left_outer",
    "agg_count_distinct",
    "agg_rollup",
    "window_topk_per_group",
    "window_running_sum",
    "mvcc_snapshot_asof",
    "stream_tumbling_window",
    "stream_session_window",
    "dedup_exact_keep",
    "pipeline_corpus_prepare",
    "minhash_lsh_pairs",
    "knn_bruteforce_topk",
    "text_stats",
    "object_reassembly",
]

# Round-7 additions worth tracking at sf0.1; reported under "extra_queries",
# excluded from the headline total to keep its 17-query basis comparable.
EXTRA = [
    "dedup_segments_global",
    "geo_cell_join_pairs",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "attribution_u_shaped",
    # r7 continuation: the two bucketed-fence rewrites, measured by the
    # driver from here on (headline basis unchanged for comparability)
    "agg_weighted_median",
    "agg_percentiles",
    # r8: the three bounded-state rewrites (distributed lag + bucketed
    # quantiles) — constants-dominated plans whose decade ratios the
    # sf1 sweep should keep on record
    "events_interarrival_stats",
    "funnel_latency_percentiles",
    "rfm_customer_segments",
    # r10 resume 6: the registry's former heavy tail, rewritten as Arrow
    # partial-moments kernels / one-pass fingerprints / size-aware
    # grouped-map repartitions — added so the driver keeps their decade
    # and core-count scaling on record (headline basis unchanged)
    "embedding_logreg_train",
    "embedding_kmeans_lloyd",
    "applyinpandas_zscore",
    "applyinpandas_udaf_gini",
    "ewma_user_value",
    "simhash_buckets",
    "simhash_hamming_pairs",
    # r11: the versioned write path (litframe inputs, size-aware staging
    # width, folded audit probes), the pointer-doubling component loops,
    # and the size-gated fuzzy join — added so the driver keeps their
    # decade and core-count scaling on record (headline basis unchanged)
    "versioned_commit_audit",
    "versioned_restore_rebucket",
    "dedup_cluster_components",
    "dedup_keep_best_quality",
    "embedding_semantic_clusters",
    "fuzzy_levenshtein_pairs",
]

# The r11 additions get the SAME sf0.001 codegen/machinery warm-up the
# headline set has always had (measured: the first versioned-table query
# in a session pays ~6 s of one-time Python-DataSource + parquet-writer
# machinery init that no later call pays — 9.2 s first call vs 2.8 s
# steady-state for versioned_commit_audit; constant in data size, fully
# amortized in any real deployment, exactly the class the module
# docstring's warm-up rationale excludes). Scoped to the NEW entries
# only: the 17 pre-existing extras keep their exact r7-r10 measurement
# protocol (single-shot, no warm-up) so round-over-round comparisons
# stay valid. Recorded in OPTIMIZATION_r11.md.
EXTRA_WARM = EXTRA[-6:]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # SPARK_GRAFT_COLD=1 skips the codegen pre-warm pass: the timed numbers
    # then INCLUDE one-time JVM/codegen compilation — the worst-case first-
    # query latency a fresh cluster sees. Default remains warm (steady-state
    # cost, the quantity that scales). Mode is recorded in the JSON line so
    # round-over-round diffs compare like with like.
    cold = os.environ.get("SPARK_GRAFT_COLD", "0") == "1"
    spark = get_spark("bench")
    qs = all_queries()

    # Warm up JVM + parquet footer caches with a trivial action, then
    # compile every headline plan's codegen at 1/100 scale (see module
    # docstring for the warm-up protocol rationale).
    spark.range(1000).count()
    warm_dir = "/root/testdata/sf0.001"
    if not cold and os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE + EXTRA_WARM:
            try:
                qs[name].fn(spark, warm_dir).count()
            except Exception as e:  # never let warm-up sink the bench
                print(f"  warmup {name} failed: {e}", file=sys.stderr)

    # best-of-N per query (criterion-style steady-state estimator): local
    # JVM GC/JIT noise at sf0.1 swings single shots by up to ~1s, which
    # would drown real round-over-round regressions. reps recorded below.
    reps = 1 if cold else int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        best, n = None, 0
        try:
            rq = qs[name]  # inside the try: a renamed query must not sink the run
            for _ in range(reps):
                t0 = time.time()
                df = rq.fn(spark, sf_dir)
                n = df.count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
        except Exception as e:
            # One broken query must never sink the whole bench (round 3 lost
            # ALL perf evidence that way): record the error, keep timing.
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"  {name}: ERROR {errors[name][:120]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        rows[name] = n
        print(f"  {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    # Secondary set: heavier round-7 additions, timed single-shot and
    # reported OUTSIDE the headline total so round-over-round totals stay
    # comparable (same 17-query basis since r1).
    extra: dict[str, float] = {}
    for name in EXTRA:
        try:
            rq = qs[name]
            t0 = time.time()
            rq.fn(spark, sf_dir).count()
            extra[name] = round(time.time() - t0, 3)
            print(f"  extra {name}: {extra[name]:.2f}s", file=sys.stderr)
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:500]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # non-headline additions timed for the record; NOT in "value"
                "extra_queries": extra,
                # per-query result row counts: a timing regression with a
                # changed row count is a semantics change, not a perf one
                "rows": rows,
                # queries that crashed (timed set excludes them; non-empty
                # errors => "value" undercounts and the round needs a fix)
                "errors": errors,
                "mode": "cold" if cold else "warm",
                "reps": reps,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
