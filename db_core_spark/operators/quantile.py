"""Exact interpolated quantiles at scale: bucketed two-pass rank finding.

``F.percentile`` (and DuckDB's ``quantile_cont``) materialize a per-group
value buffer inside the aggregate — O(group rows) executor memory, the one
shape that cannot survive a 100 TB group. This operator computes the SAME
statistic (Spark's own two-product interpolation
``(ceil(k)-k)*v_lo + (k-floor(k))*v_hi`` at rank ``k = (n-1)*q``) with
bounded state everywhere:

1. Pass 1 hash-aggregates row COUNTS per ``(group, floor(value/width))``
   bucket — map-side combine, the shuffle carries O(groups x buckets) rows
   no matter how large the input.
2. A tiny per-group cumulative over the bucket frame locates, for every
   requested quantile, the bucket holding the lower and upper neighbor
   ranks plus each bucket's exclusive below-count. These come back as a
   <= groups x quantiles x 2 row fence collect (the same centroid/fence
   pattern the k-means and weighted-median queries use).
3. Pass 2 re-scans ONLY the fenced buckets: the fence is a literal
   value-range predicate, so it pushes to the parquet scan (min/max
   row-group pruning); per-VALUE counts aggregate on the slice (map-side
   combined — duplicates collapse before the shuffle), a per-(group,
   bucket) ordered window ranks the residual distinct values, and the
   neighbor values at each rank are min-filters against the broadcast
   fences. The window partition is bounded BY CONSTRUCTION for
   fixed-precision data: distinct values per bucket <= width / value
   quantum (e.g. 6,400 for two-decimal prices in 64-wide buckets)
   regardless of row count — duplicates fold into the count column. For
   genuinely continuous values, shrink ``width`` so per-bucket distinct
   counts fit a task; the histogram pass is O(groups x buckets) either
   way.

Same fence discipline as ``agg_weighted_median``: bucket width is a power
of two so ``floor(v/width)`` and the literal bounds agree exactly in
binary floating point. Reference parity target:
/root/reference/src — no quantile surface exists in the reference
(storage engine only); this derives from the goal-level aggregate family.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from db_core_spark.operators.litframe import literal_frame

# Past this many fenced buckets the literal OR-chain predicate stops being a
# cheap pushdown and starts being a giant Catalyst expression (interpreted
# past codegen's 64KB method limit); fall back to a coarse global value
# envelope — the inner join on (group, bucket) below is what enforces
# exactness either way, the literal predicate only exists for row-group
# pruning.
_MAX_LITERAL_FENCES = 64


def bucketed_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    *,
    width: float = 64.0,
    bucket_aggs: dict[str, tuple[Column, Column]] | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Exact ``quantile_cont``-semantics quantiles of ``value_col`` per
    ``group_col``, one output row per (group, q): columns
    ``(group_col, q, value)``. Values must be non-null numerics; NULL
    group keys form their own group (null-safe matching throughout, same
    as groupBy). ``width`` must be a power of two — that is what makes
    ``floor(v/width)`` and the literal bucket bounds agree exactly in
    binary floating point (an arbitrary width lets a boundary value land
    in bucket b in pass 1 but fail bucket b's range predicate in pass 2).

    Equals ``F.percentile(value_col, q)``: the neighbor values found here
    are the identical order statistics, combined with Spark's own
    two-product interpolation ``(ceil(k)-k)*v_lo + (k-floor(k))*v_hi`` at
    ``k = (n-1)*q`` (returning ``v_lo`` outright when ``k`` is integral),
    so the result is bit-identical to the buffered aggregate.

    ``bucket_aggs`` (opt-in fusion, r10): per-group base statistics that
    ride the quantile machinery at ZERO extra jobs. Each entry maps an
    output name to ``(per_bucket_expr, recombine_expr)``: the first is
    evaluated per (group, bucket) inside the pass-1 histogram aggregate
    against ``df``'s ORIGINAL columns (so exact integer/decimal
    arithmetic survives — the internal ``__v`` is a double cast); the
    second recombines the per-bucket column (same name) across a group's
    buckets and is applied by the operator over the existing per-group
    fence window (e.g. ``F.sum("gap_sum")`` recombines a per-bucket
    ``F.sum("gap_us")``; a per-bucket COUNT recombines with SUM). The
    recombined totals travel on the fence rows the operator already
    collects, so the return value becomes ``(quantiles_df, stats_df)``
    where ``stats_df`` is a tiny LITERAL frame — one row per group with
    columns ``(group_col, __n, *bucket_aggs)``, ``__n`` being the
    non-null value count — that costs no scan, no shuffle and no job to
    consume. In this mode ``value_col`` MAY contain NULLs: null-valued
    rows form a NULL ``__bkt`` histogram row that keeps all-NULL groups
    visible in ``stats_df`` (``__n = 0``, NULL stats) but never enters
    the quantile computation, matching ``F.percentile``'s skip-nulls
    semantics. Per-bucket exprs must themselves ignore NULL values (sum /
    max / count(col) all do). Recombined longs/doubles round-trip the
    driver exactly (Python ints are exact; floats are IEEE doubles), so
    downstream arithmetic on ``stats_df`` is bit-identical to a direct
    aggregation. Without ``bucket_aggs`` nothing changes: same
    single-DataFrame return, same plan, same non-null contract as
    before.

    Build-time-snapshot semantics: unlike the lazy query builders in this
    repo, calling this function RUNS Spark jobs (the histogram pass and
    the fence collect) and bakes the collected fences into the returned
    plan as literals. The result is therefore only valid for ``df``'s
    data as of the call — re-executing the returned DataFrame after the
    underlying source changes combines stale fences with fresh rows and
    silently returns inconsistent quantiles. Rebuild (call again) after
    any source mutation; point it at a snapshot/version-pinned read when
    the source is a live versioned table.
    """
    if not qs or not all(0.0 <= float(q) <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be within [0, 1], got {qs}")
    if not (width > 0 and math.frexp(width)[0] == 0.5):
        raise ValueError(f"width must be a positive power of two, got {width}")
    spark = df.sparkSession
    g = group_col
    if bucket_aggs:
        # keep the original columns alive for the caller's exact-typed
        # aggregates (Catalyst prunes the unused ones from pass 2)
        src = df.withColumn("__v", F.col(value_col).cast("double"))
    else:
        src = df.select(g, F.col(value_col).cast("double").alias("__v"))

    per_bucket = src.groupBy(
        g, F.floor(F.col("__v") / width).alias("__bkt")
    ).agg(
        F.count(F.lit(1)).alias("__c"),
        *[c.alias(n) for n, (c, _re) in (bucket_aggs or {}).items()],
    )
    wb = W.partitionBy(g).orderBy("__bkt")
    wg = W.partitionBy(g)
    # One Window node provides BOTH the cumulative and the per-group total
    # (two frames over the same partitioning), so the fence search is a
    # single linear pipeline: histogram -> window -> per-row rank targets
    # (a bucket-frame crossJoin with the tiny q list — O(groups x buckets
    # x qs x 2) rows, bounded by construction) -> crossing min_by. r10:
    # this replaces the former two-branch shape (persist the histogram,
    # distinct per-group totals, crossJoin, re-join the cumulative) —
    # three exchanges, a persist materialization and a broadcast fewer
    # per call, with the identical fence rows. In fusion mode the SAME
    # window additionally recombines the caller's per-bucket aggregates
    # into per-group totals (extra frames over the same partitioning —
    # no new exchange, no new job).
    #
    # NULL-bucket rows (null-valued input rows; fusion mode only) flow
    # THROUGH the window so all-NULL groups stay visible to stats: they
    # order first (ASC NULLS FIRST) and contribute 0 to the cumulative /
    # total via the null-guarded count, and their per-bucket agg values
    # are NULL by the caller contract, so every fence value and every
    # recombined stat is identical to a pre-filtered run.
    c_nn = F.when(F.col("__bkt").isNotNull(), F.col("__c")).otherwise(F.lit(0))
    cum_b = per_bucket.withColumn(
        "__cb", F.sum(c_nn).over(wb.rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("__n", F.sum(c_nn).over(wg))
    for name, (_bexpr, recombine) in (bucket_aggs or {}).items():
        cum_b = cum_b.withColumn(name, recombine.over(wg))

    q_frame = literal_frame(spark, [(float(q),) for q in qs], "q double")
    # Every bucket row learns each quantile's 1-indexed neighbor ranks;
    # buckets whose cumulative reaches a rank compete, min_by keeps the
    # first (crossing) bucket with its exclusive below-count. NULL group
    # keys survive: groupBy treats NULL as a real group end to end.
    stat_names = ["__n", *bucket_aggs] if bucket_aggs else []
    crossing = F.col("__cb") >= F.col("__rank")
    if bucket_aggs:
        # all-NULL groups have no crossing bucket; let their (single)
        # NULL-bucket row through so the group appears in stats_df —
        # min_by ignores the NULL ordering key, so the fence fields come
        # back NULL and pass 2 skips them below.
        crossing = crossing | ((F.col("__n") == 0) & F.col("__bkt").isNull())
    fences_df = (
        cum_b.crossJoin(F.broadcast(q_frame))
        .withColumn("__k", (F.col("__n") - 1) * F.col("q"))
        .select(
            g,
            "q",
            *stat_names,
            "__k",
            "__bkt",
            "__c",
            "__cb",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lo").alias("kind"),
                        (F.floor("__k") + 1).alias("__rank"),
                    ),
                    F.struct(
                        F.lit("hi").alias("kind"),
                        (F.ceil("__k") + 1).alias("__rank"),
                    ),
                )
            ).alias("nb"),
        )
        .select(
            g, "q", *stat_names, "__k", "nb.kind", "nb.__rank", "__bkt", "__c", "__cb"
        )
        .filter(crossing)
        .groupBy(g, "q", "kind", "__rank", "__k")
        .agg(
            F.min_by(
                F.struct(
                    F.col("__bkt"), (F.col("__cb") - F.col("__c")).alias("__below")
                ),
                F.col("__bkt"),
            ).alias("s"),
            # constant per group; first() just carries them to the collect
            *[F.first(n).alias(n) for n in stat_names],
        )
        .select(g, "q", "kind", "__rank", "__k", "s.__bkt", "s.__below", *stat_names)
    )
    fences = fences_df.collect()  # <= groups x |qs| x 2 rows

    def stats_frame() -> DataFrame:
        """One literal row per group: (group, __n, *recombined stats) —
        deduped from the collected fence rows, zero extra Spark work."""
        schema = df.select(g).schema
        ftypes = {f.name: f.dataType for f in fences_df.schema.fields}
        for n in stat_names:
            schema = schema.add(n, ftypes[n])
        seen: dict = {}
        for r in fences:
            seen.setdefault(r[g], tuple([r[g], *(r[n] for n in stat_names)]))
        return literal_frame(spark, list(seen.values()), schema)

    if not fences:
        empty = literal_frame(
            spark, [], df.select(g).schema.add("q", "double").add("value", "double")
        )
        return (empty, stats_frame()) if bucket_aggs else empty
    # The collected fences ARE the frame the rank-matching join needs —
    # rebuild it as literals so the final plan never re-runs the fence
    # subtree (which would cost a second full input scan).
    fence_lit = literal_frame(spark, fences, fences_df.schema)

    # all-NULL-group pass-through rows (fusion mode) carry NULL fence
    # fields — they exist only for stats_frame() and own no pass-2 bucket
    buckets = {
        (r[g], r["__bkt"], r["__below"]) for r in fences if r["__bkt"] is not None
    }
    if len(buckets) <= _MAX_LITERAL_FENCES:
        in_bucket = F.lit(False)
        for grp, bkt, _below in sorted(buckets, key=lambda t: (str(t[0]), t[1])):
            grp_match = (
                F.col(g).isNull() if grp is None else (F.col(g) == F.lit(grp))
            )
            in_bucket = in_bucket | (
                grp_match
                & (F.col("__v") >= bkt * width)
                & (F.col("__v") < (bkt + 1) * width)
            )
    else:
        # Coarse pushdown envelope; the (group, bucket) join below does the
        # exact per-group pruning.
        lo_b = min(b for _grp, b, _w in buckets)
        hi_b = max(b for _grp, b, _w in buckets)
        in_bucket = (F.col("__v") >= lo_b * width) & (
            F.col("__v") < (hi_b + 1) * width
        )
    bucket_rows = [(grp, bkt, below) for grp, bkt, below in buckets]
    bucket_schema = (
        df.select(g).schema.add("__bkt", "long").add("__below", "long")
    )
    below_df = F.broadcast(literal_frame(spark, bucket_rows, bucket_schema))

    per_value = (
        src.filter(in_bucket)
        .withColumn("__bkt", F.floor(F.col("__v") / width))
        .groupBy(g, "__bkt", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    wv = W.partitionBy(g, "__bkt").orderBy("__v").rowsBetween(
        W.unboundedPreceding, 0
    )
    bd = below_df.select(
        F.col(g).alias("__g2"), F.col("__bkt").alias("__bkt2"), "__below"
    )
    ranked = (
        per_value.withColumn("__within", F.sum("__c").over(wv))
        .join(
            bd,
            F.col(g).eqNullSafe(F.col("__g2"))
            & (F.col("__bkt") == F.col("__bkt2")),
        )
        .drop("__g2", "__bkt2")
        .withColumn("__cum", F.col("__below") + F.col("__within"))
    )

    fl = fence_lit.select(
        F.col(g).alias("__g3"),
        F.col("__bkt").alias("__bkt3"),
        "q",
        "kind",
        "__rank",
        "__k",
    )
    neighbor_vals = (
        ranked.join(
            F.broadcast(fl),
            F.col(g).eqNullSafe(F.col("__g3"))
            & (F.col("__bkt") == F.col("__bkt3")),
        )
        .drop("__g3", "__bkt3")
        .filter(F.col("__cum") >= F.col("__rank"))
        .groupBy(g, "q", "__k")
        .pivot("kind", ["lo", "hi"])
        .agg(F.min("__v"))
    )
    # Spark's own PercentileBase interpolation, replicated operation for
    # operation for bit-identical results: v_lo outright at an integral
    # rank, else the TWO-PRODUCT form (ceil(k)-k)*v_lo + (k-floor(k))*v_hi
    # (NOT v_lo + frac*(v_hi-v_lo), which can differ in the last ulp).
    result = neighbor_vals.select(
        g,
        "q",
        F.when(F.ceil("__k") == F.floor("__k"), F.col("lo"))
        .otherwise(
            (F.ceil("__k") - F.col("__k")) * F.col("lo")
            + (F.col("__k") - F.floor("__k")) * F.col("hi")
        )
        .alias("value"),
    )
    return (result, stats_frame()) if bucket_aggs else result
