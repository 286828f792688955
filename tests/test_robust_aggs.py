"""Round-6 robust-statistics / mixing operators: the two-phase per-source
cap must EQUAL the naive global window, the histogram quantile sketch must
sit within one bin width of the exact quantile, and the winsorized mean
must be bracketed by construction."""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from db_core_spark.queries.aggregates import (
    agg_histogram_quantile_sketch,
    agg_winsorized_mean,
)
from db_core_spark.queries.sampling import source_mix_rebalance
from db_core_spark.tables import table
from tests.conftest import SF_MED, SF_SMALL


def test_source_mix_two_phase_equals_naive_window(spark):
    """The prefix-filter + deficiency-fallback pool must reproduce the naive
    'rank everything' result exactly — on both fixture scales (sf0.001 has
    tiny sources that exercise the keep_all fallback)."""
    for sf in (SF_SMALL, SF_MED):
        got = {
            (r.doc_id, r.source, r.rk) for r in source_mix_rebalance(spark, sf).collect()
        }
        d = table(spark, sf, "documents")
        hkey = F.md5(F.col("doc_id").cast("string"))
        w = W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
        naive = {
            (r.doc_id, r.source, r.rk)
            for r in d.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 30)
            .select("doc_id", "source", "rk")
            .collect()
        }
        assert got == naive


def test_source_mix_caps_every_source(spark):
    rows = source_mix_rebalance(spark, SF_MED).collect()
    per_src = {}
    for r in rows:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert per_src and max(per_src.values()) <= 30
    # ranks are 1..n_kept per source with no gaps
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.rk)
    for src, rks in by_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src


def test_histogram_sketch_within_one_bin_of_exact(spark):
    li = table(spark, SF_MED, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    ).collect()[0]
    bin_width = (stats.mx - stats.mn) / 256.0
    exact = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
    ).collect()[0]
    got = {r.q: r.est_q for r in agg_histogram_quantile_sketch(spark, SF_MED).collect()}
    assert set(got) == {0.5, 0.9, 0.99}
    for q, ex in ((0.5, exact.p50), (0.9, exact.p90), (0.99, exact.p99)):
        assert abs(got[q] - ex) <= bin_width, (q, got[q], ex, bin_width)


def test_winsorized_mean_brackets_raw_mean(spark):
    rows = agg_winsorized_mean(spark, SF_MED).collect()
    assert rows
    for r in rows:
        # clipping a two-sided 5% tail keeps the mean within the fences and
        # clips ~5% of rows on each side (exact counts depend on ties)
        assert r.n_clip_lo + r.n_clip_hi < r.n
        assert r.n_clip_lo >= 1 and r.n_clip_hi >= 1
        # winsorized mean moves toward the center, never outside raw extremes
        assert abs(r.mean_winsor - r.mean_raw) < (r.mean_raw * 0.5)


def test_kmeans_lloyd_guarantee_and_determinism(spark):
    """Lloyd's invariant: inertia (measured on pre-update centroids) never
    increases; the run is deterministic; every vector lands in a cluster."""
    from db_core_spark.queries.vectors import kmeans_lloyd, to_double
    from db_core_spark.registry import all_queries

    vecs = table(spark, SF_MED, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("vec")
    )
    n = vecs.count()
    a1, h1 = kmeans_lloyd(vecs, k=8, iters=4)
    # tolerance: d2 values and centroids are q6-quantized each round (engine
    # portability); each round's inertia sum carries up to n * 5e-7 of
    # per-vector quantization noise plus the n_c*||centroid delta||^2 term,
    # so the bound must SCALE WITH n, not be a constant
    tol = n * 1e-6
    assert all(h1[i + 1] <= h1[i] + tol for i in range(len(h1) - 1)), h1
    assert h1[0] > h1[-1]  # it actually improved
    assert a1.count() == n
    a2, h2 = kmeans_lloyd(vecs, k=8, iters=4)
    assert h1 == h2
    assert {(r.vec_id, r.cluster) for r in a1.collect()} == {
        (r.vec_id, r.cluster) for r in a2.collect()
    }
    rows = all_queries()["embedding_kmeans_lloyd"].fn(spark, SF_MED).collect()
    assert sum(r.n_vecs for r in rows) == n and len(rows) == 8


def test_percentile_approx_error_within_rank_bound(spark):
    """GK sketch guarantee: the approx quantile's rank error is <= n/accuracy.
    Verify by value: the approx answer must lie between the exact quantiles
    at q -/+ 1/accuracy."""
    from db_core_spark.registry import all_queries

    li = table(spark, SF_MED, "lineitem")
    rows = all_queries()["agg_percentile_approx_error"].fn(spark, SF_MED).collect()
    assert rows
    eps = 1.0 / 1000
    for r in rows:
        for q, approx in ((0.5, r.approx_p50), (0.99, r.approx_p99)):
            lo, hi = max(0.0, q - eps), min(1.0, q + eps)
            bounds = (
                li.filter(F.col("l_returnflag") == r.l_returnflag)
                .agg(
                    F.percentile("l_extendedprice", lo).alias("lo"),
                    F.percentile("l_extendedprice", hi).alias("hi"),
                )
                .collect()[0]
            )
            assert bounds.lo - 1e-4 <= approx <= bounds.hi + 1e-4, (
                r.l_returnflag, q, approx, bounds.lo, bounds.hi,
            )


def test_ivf_recall_sweep_monotone(spark):
    """More probes must never hurt: recall@5 non-decreasing and candidate
    volume strictly increasing in nprobe; the curve must actually climb."""
    from db_core_spark.registry import all_queries

    rows = sorted(
        all_queries()["ann_ivf_recall_sweep"].fn(spark, SF_MED).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    recalls = [r.recall5 for r in rows]
    cands = [r.n_candidates for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert all(b > a for a, b in zip(cands, cands[1:])), cands
    assert recalls[-1] > recalls[0]
    assert 0 < recalls[0] and recalls[-1] <= 1.0


def test_hll_datasketch_estimates_within_bounds(spark):
    from db_core_spark.registry import all_queries

    rows = all_queries()["agg_hll_datasketch_union"].fn(spark, SF_MED).collect()
    per = [r for r in rows if r.scope != "union"]
    union = [r for r in rows if r.scope == "union"]
    assert per and len(union) == 1
    for r in per:
        assert abs(r.est_distinct - r.exact_distinct) / r.exact_distinct < 0.05, r
    global_exact = (
        table(spark, SF_MED, "lineitem").select("l_partkey").distinct().count()
    )
    assert abs(union[0].est_distinct - global_exact) / global_exact < 0.05


def test_logreg_train_convergence_and_determinism(spark):
    """Full-batch GD on the convex multinomial objective: loss strictly
    decreases at the tuned rate, replay is bit-deterministic, and final
    train accuracy beats the 10-class prior by >2x (the fixture's labels
    genuinely correlate with the embeddings)."""
    from db_core_spark.queries.vectors import logreg_train, to_double

    vecs = table(spark, SF_MED, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("vec"), "label"
    )
    w1, h1 = logreg_train(vecs, iters=6)
    losses = [l for _, l, _ in h1]
    assert all(losses[i + 1] < losses[i] for i in range(len(losses) - 1)), h1
    w2, h2 = logreg_train(vecs, iters=6)
    assert h1 == h2 and w1 == w2
    _, hist12 = logreg_train(vecs, iters=12)
    assert hist12[-1][2] > 0.25, hist12[-1]


def test_covariance_sketch_matches_numpy_and_whitening(spark):
    """One-pass distributed covariance == numpy direct computation; the
    PCA query's empirical projected variance reproduces each eigenvalue
    (whitened_var ~ 1) and eigenvalues come out sorted descending."""
    import numpy as np

    from db_core_spark.queries.vectors import covariance_sketch, to_double
    from db_core_spark.registry import all_queries

    vecs = table(spark, SF_SMALL, "embeddings").select(
        to_double(F.col("embedding")).alias("vec")
    )
    n, mu, C = covariance_sketch(vecs)
    X = np.array([r.vec for r in vecs.collect()])
    assert n == X.shape[0]
    assert np.allclose(mu, X.mean(0), atol=1e-9)
    assert np.allclose(C, np.cov(X.T, bias=True), atol=1e-9)
    rows = (
        all_queries()["embedding_pca_whitening"].fn(spark, SF_SMALL).collect()
    )
    assert len(rows) == 8
    eigs = [r.eigenvalue for r in rows]
    assert eigs == sorted(eigs, reverse=True)
    for r in rows:
        assert abs(r.whitened_var - 1.0) < 1e-3, r


def test_mahalanobis_outliers_match_numpy(spark):
    """Distributed Mahalanobis scores == direct numpy computation; median
    score sits near the dimensionality (the chi-square location for
    roughly gaussian data); top-k ordering correct."""
    import numpy as np

    from db_core_spark.queries.vectors import to_double
    from db_core_spark.registry import all_queries

    rows = (
        all_queries()["embedding_outliers_mahalanobis"]
        .fn(spark, SF_SMALL)
        .collect()
    )
    assert len(rows) == 20
    e = table(spark, SF_SMALL, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("vec")
    )
    data = {r.vec_id: np.array(r.vec) for r in e.collect()}
    X = np.array(list(data.values()))
    mu = X.mean(0)
    C = np.cov(X.T, bias=True) + 1e-6 * np.eye(X.shape[1])
    Sinv = np.linalg.inv(C)
    d2 = {
        vid: float((v - mu) @ Sinv @ (v - mu)) for vid, v in data.items()
    }
    for r in rows:
        assert abs(r.maha_sq - round(d2[r.vec_id], 6)) < 1e-4, r
    top = sorted(d2, key=lambda k: (-d2[k], k))[:20]
    assert [r.vec_id for r in sorted(rows, key=lambda r: r.rk)] == top
    med = float(np.median(list(d2.values())))
    assert X.shape[1] * 0.5 < med < X.shape[1] * 1.5


def test_weighted_median_bucketed_equals_naive_window(spark):
    """The bucketed two-pass weighted median (r7 continuation: per-bucket
    weight aggregate + <=G-row fence collect + pushed-down re-scan of ONLY
    the crossing bucket) must EQUAL the naive one-window formulation —
    cumulative quantity over price per flag, first row reaching half the
    total — value for value at sf0.001."""
    from db_core_spark.queries.aggregates import agg_weighted_median

    got = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in agg_weighted_median(spark, SF_SMALL).collect()
    }
    li = table(spark, SF_SMALL, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(
        W.unboundedPreceding, 0
    )
    naive = (
        li.select("l_returnflag", "l_extendedprice", "l_quantity")
        .withColumn("cw", F.sum("l_quantity").over(w))
        .withColumn("tw", F.sum("l_quantity").over(W.partitionBy("l_returnflag")))
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("weighted_median"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
    )
    want = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in naive.collect()
    }
    assert got == want and len(got) == 3


def test_weighted_median_empty_input_keeps_schema(spark, tmp_path):
    """Zero-row input: the fence collect returns no groups, the literal
    filter degenerates to lit(False), and the result is an EMPTY frame with
    the full output schema (no error from an empty fence set)."""
    from db_core_spark.queries.aggregates import agg_weighted_median

    li = table(spark, SF_SMALL, "lineitem")
    empty_dir = tmp_path / "empty"
    li.limit(0).write.parquet(str(empty_dir / "lineitem.parquet"))
    out = agg_weighted_median(spark, str(empty_dir))
    assert out.columns == ["l_returnflag", "weighted_median", "total_weight"]
    assert out.count() == 0


def test_weighted_median_null_group_key_survives_both_passes(spark, tmp_path):
    """A NULL group key must flow through the two-pass plan intact (r8
    verdict #4 / r9 fix): the pass-2 fence predicate and the fence join
    match with eqNullSafe, so the NULL-keyed group gets the same answer
    the naive one-window formulation gives it — plain-equality matching
    would silently DROP the group between passes (fence row collected,
    zero fact rows matched back)."""
    from db_core_spark.queries.aggregates import agg_weighted_median

    li = table(spark, SF_SMALL, "lineitem")
    # re-key ~a third of the rows to a NULL flag, deterministically
    nulled = li.select(
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        "l_extendedprice",
        "l_quantity",
    )
    null_dir = tmp_path / "nullflag"
    nulled.write.parquet(str(null_dir / "lineitem.parquet"))
    got = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in agg_weighted_median(spark, str(null_dir)).collect()
    }
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice").rowsBetween(
        W.unboundedPreceding, 0
    )
    naive = (
        nulled.withColumn("cw", F.sum("l_quantity").over(w))
        .withColumn("tw", F.sum("l_quantity").over(W.partitionBy("l_returnflag")))
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("weighted_median"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
    )
    want = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in naive.collect()
    }
    assert None in got, "NULL group dropped between passes"
    assert got == want and len(got) == 4


def test_kmeans_arrow_assignment_tie_picks_lowest_cluster(spark):
    """r10: the Arrow assignment kernel must keep the struct-min tie rule —
    a vector exactly equidistant (after q6 quantization) to two centroids
    lands in the LOWER cluster id (numpy argmin first-index over id-sorted
    centroids == the retired struct(d2, cluster) min == the oracle's
    ROW_NUMBER tiebreak)."""
    from db_core_spark.queries.vectors import kmeans_lloyd

    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (31, [2.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, vec array<double>",
    )
    # seeds (vec_id % 31 == 0, ordered): cluster 0 = [0,0], cluster 1 = [2,0];
    # the two midpoint vectors tie at d2 = 1.0 against both
    assigned, _ = kmeans_lloyd(vecs, k=2, iters=1)
    got = {r.vec_id: (r.cluster, r.d2) for r in assigned.collect()}
    assert got[1] == (0, 1.0) and got[2] == (0, 1.0), got
    assert got[0][0] == 0 and got[31][0] == 1, got
