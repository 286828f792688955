"""Deterministic sampling / dataset-split operators for training-data
pipelines. Goal-derived (BASELINE.json north star — absent in the reference,
SURVEY.md §2C: db-core has no relational operators).

All sampling here is HASH-BASED, not RNG-based: bucket(id) = first 4 hex
digits of md5(id) -> int in [0, 65536) -> percent bucket. Reproducible
across runs, engines (same md5 on Spark and DuckDB), cluster sizes, and
data re-partitioning — the property a 100 TB training pipeline needs so a
re-run selects the SAME sample (RNG-based `df.sample` depends on partition
layout). The filter is a plain codegen'd expression on the scan, so a 10%
sample reads-and-drops at full scan speed with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from db_core_spark.registry import query
from db_core_spark.tables import table


def hash_pct(id_col: F.Column) -> F.Column:
    """Deterministic percent bucket in [0, 100): md5 of the stringified id,
    top 16 bits, scaled. Engine-portable (Spark `conv` == DuckDB hex cast)."""
    h16 = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")
    return (h16 * 100) / 65536  # float percent, compare with integer cutoffs


_HASH_PCT_SQL = "(CAST(('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 4)) AS INT) * 100) / 65536"


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_HASH_PCT_SQL.format(id='doc_id')} < 10
    """,
    category="sampling",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% reproducible sample of documents by id-hash bucket. The
    predicate is pure row-local expression — no shuffle, no state, and the
    same rows are selected no matter how the table is partitioned."""
    d = table(spark, sf_dir, "documents")
    return d.filter(hash_pct(F.col("doc_id")) < 10).select("doc_id", "lang", "source")


@query(
    "train_test_split_stats",
    oracle=f"""
    SELECT CASE WHEN {_HASH_PCT_SQL.format(id='doc_id')} < 90
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY 1
    """,
    category="sampling",
)
def train_test_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/test split by id-hash with per-split balance stats
    (doc count, mean length, language coverage). Because membership is a
    function of doc_id alone, the split never leaks rows between sides on
    re-runs or after repartitioning — the invariant that matters when the
    corpus is rebuilt incrementally at 100 TB."""
    d = table(spark, sf_dir, "documents")
    split = F.when(hash_pct(F.col("doc_id")) < 90, "train").otherwise("test")
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "sample_stratified_downsample",
    oracle=f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE {_HASH_PCT_SQL.format(id='doc_id')}
          < (CASE WHEN lang = 'en' THEN 25 ELSE 75 END)
    GROUP BY lang
    """,
    category="sampling",
)
def sample_stratified_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: keep ~25% of the majority language (en) and
    ~75% of the rest — the class-rebalancing pass of a training-data mix.
    Per-stratum rates ride in a CASE expression over the SAME hash bucket,
    so strata stay consistent with each other (a doc kept at 25% is also
    kept at any higher rate — nested samples for curriculum scaling)."""
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(25)).otherwise(F.lit(75))
    return (
        d.filter(hash_pct(F.col("doc_id")) < rate)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@query(
    "sample_weighted_topk",
    oracle=f"""
    SELECT doc_id, n_chars, sample_key,
           CAST(ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id) AS INT) AS rnk
    FROM (
      SELECT doc_id, n_chars,
             FLOOR(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        AS INT) + 1) / 65536.0)
                   / n_chars * 1000000 + 0.5) / 1000000 AS sample_key
      FROM documents
      ORDER BY sample_key DESC, doc_id LIMIT 20)
    """,
    category="sampling",
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    each doc draws a deterministic uniform u from its id hash and gets key
    ln(u)/w with weight w = n_chars; the global top-k by key IS a weighted
    sample of size k — longer documents proportionally likelier, yet fully
    reproducible (same u on both engines, any partitioning). The top-k
    plans as TakeOrderedAndProject (per-partition top-k + single merge, no
    global sort shuffle) — the only sane shape for "pick 10k of 10B docs by
    weight" at 100 TB. Keys floor-round to 6 dp so tie order is
    engine-identical."""
    d = table(spark, sf_dir, "documents")
    h16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    u = (h16 + 1) / 65536.0  # uniform in (0, 1], never ln(0)
    key = F.floor(F.log(u) / F.col("n_chars") * 1000000 + 0.5) / 1000000
    top = (
        d.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col("doc_id"))
        .limit(20)
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("sample_key").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w))


@query(
    "source_mix_rebalance",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= 30
    """,
    category="sampling",
)
def source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing cap: keep at most `cap` documents per source, chosen by
    deterministic md5 rank (the per-domain cap every pre-training mixture
    applies so one crawl domain can't dominate the token budget).

    Semantically this is `ROW_NUMBER() OVER (PARTITION BY source ORDER BY
    md5(doc_id)) <= cap` — but a window over the raw table makes every
    source a single sort partition, which at 100 TB (billions of rows per
    domain, ~coarse source cardinality) is the canonical skew trap. Instead:

    1. one hash-aggregate pass counts rows per source (tiny, broadcast);
    2. the scan keeps only rows whose 16-bit md5 prefix falls below
       ``4*cap/n_src`` — a codegen'd filter that cuts each source to ~4*cap
       rows BEFORE any sort. Because the filter thresholds on a PREFIX of
       the rank's own sort key, the true top-`cap` rows all survive
       whenever a source retains >= cap survivors (prefix below threshold
       => full key sorts strictly before any filtered-out row);
    3. sources the prefix filter left deficient (< cap survivors — only
       possible for tiny or pathologically hash-skewed sources) fall back
       to keeping all their rows, restoring exactness unconditionally;
    4. the exact rank window then runs on the ~O(sources*cap) pool.

    The oracle is the naive global window, so the gate proves the
    two-phase plan IS the naive semantics."""
    cap = 30
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    hkey = F.md5(F.col("doc_id").cast("string"))
    h16 = F.conv(F.substring(hkey, 1, 4), 16, 10).cast("int")  # [0, 65536)

    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    thresh = F.least(F.lit(65536).cast("long"), F.ceil(F.lit(4 * cap) * 65536 / F.col("n_src")))
    surv_counts = (
        d.join(F.broadcast(counts), "source")
        .filter(h16 < thresh)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_surv"))
    )
    flags = counts.join(surv_counts, "source", "left").select(
        "source",
        thresh.alias("thresh"),
        (F.coalesce(F.col("n_surv"), F.lit(0)) < cap).alias("keep_all"),
    )
    pool = d.join(F.broadcast(flags), "source").filter(
        F.col("keep_all") | (h16 < F.col("thresh"))
    )

    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id").asc())
    return (
        pool.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source", "rk")
    )


@query(
    "negative_pair_sample",
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    pairs AS (
      SELECT d.doc_id, k.i AS neg_rank,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                                      CAST(k.i AS VARCHAR)), 1, 8)) AS BIGINT)
               % n.n_docs AS raw_neg,
             n.n_docs
      FROM documents d
      CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) k, n),
    fixed AS (
      SELECT doc_id, neg_rank,
             CASE WHEN raw_neg = doc_id THEN (raw_neg + 1) % n_docs
                  ELSE raw_neg END AS neg_doc_id
      FROM pairs)
    SELECT f.doc_id, CAST(f.neg_rank AS INT) AS neg_rank, f.neg_doc_id,
           d2.source AS neg_source, d2.n_chars AS neg_n_chars
    FROM fixed f JOIN documents d2 ON d2.doc_id = f.neg_doc_id
    """,
    category="sampling",
)
def negative_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document gets k=4 pseudo-random negative partners, derived by hashing
    (doc_id, rank) into the contiguous id space — reproducible across runs,
    engines, and partitionings (same md5 both sides), unlike RNG sampling.
    Self-collisions remap to the next id. The gather of the negatives'
    features is a plain equi-join on the sampled id: one shuffle at scale,
    or a bucketed co-located join when the corpus is id-bucketed. The
    explode is a 4x row fan-out BEFORE the join — no cartesian anywhere."""
    k = 4
    d = table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("i").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pairs = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .withColumn("i", F.explode(F.array(*[F.lit(j) for j in range(k)])))
        .withColumn("raw_neg", h32 % F.col("n_docs"))
        .withColumn(
            "neg_doc_id",
            F.when(F.col("raw_neg") == F.col("doc_id"), (F.col("raw_neg") + 1) % F.col("n_docs"))
            .otherwise(F.col("raw_neg")),
        )
    )
    d2 = d.select(
        F.col("doc_id").alias("neg_doc_id"),
        F.col("source").alias("neg_source"),
        F.col("n_chars").alias("neg_n_chars"),
    )
    return pairs.join(d2, "neg_doc_id").select(
        "doc_id", F.col("i").cast("int").alias("neg_rank"), "neg_doc_id", "neg_source", "neg_n_chars"
    )


@query(
    "corpus_mix_temperature",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (
      SELECT SUM(n_tokens) AS tot_tokens,
             SUM(sqrt(n_tokens)) AS tot_temp
      FROM per_src)
    SELECT p.source, p.n_docs, p.n_tokens,
           ROUND(p.n_tokens / t.tot_tokens, 6) AS raw_share,
           ROUND(sqrt(p.n_tokens) / t.tot_temp, 6) AS temp_share,
           ROUND((sqrt(p.n_tokens) / t.tot_temp)
                 / (p.n_tokens / t.tot_tokens), 4) AS oversample_factor
    FROM per_src p CROSS JOIN tot t
    """,
    category="sampling",
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mix reweighting (T=2, i.e. alpha=1/2 as
    in multilingual pre-training: sample source i proportional to
    tokens_i^(1/T) instead of tokens_i), reported as per-source raw vs
    temperature-flattened sampling shares and the oversample factor a
    sampler must apply per epoch. Complements source_mix_rebalance (the
    hard per-source cap): this op computes the TARGET distribution, that
    one enforces a cap row-wise.

    100 TB shape: one map-side-combined hash aggregate over the corpus
    (token counts fold per-partition before the source-keyed exchange);
    the normalization joins a broadcast single-row totals relation against
    the ~|sources| aggregate — the corpus is scanned once and never
    reshuffled."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.sqrt("n_tokens")).alias("tot_temp"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("raw_share"),
        F.round(F.sqrt("n_tokens") / F.col("tot_temp"), 6).alias("temp_share"),
        F.round(
            (F.sqrt("n_tokens") / F.col("tot_temp"))
            / (F.col("n_tokens") / F.col("tot_tokens")),
            4,
        ).alias("oversample_factor"),
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY 1),
    m AS (SELECT MIN(n) AS m FROM sized),
    ranked AS (
      SELECT e.vec_id, e.label,
             row_number() OVER (PARTITION BY e.label
                                ORDER BY md5(CAST(e.vec_id AS VARCHAR)),
                                         e.vec_id) AS rk
      FROM embeddings e)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(vec_id) AS BIGINT) AS min_id,
           CAST(SUM(vec_id) AS BIGINT) AS id_sum
    FROM ranked CROSS JOIN m
    WHERE rk <= m.m
    GROUP BY label
    """,
    category="sampling",
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly the minority
    class's count, members chosen by deterministic md5 rank (same rows on
    any engine/partitioning — the property that keeps a training set
    reproducible across rebuilds). Output summarizes the kept set per
    label; equality of n_kept across rows IS the balance proof the oracle
    pins.

    100 TB shape: the per-label rank window partitions on the label key;
    the minority size is a broadcast scalar. For labels too large to
    sort, the two-phase prefix-threshold trick of source_mix_rebalance
    applies unchanged."""
    e = table(spark, sf_dir, "embeddings")
    sized = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = sized.agg(F.min("n").alias("m"))
    w = W.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = e.select("vec_id", "label").withColumn(
        "rk", F.row_number().over(w)
    )
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("m"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("vec_id").alias("min_id"),
            F.sum("vec_id").alias("id_sum"),
        )
    )
