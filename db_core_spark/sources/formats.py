"""Format connectors: parquet (the default — columnar, predicate pushdown,
page checksums ≈ the reference's block CRC32, datastore.rs:194-203), ORC,
CSV, JSON — always with explicit schemas (schema inference is an extra full
scan at 100 TB and nondeterministic under dirty data), plus an atomic
write-and-publish sink mirroring the reference's flush-on-commit contract
(system/instance.rs:102-111): data is never readable until completely written.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from db_core_spark.operators.litframe import literal_frame
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV requires an explicit schema — never inferSchema in production
    (extra scan + type drift)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "errorifexists", partition_by=None):
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "errorifexists"):
    df.write.mode(mode).json(path)


def write_atomic(df: DataFrame, path: str, fmt: str = "parquet") -> str:
    """All-or-nothing publish: write to a hidden staging dir, then rename to
    the final path. Readers either see the complete dataset or none of it —
    single-writer commit semantics (for multi-writer tables use
    plans.VersionedTable, which layers the commit log on top).
    On object stores the rename becomes a manifest/conditional-put."""
    parent = os.path.dirname(path.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f"._staging-{uuid.uuid4().hex}")
    getattr(df.write.mode("errorifexists"), fmt)(staging)
    try:
        os.rename(staging, path)  # atomic on POSIX; fails if path exists
    except OSError:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise
    return path


def export_training_shards(
    spark,
    docs: DataFrame,
    out_dir: str,
    shard_tokens: int = 32768,
    num_parts: int | None = None,
) -> dict:
    """Export a document corpus as token-budgeted training shards with a
    verifiable manifest — the final materialization step of a pre-training
    data pipeline (each shard feeds one loader worker; balance decides
    training throughput).

    Allocation is the distributed two-pass prefix sum of
    pack_training_sequences_scalable: documents in stable doc_id order lay
    head-to-tail, shard_id = floor(tokens_before / shard_tokens) — pass 1
    collects one token total per range partition (O(partitions) to the
    driver), pass 2 bins locally against broadcast offsets; no global
    window anywhere. Shards write as parquet partitioned by shard_id into
    a staging dir; the manifest (per-shard doc/token counts + a sha256
    digest over the sorted (doc_id, n_tokens) list, recomputed FROM THE
    WRITTEN FILES) is placed inside, and one atomic rename publishes the
    whole dataset — readers see a complete, self-verifying export or
    nothing (manifest-presence = committed; the underscore name keeps parquet readers from scanning it, the write_atomic contract).

    Returns the manifest dict."""
    import hashlib  # noqa: F401  (documented: digests are sha256)
    import json
    import shutil

    from pyspark.sql import Window as W, functions as F

    from db_core_spark.operators.prefixrank import resolve_num_parts

    num_parts = resolve_num_parts(docs, num_parts)
    toks = (
        docs.select(
            "doc_id",
            "text",
            F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(num_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
        # localCheckpoint pins ONE materialization for both actions below:
        # the range partitioner SAMPLES its boundaries per job, so without
        # the pin the totals collect and the shard write could assign a
        # boundary row to different pids — a pid absent from `offsets` is
        # silently dropped by the inner offset join (same hazard the
        # prefixrank helper documents)
        .localCheckpoint(eager=False)
    )
    totals = {
        r.pid: r.total
        for r in toks.groupBy("pid").agg(F.sum("n_tokens").alias("total")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    offset_df = F.broadcast(
        literal_frame(
            spark, [(pid, off) for pid, off in offsets.items()], "pid int, offset long"
        )
    )
    w_local = (
        W.partitionBy("pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    assigned = (
        toks.join(offset_df, "pid")
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("offset") + F.sum("n_tokens").over(w_local) - F.col("n_tokens"))
                / shard_tokens
            ).cast("long"),
        )
        .select("doc_id", "text", "n_tokens", "shard_id")
    )

    if not totals:
        # loud instead of a confusing schema-inference failure on the empty
        # staging read below — an empty export has no consumers anyway
        # (read_training_shards can't open a zero-shard directory either)
        raise ValueError("export_training_shards: corpus is empty, nothing to export")

    parent = os.path.dirname(out_dir.rstrip("/")) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f"._staging-{uuid.uuid4().hex}")
    try:
        return _publish_shards(
            spark, assigned, staging, out_dir, shard_tokens
        )
    except BaseException:
        # ANY failure between staging write and publish must not leak the
        # staging dir (the export is invisible until the rename)
        shutil.rmtree(staging, ignore_errors=True)
        raise


def _publish_shards(spark, assigned, staging, out_dir, shard_tokens) -> dict:
    import json
    import shutil

    from pyspark.sql import functions as F

    assigned.write.partitionBy("shard_id").parquet(staging)

    # manifest is computed from what actually landed on disk, not from the
    # plan — a lost or duplicated row shows up as a digest mismatch
    written = spark.read.parquet(staging)
    digest = F.sha2(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "n_tokens"))),
                lambda s: F.concat_ws(":", s["doc_id"], s["n_tokens"]),
            ),
        ),
        256,
    )
    shard_rows = (
        written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            digest.alias("digest"),
        )
        .collect()
    )
    manifest = {
        "shard_tokens": shard_tokens,
        "n_shards": len(shard_rows),
        "total_docs": sum(r.n_docs for r in shard_rows),
        "total_tokens": sum(r.n_tokens for r in shard_rows),
        "shards": sorted(
            (
                {
                    "shard_id": r.shard_id,
                    "n_docs": r.n_docs,
                    "n_tokens": r.n_tokens,
                    "digest": r.digest,
                }
                for r in shard_rows
            ),
            key=lambda s: s["shard_id"],
        ),
    }
    with open(os.path.join(staging, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    try:
        os.rename(staging, out_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return manifest


def read_training_shards(spark, path: str, verify: bool = True) -> DataFrame:
    """Open a published training-shard export, verifying the manifest before
    any data flows: the shard set on disk must match the manifest exactly
    and (with verify=True) every shard's sha256 digest must recompute from
    the files — a lost, truncated, or duplicated row fails loudly HERE, not
    three days into a training run. The digest check is one bounded
    aggregate over (doc_id, n_tokens) pairs, not a byte re-read of text."""
    import json

    from pyspark.sql import functions as F

    mpath = os.path.join(path, "_manifest.json")
    try:
        with open(mpath) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"{path} has no _manifest.json — not a published shard export "
            "(exports are atomic: a missing manifest means an unpublished or "
            "foreign directory)"
        ) from None
    df = spark.read.parquet(path)
    if verify:
        digest = F.sha2(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "n_tokens"))),
                    lambda s: F.concat_ws(":", s["doc_id"], s["n_tokens"]),
                ),
            ),
            256,
        )
        got = {
            r.shard_id: (r.n_docs, r.n_tokens, r.d)
            for r in df.groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                digest.alias("d"),
            )
            .collect()
        }
        want = {
            s["shard_id"]: (s["n_docs"], s["n_tokens"], s["digest"])
            for s in manifest["shards"]
        }
        if got != want:
            broken = sorted(
                set(got) ^ set(want)
                | {k for k in set(got) & set(want) if got[k] != want[k]}
            )
            raise ValueError(
                f"shard export {path} failed digest verification for shards "
                f"{broken} — data on disk does not match the manifest"
            )
    return df
