"""Training-shard export: balanced token-budget shards, a manifest computed
from the written files, digest verifiability, lossless round-trip, and
atomic publish semantics."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from db_core_spark.sources.formats import export_training_shards
from db_core_spark.tables import table
from tests.conftest import SF_SMALL

SHARD_TOKENS = 4096


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    manifest = export_training_shards(spark, docs, out, shard_tokens=SHARD_TOKENS)
    return out, manifest, docs


def test_manifest_matches_source_totals(spark, exported):
    out, manifest, docs = exported
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.col("text"), r"\s+")).cast("long")).alias("t")
    ).collect()[0].t
    assert manifest["total_docs"] == n_docs
    assert manifest["total_tokens"] == n_tokens
    assert manifest["n_shards"] == len(manifest["shards"]) > 1
    # manifest.json on disk equals the returned dict
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest


def test_shards_are_token_balanced(spark, exported):
    out, manifest, docs = exported
    max_doc = docs.select(
        F.max(F.size(F.split(F.col("text"), r"\s+")).cast("long")).alias("m")
    ).collect()[0].m
    # head-to-tail allocation: every shard holds < budget + its boundary doc
    for s in manifest["shards"][:-1]:
        assert s["n_tokens"] <= SHARD_TOKENS + max_doc
        # and is not pathologically empty
        assert s["n_tokens"] > 0
    # shard ids are dense 0..n-1
    assert [s["shard_id"] for s in manifest["shards"]] == list(
        range(manifest["n_shards"])
    )


def test_roundtrip_is_lossless_and_digests_verify(spark, exported):
    out, manifest, docs = exported
    back = spark.read.parquet(out)
    assert back.count() == manifest["total_docs"]
    src = {(r.doc_id, r.text) for r in docs.collect()}
    got = {(r.doc_id, r.text) for r in back.select("doc_id", "text").collect()}
    assert got == src
    # recompute each shard digest from the files and compare to the manifest
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
    recomputed = {
        r.shard_id: r.d
        for r in back.groupBy("shard_id").agg(digest.alias("d")).collect()
    }
    for s in manifest["shards"]:
        assert recomputed[s["shard_id"]] == s["digest"]


def test_publish_is_atomic_and_exclusive(spark, exported, tmp_path):
    out, _manifest, docs = exported
    # no staging leftovers next to the published dir
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if d.startswith("._staging-")]
    # a second export to the same path must refuse, not clobber
    with pytest.raises(OSError):
        export_training_shards(spark, docs, out, shard_tokens=SHARD_TOKENS)
    before = json.load(open(os.path.join(out, "_manifest.json")))
    assert before["total_docs"] > 0  # original export intact


def test_reader_verifies_and_detects_corruption(spark, exported, tmp_path):
    from db_core_spark.sources.formats import read_training_shards

    out, manifest, _docs = exported
    df = read_training_shards(spark, out)
    assert df.count() == manifest["total_docs"]
    # non-export dir refuses
    with pytest.raises(ValueError, match="manifest"):
        read_training_shards(spark, str(tmp_path))
    # corrupt one shard: drop a file's rows by deleting a parquet part
    victim = None
    for root, _d, files in os.walk(out):
        for fn in files:
            if fn.endswith(".parquet") and "shard_id=" in root:
                victim = os.path.join(root, fn)
                break
        if victim:
            break
    os.remove(victim)
    with pytest.raises(ValueError, match="digest"):
        read_training_shards(spark, out)


def test_corpus_pipeline_to_shards_end_to_end(spark, tmp_path):
    """The full training-data path in one test: prepare (normalize, dedup,
    quality-filter, split) -> take the train split -> export token-budgeted
    shards -> re-open through the verifying reader. Counts must agree at
    every boundary."""
    from db_core_spark.queries.analytics import pipeline_corpus_prepare
    from db_core_spark.sources.formats import (
        export_training_shards,
        read_training_shards,
    )

    prepared = pipeline_corpus_prepare(spark, SF_SMALL)
    train_ids = prepared.filter(F.col("split") == "train").select("doc_id")
    n_train = train_ids.count()
    assert n_train > 0
    docs = (
        table(spark, SF_SMALL, "documents")
        .join(train_ids, "doc_id")
        .select("doc_id", "text")
    )
    out = str(tmp_path / "train_shards")
    manifest = export_training_shards(spark, docs, out, shard_tokens=4096)
    assert manifest["total_docs"] == n_train
    back = read_training_shards(spark, out)
    assert back.count() == n_train
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in train_ids.collect()
    }


def test_empty_corpus_refused_loudly_and_leaks_no_staging(spark, tmp_path):
    """Exporting an empty corpus must raise a clear ValueError (not a
    schema-inference failure on an empty staging read) and must leave NO
    ._staging-* directory behind — failures before publish are invisible."""
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType(
            [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
        )
    )
    out = str(tmp_path / "empty_export")
    with pytest.raises(ValueError, match="empty"):
        export_training_shards(spark, empty, out, shard_tokens=128)
    assert not os.path.exists(out)
    assert not [d for d in os.listdir(tmp_path) if d.startswith("._staging-")]


def test_failed_publish_cleans_staging(spark, tmp_path, exported):
    """If the final rename fails (destination already exists), the staging
    dir is removed — a crashed export never leaves half-written shard
    trees for operators to puzzle over."""
    out, _, docs = exported
    with pytest.raises(OSError):
        export_training_shards(spark, docs, out, shard_tokens=SHARD_TOKENS)
    parent = os.path.dirname(out.rstrip("/"))
    assert not [d for d in os.listdir(parent) if d.startswith("._staging-")]
