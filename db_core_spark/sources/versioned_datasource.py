"""Python DataSource (Spark 4 `pyspark.sql.datasource`) exposing the
VersionedTable commit log as a first-class Spark format:

    spark.dataSource.register(VersionedDataSource)
    spark.read.format("versioned").option("path", p).load()            # snapshot
    spark.read.format("versioned").option("asOfCsn", 3).load()         # time travel
    spark.readStream.format("versioned").option("path", p).load()      # CDC tail

and a transactional batch writer:

    df.write.format("versioned").mode("append").option("path", p).save()

Reference-parity map (citations into /root/reference):
- snapshot reader    <- the MVCC read path, src/storage/block_driver.rs:457-486:
  each partition resolves "newest visible version per key, tombstones hidden"
  for its slice of the key space.
- CDC stream reader  <- tailing the WAL, src/log_mgr/io.rs:254-441: offsets are
  csns; each micro-batch is the fold of manifests in (start_csn, end_csn].
- batch writer       <- group commit, src/system/instance.rs:102-111 +
  src/log_mgr/buf.rs: executors stage parquet parts independently (the
  double-buffered WAL appends), the driver's single `commit()` publishes one
  manifest atomically (flush-on-commit).

Scale design: the snapshot reader parallelizes by hashing the table key into
`numPartitions` buckets; every bucket reads the op files it needs and resolves
versions locally (no global shuffle — the same co-location argument as the
reference's per-object version chains). With a key-bucketed physical layout
each bucket would prune to its own files; here each bucket row-filters after
the (columnar, projected) scan, which is the correct fallback when the layout
is unbucketed. The CDC reader is a SimpleDataSourceStreamReader — increments
are manifest-sized; a partition-planning DataSourceStreamReader is the
scale-out upgrade path and keeps the same offset contract.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql import types as T

META_FIELDS = [
    T.StructField("_csn", T.LongType()),
    T.StructField("_change", T.StringType()),
]


def _load_meta(path: str) -> tuple[list[str], T.StructType]:
    meta = json.load(open(os.path.join(path, "_meta.json")))
    return meta["key_cols"], T.StructType.fromJson(meta["schema"])


def _manifests(path: str) -> list[dict]:
    log_dir = os.path.join(path, "_commitlog")
    out = []
    for name in os.listdir(log_dir):
        if name.endswith(".json") and not name.startswith("_tmp"):
            with open(os.path.join(log_dir, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["csn"])


def _committed_ops(path: str, as_of: int | None) -> list[dict]:
    """(dir, csn, opseq, kind, checkpoint) visible at as_of, starting from
    the newest checkpoint <= as_of — same resolution as
    VersionedTable._committed_ops (kept file-format compatible)."""
    manifests = _manifests(path)
    if as_of is not None:
        manifests = [m for m in manifests if m["csn"] <= as_of]
    ckpts = [m for m in manifests if m.get("type") == "checkpoint"]
    base = max(ckpts, key=lambda m: m["csn"]) if ckpts else None
    ops = []
    if base is not None:
        ops.append(
            {"dir": base["dir"], "csn": -1, "opseq": -1, "kind": "checkpoint",
             "checkpoint": True}
        )
    floor_csn = base["csn"] if base is not None else 0
    for m in manifests:
        if m.get("type") == "checkpoint" or (base is not None and m["csn"] <= floor_csn):
            continue
        for op in m["ops"]:
            ops.append(
                {"dir": op["dir"], "csn": m["csn"], "opseq": op["opseq"],
                 "kind": op["kind"], "checkpoint": False}
            )
    return ops


def _op_table(op: dict, data_cols: list[str]):
    """Load one op dir as a pyarrow table with _csn/_opseq/_deleted attached.
    Op part files physically carry (data cols, _deleted, _opseq); checkpoints
    carry _csn too. Column projection happens at the parquet reader."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    want = data_cols + ["_deleted", "_opseq"] + (["_csn"] if op["checkpoint"] else [])
    tbl = pads.dataset(op["dir"], format="parquet").to_table(columns=want)
    if not op["checkpoint"]:
        tbl = tbl.append_column(
            "_csn", pa.array([op["csn"]] * len(tbl), type=pa.int64())
        )
    return tbl


@dataclass
class KeyBucketPartition(InputPartition):
    bucket: int
    num_buckets: int


class VersionedSnapshotReader(DataSourceReader):
    """Batch reader: MVCC snapshot at asOfCsn (default: latest). The op list
    is resolved once at planning time (driver) so every task folds the same
    manifest set — a consistent read even while writers keep committing."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        as_of = options.get("asofcsn")
        self.as_of = int(as_of) if as_of is not None else None
        self.num_buckets = int(options.get("numpartitions", 8))
        self.key_cols, self.data_schema = _load_meta(self.path)
        self.ops = _committed_ops(self.path, self.as_of)

    def partitions(self):
        return [
            KeyBucketPartition(b, self.num_buckets) for b in range(self.num_buckets)
        ]

    def read(self, partition: KeyBucketPartition):
        import pandas as pd
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        data_cols = [f.name for f in self.data_schema.fields]
        if not self.ops:
            return
        tables = [_op_table(op, data_cols) for op in self.ops]
        tbl = pa.concat_tables(tables, promote_options="permissive")
        pdf = tbl.to_pandas()
        # deterministic key-hash bucketing (stable across workers/runs —
        # hash_pandas_object is seedless, unlike Python's str hash)
        bucket = (
            pd.util.hash_pandas_object(
                pdf[self.key_cols].astype(str).agg("\x00".join, axis=1), index=False
            )
            % partition.num_buckets
        )
        pdf = pdf[bucket == partition.bucket]
        if len(pdf) == 0:
            return
        # visibility rule (block_driver.rs:457-486): newest (_csn,_opseq)
        # version per key wins; tombstone winners hide the key
        pdf = (
            pdf.sort_values(["_csn", "_opseq"], ascending=False, kind="mergesort")
            .drop_duplicates(self.key_cols, keep="first")
        )
        pdf = pdf[~pdf["_deleted"]][data_cols]
        out_schema = to_arrow_schema(self.data_schema)
        out = pa.Table.from_pandas(pdf, preserve_index=False).select(data_cols)
        yield from out.cast(out_schema).to_batches()


class VersionedChangeStreamReader(SimpleDataSourceStreamReader):
    """CDC tail of the commit log: offsets are csns; a micro-batch is every
    change row published in (start_csn, end_csn], stamped with its csn and
    change kind. WAL-tailing parity: src/log_mgr/io.rs:254-441."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.key_cols, self.data_schema = _load_meta(self.path)
        start = options.get("startingcsn")
        self.start_csn = int(start) if start is not None else 0

    def initialOffset(self) -> dict:
        return {"csn": self.start_csn}

    def _changes(self, lo: int, hi: int) -> Iterator[Tuple]:
        data_cols = [f.name for f in self.data_schema.fields]
        for m in _manifests(self.path):
            if m.get("type") == "checkpoint" or not (lo < m["csn"] <= hi):
                continue
            for op in m["ops"]:
                tbl = _op_table(
                    {**op, "csn": m["csn"], "checkpoint": False}, data_cols
                )
                kind = op["kind"]
                for row in tbl.select(data_cols).to_pylist():
                    yield tuple(row[c] for c in data_cols) + (m["csn"], kind)

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        manifests = [m for m in _manifests(self.path) if m.get("type") != "checkpoint"]
        end = max([m["csn"] for m in manifests], default=start["csn"])
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator; increments are manifest-sized anyway
        return list(self._changes(start["csn"], end)), {"csn": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return list(self._changes(start["csn"], end["csn"]))


@dataclass
class StagedPart(WriterCommitMessage):
    file_path: str
    n_rows: int
    # canonical-string write-set of this part; None = too large to track
    keys: list | None = None


class VersionedAppendWriter(DataSourceWriter):
    """Transactional bulk append: executors stage independent parquet parts
    under one tsn (the WAL-buffer appends); the driver's commit() publishes
    ONE manifest for all of them (group commit, instance.rs:102-111). A
    failed job leaves only unpublished files — invisible by construction.

    Conflict protection is symmetric with Transaction (tran_mgr parity):
    each part enumerates its distinct key set (degrading to 'conflicts with
    anything' above MAX_TRACKED_KEYS, same rule as Transaction.commit);
    commit() aborts with ConflictError when any manifest published after the
    writer was planned overlaps — so two concurrent bulk appends upserting
    the same keys can no longer both win (no silent last-csn lost update)."""

    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.key_cols, self.data_schema = _load_meta(self.path)
        if [f.name for f in schema.fields] != [f.name for f in self.data_schema.fields]:
            raise ValueError(
                f"schema mismatch: table has {self.data_schema.fieldNames()}, "
                f"write has {schema.fieldNames()}"
            )
        self.tsn = "t" + uuid.uuid4().hex[:12]
        self.op_dir = os.path.join(self.path, "data", f"tsn={self.tsn}", "opseq=0")
        # snapshot pin at plan time: manifests committed after this are
        # 'concurrent' for the optimistic conflict check in commit()
        csns = [m["csn"] for m in _manifests(self.path)]
        self.start_csn = max(csns) if csns else 0

    def write(self, iterator) -> StagedPart:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        data_cols = [f.name for f in self.data_schema.fields]
        rows = [tuple(r) for r in iterator]
        os.makedirs(self.op_dir, exist_ok=True)
        fname = os.path.join(self.op_dir, f"part-{uuid.uuid4().hex}.parquet")
        pdf = pd.DataFrame(rows, columns=data_cols)
        pdf["_deleted"] = False
        pdf["_opseq"] = 0
        arrow_schema = to_arrow_schema(
            T.StructType(
                list(self.data_schema.fields)
                + [
                    T.StructField("_deleted", T.BooleanType()),
                    T.StructField("_opseq", T.LongType()),
                ]
            )
        )
        tbl = pa.Table.from_pandas(pdf, preserve_index=False).cast(arrow_schema)
        pq.write_table(tbl, fname)
        # canonical string form of the part's write-set (same encoding as
        # Transaction.commit so the two writer kinds compare like-for-like);
        # arrow to_pylist yields python-native values (datetime, int, str)
        # matching what Spark Rows stringify to on the txn side
        cap = 100_000  # VersionedTable.MAX_TRACKED_KEYS (no driver-side import here)
        key_tbl = tbl.select(self.key_cols)
        part_keys: list | None = list(
            {tuple(str(r[c]) for c in self.key_cols) for r in key_tbl.to_pylist()}
        )
        if len(part_keys) > cap:
            part_keys = None
        return StagedPart(file_path=fname, n_rows=len(rows), keys=part_keys)

    def commit(self, messages) -> None:
        from db_core_spark.plans.versioned import ConflictError, VersionedTable, publish_manifest

        n = sum(m.n_rows for m in messages if m is not None)
        my_keys: set | None = set()
        for m in messages:
            if m is None:
                continue
            if m.keys is None:
                my_keys = None
                break
            my_keys.update(tuple(k) for k in m.keys)
        if my_keys is not None and len(my_keys) > VersionedTable.MAX_TRACKED_KEYS:
            my_keys = None  # degrade, same rule as Transaction.commit
        log_dir = os.path.join(self.path, "_commitlog")
        manifest_ops = [{"dir": self.op_dir, "opseq": 0, "kind": "upsert"}]
        for _ in range(50):
            csns = [m["csn"] for m in _manifests(self.path)]
            candidate = (max(csns) if csns else 0) + 1
            # optimistic conflict check vs everything committed since plan
            # time (mirrors Transaction._check_conflicts)
            for m in _manifests(self.path):
                if m.get("type") == "checkpoint" or not (self.start_csn < m["csn"] < candidate):
                    continue
                theirs = m.get("write_keys")
                if my_keys is None or theirs is None:
                    raise ConflictError(
                        f"bulk append {self.tsn}: concurrent commit csn={m['csn']} "
                        "with untracked write-set"
                    )
                if my_keys & {tuple(k) for k in theirs}:
                    raise ConflictError(
                        f"bulk append {self.tsn}: write-set overlaps concurrent "
                        f"commit csn={m['csn']}"
                    )
            manifest = {
                "csn": candidate,
                "tsn": self.tsn,
                "ops": manifest_ops,
                "write_keys": sorted(my_keys) if my_keys is not None else None,
                "rows": n,
                "ts": time.time(),
            }
            if publish_manifest(log_dir, f"{candidate:010d}.json", manifest):
                return
        raise RuntimeError("could not claim a csn (too much commit contention)")

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.dirname(self.op_dir), ignore_errors=True)


class VersionedDataSource(DataSource):
    """format("versioned"): batch snapshot / time-travel reads, CDC streaming
    reads, and transactional appends over a VersionedTable directory."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def _mode(self) -> str:
        return self.options.get("readchanges", "false").lower()

    def schema(self):
        _, data_schema = _load_meta(self.options["path"])
        if self._mode() == "true":
            return T.StructType(list(data_schema.fields) + META_FIELDS)
        return data_schema

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return VersionedSnapshotReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise NotImplementedError(
                "mode('overwrite') unsupported; use VersionedTable txns for "
                "update/delete semantics, or append + checkpoint/vacuum"
            )
        return VersionedAppendWriter(schema, dict(self.options))

    def simpleStreamReader(self, schema: T.StructType):
        if self._mode() != "true":
            raise ValueError(
                "streaming reads are CDC reads: pass "
                ".option('readChanges', 'true') so the schema carries "
                "(_csn, _change)"
            )
        return VersionedChangeStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotently register format('versioned') on a session."""
    spark.dataSource.register(VersionedDataSource)
