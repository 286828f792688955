"""The versioned-table layer: ACID transactions, MVCC snapshot reads,
tombstone deletes, checkpoint/compaction, and crash recovery on top of
immutable Parquet + an atomic JSON commit log — the reference engine's
data-processing semantics (SURVEY.md §1.4, §2A rows 4-29) re-architected for
Spark's immutable-storage execution model."""

from db_core_spark.plans.versioned import (  # noqa: F401
    ConflictError,
    ConflictTimeoutError,
    SnapshotUnavailableError,
    Transaction,
    VersionedTable,
)
from db_core_spark.plans.objects import ObjectStore  # noqa: F401
from db_core_spark.plans.group import Database, GroupTransaction  # noqa: F401
