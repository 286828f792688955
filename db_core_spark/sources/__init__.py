"""Sources & sinks (SURVEY.md §2B row 1): format connectors with explicit
schemas + the atomic-publish sink."""

from db_core_spark.sources.versioned_datasource import (  # noqa: F401
    VersionedDataSource,
    register as register_versioned_format,
)
from db_core_spark.sources.formats import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_atomic,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
