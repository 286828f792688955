"""Composite operators Spark lacks natively, built from DataFrame primitives
(preference order per the build contract: composition > applyInPandas >
mapPartitions)."""

from db_core_spark.operators.asof import asof_join  # noqa: F401
from db_core_spark.operators.multimodal import decode_binary_features  # noqa: F401
