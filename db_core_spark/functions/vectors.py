"""Vector kernels for similarity search over array<float> embedding columns.

All JVM-side higher-order functions (zip_with / aggregate) in double
precision — no UDF, no collect. For 100 TB-scale ANN, pair these with the
LSH/IVF blocking in queries/vectors.py so candidate generation is an
equi-join on bucket ids instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential fold — deterministic
    summation order, bit-stable across engines in double precision)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
