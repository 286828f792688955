"""Skew-handling join utilities for 100 TB-scale key skew.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
`salted_join` is the explicit variant for catastrophic single-key skew where
you control the plan: replicate the small side R times, salt the big side's
key with hash(row) % R, and join on (key, salt) — the hot key's rows spread
over R tasks instead of one straggler."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` with `small` on `on`, salted across `salt_buckets`.
    Result is identical to big.join(small, on, how); only the physical
    distribution changes. `how` must not duplicate or drop by salt —
    inner/left are safe (small side is replicated exactly once per salt)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # pmod, not abs(hash) % n: xxhash64 can return Long.MIN_VALUE, whose abs
    # stays negative (or throws under ANSI), which would yield a salt with no
    # replicated small-side partner — a silent row drop. pmod is always >= 0.
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    salted_small = small.withColumn("_salt", salts)
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
