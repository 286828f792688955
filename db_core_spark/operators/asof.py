"""As-of join (point-in-time join): for each left row, the newest right row
with the same key and right_time <= left_time.

Implementation is the union-sort trick, NOT a per-key pandas merge_asof:
tag both sides, union, and take last_value(right cols, ignorenulls) over a
window ordered by (time, side, tie-break). One shuffle on the key, linear
per-partition work — scales to arbitrarily many right rows per key, whereas
merge_asof-per-group materializes whole groups in Python memory.

Determinism: ties on right_time are broken by the largest tie-break column
(right rows sort before left rows at equal times so an exactly-simultaneous
right row IS visible, matching the <= contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Returns `left` plus `payload_cols` from the as-of matched right row.

    direction="backward" (default): newest right row with
    right_time <= left_time (null when none precedes); ties on right_time
    break toward the LARGEST tie_break.
    direction="forward": earliest right row with right_time >= left_time
    (null when none follows); ties break toward the SMALLEST tie_break.
    Same plan shape either way — one shuffle on the key, a single running
    window pass per partition (the scan direction flips, nothing else)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # the tie-break column orders natively in its own type (string ids order
    # lexically, numerics numerically) — casting to long would NULL out
    # non-numeric tie-breaks and silently lose determinism
    tb_type = right.schema[tie_break].dataType if tie_break else None
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal _t
        (F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)).alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    tb = F.col(tie_break) if tie_break else F.lit(0)
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        order = [F.asc("_t"), F.asc("_side"), F.asc("_tb")]
    else:
        # scan times descending: the running last_value then carries the
        # EARLIEST right row >= left time; desc(_tb) makes the smallest
        # tie-break the last scanned (deterministic winner) at equal times
        order = [F.desc("_t"), F.asc("_side"), F.desc("_tb")]
    w = (
        W.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in payload_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(*lcols, *[F.col(f"_f_{c}").alias(c) for c in payload_cols])
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_break: str | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest-neighbor as-of join (pandas merge_asof direction='nearest'
    parity): for each left row, the right row minimizing
    |right_time - left_time|; equal distances resolve BACKWARD (the earlier
    right row), and exact time ties within a direction follow that
    direction's tie_break rule. With `tolerance_us`, matches farther than
    the tolerance (in microseconds) null out.

    Same scale shape as the directional join: ONE shuffle on the key, then
    two in-partition sorted window passes over the same union (backward scan
    + forward scan) and a per-row distance comparison — never a range
    self-join, never per-key Python. Emits `_asof_dist_us` alongside the
    payload so callers can audit match quality."""
    lcols = left.columns
    tb_type = right.schema[tie_break].dataType if tie_break else None
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    tagged_left = left.select(
        F.col(on).alias("_k"),
        us(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        (F.lit(None).cast(tb_type) if tb_type is not None else F.lit(0)).alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    tb = F.col(tie_break) if tie_break else F.lit(0)
    tagged_right = right.select(
        F.col(on).alias("_k"),
        us(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    wb = (
        W.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc("_tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("_k")
        .orderBy(F.desc("_t"), F.asc("_side"), F.desc("_tb"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    proj = ["*"]
    for c in ["_t", *[f"_p_{c}" for c in payload_cols]]:
        src = F.when(F.col("_side") == 0, F.col(c)).otherwise(F.lit(None))
        proj.append(F.last(src, ignorenulls=True).over(wb).alias(f"_b_{c}"))
        proj.append(F.last(src, ignorenulls=True).over(wf).alias(f"_f_{c}"))
    filled = unioned.select(*proj)
    db_ = F.col("_t") - F.col("_b__t")  # >= 0 when a backward match exists
    df_ = F.col("_f__t") - F.col("_t")  # >= 0 when a forward match exists
    use_back = F.col("_b__t").isNotNull() & (
        F.col("_f__t").isNull() | (db_ <= df_)  # ties resolve backward
    )
    dist = F.when(use_back, db_).otherwise(df_)
    in_tol = (
        F.lit(True) if tolerance_us is None else dist <= F.lit(int(tolerance_us))
    )
    keep = in_tol & (F.col("_b__t").isNotNull() | F.col("_f__t").isNotNull())
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *lcols,
            F.when(keep, dist).alias("_asof_dist_us"),
            *[
                F.when(
                    keep,
                    F.when(use_back, F.col(f"_b__p_{c}")).otherwise(F.col(f"_f__p_{c}")),
                ).alias(c)
                for c in payload_cols
            ],
        )
    )
