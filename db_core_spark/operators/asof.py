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
) -> DataFrame:
    """Returns `left` plus `payload_cols` from the as-of matched right row
    (null when no right row precedes the left row's time)."""
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal _t
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    tb = F.col(tie_break).cast("long") if tie_break else F.lit(0).cast("long")
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_side", "_tb")
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
