"""Interleaved A/B: r7 grouped-prefix-sum weighted median (old) vs the
bucketed two-pass rewrite (new) at sf0.1 and sf1. Old implementation inlined
here so both run in one session, alternating, best-of-3 each."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from db_core_spark.operators.prefixrank import grouped_running_sum  # noqa: E402
from db_core_spark.queries.aggregates import agg_weighted_median  # noqa: E402
from db_core_spark.session import get_spark  # noqa: E402
from db_core_spark.tables import table  # noqa: E402


def old_impl(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    cum = grouped_running_sum(
        li, ["l_returnflag"], [F.col("l_extendedprice")], "l_quantity", out="cw"
    )
    tot = F.broadcast(li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("tw")))
    return (
        cum.join(tot, "l_returnflag")
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("l_extendedprice"), 2).alias("weighted_median"),
            F.round(F.max("tw"), 2).alias("total_weight"),
        )
    )


def main():
    spark = get_spark("ab-wmedian")
    # codegen warm
    old_impl(spark, "/root/testdata/sf0.001").count()
    agg_weighted_median(spark, "/root/testdata/sf0.001").count()
    for sf_dir in ("/root/testdata/sf0.1", "/tmp/testdata_sf1"):
        best = {"old": 9e9, "new": 9e9}
        vals = {}
        for _ in range(3):
            for label, fn in (("old", old_impl), ("new", agg_weighted_median)):
                t0 = time.time()
                rows = fn(spark, sf_dir).collect()
                best[label] = min(best[label], time.time() - t0)
                vals[label] = sorted(tuple(r) for r in rows)
        assert vals["old"] == vals["new"], (sf_dir, vals)
        print(f"{sf_dir}: old={best['old']:.2f}s new={best['new']:.2f}s values-equal")


if __name__ == "__main__":
    main()
