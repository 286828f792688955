"""Per-query perf probe (guide §1): isolate queries, time them with the
bench's count() action, capture .explain("formatted"), and optionally pull
per-stage metrics from the UI REST API.

Usage:
    python tools/perf_probe.py [--reps N] [--explain DIR] [--stages] q1 q2 ...

Timing methodology matches bench.py (warm-up at sf0.001 first, best-of-N
count() at $SPARK_GRAFT_SF_DIR) so numbers are comparable; --stages enables
the UI and prints a per-stage breakdown (name, duration, shuffle bytes,
tasks) for the LAST rep of each query so the expensive stage is attributable
to an operator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_core_spark.registry import all_queries  # noqa: E402


def get_spark(stages: bool):
    # mirror db_core_spark.session.get_spark but allow the UI on for --stages
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("perf_probe")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "true" if stages else "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.legacy.parquet.nanosAsLong", "false")
    )
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stage_report(spark, since_stage: int) -> list[dict]:
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.load(r)
    out = []
    for s in data:
        if s["stageId"] < since_stage:
            continue
        dur = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t1 = datetime.strptime(s["completionTime"], fmt)
            dur = (t1 - t0).total_seconds()
        out.append(
            {
                "stage": s["stageId"],
                "dur_s": round(dur, 3) if dur is not None else None,
                "tasks": s["numCompleteTasks"],
                "in_mb": round(s["inputBytes"] / 1e6, 1),
                "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "name": s["name"].split("\n")[0][:80],
            }
        )
    return sorted(out, key=lambda d: d["stage"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write <q>.txt explains")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(args.stages)
    qs = all_queries()
    spark.range(1000).count()

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm:
        for name in args.names:
            try:
                qs[name].fn(spark, warm_dir).count()
            except Exception as e:
                print(f"warmup {name} failed: {e}", file=sys.stderr)

    results = {}
    for name in args.names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(txt)
        best, n = None, 0
        watermark = 0
        for _ in range(args.reps):
            if args.stages:
                done = stage_report(spark, 0)
                watermark = (done[-1]["stage"] + 1) if done else 0
            spark.sparkContext.setJobGroup(f"probe:{name}", name)
            t0 = time.time()
            df = qs[name].fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            njobs = len(
                spark.sparkContext.statusTracker().getJobIdsForGroup(f"probe:{name}")
            )
            spark.sparkContext._jsc.clearJobGroup()
            best = dt if best is None or dt < best else best
            print(f"  {name}: {dt:.3f}s ({n} rows, {njobs} jobs)", file=sys.stderr)
        if best is not None:
            results[name] = round(best, 3)
        if args.stages:
            for s in stage_report(spark, watermark):
                print(
                    f"    st{s['stage']:>4} {s['dur_s'] if s['dur_s'] is not None else '?':>8} "
                    f"tasks={s['tasks']:>3} in={s['in_mb']:>8} shR={s['sh_r_mb']:>7} "
                    f"shW={s['sh_w_mb']:>7}  {s['name']}",
                    file=sys.stderr,
                )
    print(json.dumps({"sf_dir": sf_dir, "best": results}))


if __name__ == "__main__":
    main()
