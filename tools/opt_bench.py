"""Round-13 optimization harness: per-query noop-sink timing + plan dump.

Usage:
    python tools/opt_bench.py [--plans SUFFIX] [--runs N] [name ...]

Times each named query (default: bench.py HEADLINE) with the noop sink
(guide 1.4), labelled via setJobDescription (guide 1.5), and when
--plans SUFFIX is given writes ``plans/<round>/<name>_<SUFFIX>.txt`` with
the ``explain("formatted")`` output (the judge's evidence files).

Same session config as bench.py so timings are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    import __spark_entry__ as entry

    args = sys.argv[1:]
    plans_suffix = None
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        names = list(bench.HEADLINE)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pyjanitor_spark-opt-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("OPT_PLANS_ROUND", "r14"))
    if plans_suffix:
        os.makedirs(plan_dir, exist_ok=True)

    # warm JVM + parquet footers (excluded)
    if runs > 0:
        qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"opt_bench: {name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)

    if plans_suffix:
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plan_dir, f"{name}_{plans_suffix}.txt"), "w") as fh:
                fh.write(plan)

    out = {
        n: {"min": round(min(ts), 4), "all": [round(t, 4) for t in ts]}
        for n, ts in timings.items()
        if ts
    }
    print(json.dumps(out, indent=1))
    total = sum(v["min"] for v in out.values())
    print(f"TOTAL(min-sum): {total:.4f}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
