"""Scale-validation bench: the 25 headline queries at the replicated
~sf1 dataset (tools/make_sf1.py), min-of-3 interleaved passes — same
protocol as bench.py but headline-only (the full 145-query registry at
sf1 is a driver-budget matter, not a scaling question).

Prints one JSON line and writes BENCH_LOCAL_r07_sf1.json next to the
repo root when SPARK_GRAFT_BENCH_OUT is unset.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".cache/sf1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from bench import HEADLINE, SPOTLIGHT

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pyjanitor_spark-bench-sf1")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # r14: SPOTLIGHT rides the sf1 run too (timed, reported in
    # queries; NOT in value — same comparability rule as bench.py)
    names = [n for n in HEADLINE if n in qs]
    extra = [n for n in SPOTLIGHT if n in qs and n not in names]
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {n: [] for n in names + extra}
    for _pass in range(3):
        for name in names + extra:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(time.perf_counter() - t0)
    timings = {n: round(min(ts), 4) for n, ts in runs.items()}
    out = {
        "metric": "headline_total_wall",
        "value": round(sum(timings[n] for n in names), 4),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "note": "replicated sf1 (tools/make_sf1.py, 10x key-shifted sf0.1)",
    }
    dest = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "BENCH_LOCAL_r07_sf1.json")
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
