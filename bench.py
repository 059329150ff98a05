"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# representative mix: scan+filter, window agg, dedup window, ordered
# windows, grouped topk, math, reshape-ish expressions, plus the
# corpus-pipeline ops (LSH dedup end-to-end, ANN, hash sampling)
HEADLINE = [
    "groupby_agg",
    "filter_date",
    "case_when",
    "get_dupes",
    "groupby_topk",
    "take_first",
    "count_cumulative_unique",
    "ecdf",
    "min_max_scale",
    "clean_names",
    "minhash_lsh_pairs",
    "dedupe_near",
    "cosine_topk",
    "deterministic_sample",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pyjanitor_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs]
    extra = [n for n in qs if n not in set(HEADLINE)]
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once (excluded from timings)
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names + extra:
        best = None
        try:
            for _ in range(2):  # 2 runs; min = steady-state (JIT/codegen warm)
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 4)
        except Exception as e:  # pragma: no cover
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)

    total = round(sum(timings[n] for n in names if timings.get(n, -1) > 0), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # the driver captures only the TAIL of stdout: keep the JSON line
    # SHORT (headline queries only) so it never truncates at the head;
    # full per-query timings go to a side file
    headline_timings = {n: timings[n] for n in names if n in timings}
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as fh:
        json.dump(
            {"metric": "all_queries_wall", "queries": timings, "sf": sf_val}, fh,
            indent=1, sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": headline_timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
