"""Full-registry scale sweep: every queries() entry at sf0.1 AND ~sf1
(VERDICT r8 task 7 — catch long-tail ops whose constant factors
misbehave an order up; the headline-25 sf1 bench can't see them).

Single pass per query per SF in one session (a scaling check, not a
benchmark — noise tolerance is the 2x budget, not 2%).  Budget: a
query FLAGS when t_sf1 > 2 * 10 * t_sf0.1 (2x its linearly-extrapolated
sf0.1 time) AND t_sf1 exceeds 5s (sub-5s walls are constant/JVM
dominated and can't flag meaningfully).

Writes BENCH_LOCAL_r09_sf1_full.json: per-query {sf01, sf1, ratio},
plus the flagged list.  Run on an IDLE box.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = os.environ.get("SWEEP_SF01_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SWEEP_SF1_DIR", os.path.join(REPO, ".cache/sf1"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.environ.get(
    "SWEEP_OUT", os.path.join(REPO, "BENCH_LOCAL_r09_sf1_full.json")
)


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pyjanitor_spark-sweep-sf1")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    rows = {}
    for name, fn in qs.items():
        rec = {}
        for key, sf in (("sf01", SF01), ("sf1", SF1)):
            t0 = time.monotonic()
            try:
                df = fn(spark, sf)
                df.write.format("noop").mode("overwrite").save()
                rec[key] = round(time.monotonic() - t0, 4)
            except Exception as e:
                rec[key] = None
                rec[f"{key}_err"] = str(e)[:160]
        if rec.get("sf01") and rec.get("sf1"):
            rec["ratio"] = round(rec["sf1"] / rec["sf01"], 2)
        rows[name] = rec
        print(
            f"{name}: sf0.1={rec.get('sf01')}s sf1={rec.get('sf1')}s "
            f"ratio={rec.get('ratio')}",
            flush=True,
        )
    flagged = sorted(
        n
        for n, r in rows.items()
        if r.get("ratio") is not None and r["ratio"] > 20 and r["sf1"] > 5
    )
    errs = sorted(n for n, r in rows.items() if "sf1_err" in r or "sf01_err" in r)
    out = {
        "metric": "registry_scale_sweep",
        "sf_pair": [0.1, 1.0],
        "budget": "sf1 <= 2 * 10 * sf0.1 (and sf1 > 5s to flag)",
        "flagged": flagged,
        "errors": errs,
        "queries": rows,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"flagged": flagged, "errors": errs}))


if __name__ == "__main__":
    main()
