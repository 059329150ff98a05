"""Per-query physical-plan fingerprints (VERDICT r8 task 6).

Builds every headline query (bench.py HEADLINE) at sf0.001, normalizes
the executed-plan string (exprIds ``#123``, plan ids, table paths and
statistics vary run-to-run and across SFs; operator tree + strategies
do not) and emits one JSON object ``{query: sha256[:16]}``.

Purpose: triage driver-bench noise mechanically.  A flagged query whose
fingerprint is UNCHANGED round-over-round is box noise; a changed
fingerprint means the plan actually moved and deserves a look
(round 8's get_dupes 1.49x "regression" took a judge adjudication to
call — this makes it a diff).

Usage: python tools/plan_fingerprints.py [--all] > PLANS_rNN.json
  --all fingerprints every registry entry, not just the headline set.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+[A-Z]*", "#", plan)  # exprIds
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    plan = re.sub(r"\[id=#?\d*\]", "[id=]", plan)
    plan = re.sub(r"file:[^\],\s]+", "file:", plan)  # paths embed the SF dir
    plan = re.sub(r"Statistics\([^)]*\)", "Statistics()", plan)
    plan = re.sub(r"size=[\d.]+ \w+", "size=", plan)
    plan = re.sub(r"rowCount=\d+", "rowCount=", plan)
    # localCheckpoint RDD names/ids
    plan = re.sub(r"ExistingRDD\[[^\]]*\]", "ExistingRDD[]", plan)
    plan = re.sub(r"Scan ExistingRDD\S*", "Scan ExistingRDD", plan)
    # higher-order-function lambda variables carry a session-global
    # monotonic counter (lambda x_5# vs lambda x_13#) — the reason
    # fingerprints looked order-dependent before r10
    plan = re.sub(r"lambda (\w+?)_\d+#", r"lambda \1_#", plan)
    return plan


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-fingerprints")
        .config("spark.sql.shuffle.partitions", "8")
        # AQE re-plans at runtime from observed sizes — disable so the
        # fingerprint reflects the static strategy, not sf0.001 stats
        .config("spark.sql.adaptive.enabled", "false")
        # FileScan metadata (DataFilters/PushedFilters) truncates at 100
        # chars by default; the cut point shifts with the width of the
        # session-global lambda counter, making truncated prefixes
        # order-dependent — print them whole instead
        .config("spark.sql.maxMetadataStringLength", "100000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = list(qs) if "--all" in sys.argv else bench.HEADLINE
    out = {}
    for name in names:
        try:
            df = qs[name](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = hashlib.sha256(
                normalize(plan).encode()
            ).hexdigest()[:16]
        except Exception as e:  # pragma: no cover - diagnostic path
            out[name] = f"ERROR: {str(e)[:80]}"
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
