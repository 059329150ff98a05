"""Build a ~sf1 dataset by key-shifted 10x replication of the driver's
sf0.1 parquet, for the SCALE-VALIDATION bench only (VERDICT r6 task 8).

This is NOT correctness test data — the oracle gates stay on the
driver-generated sf0.01.  Replication preserves per-replica join
consistency (every foreign key shifts by the same per-table offset as
its parent key) and per-replica data distributions; region/nation are
TPC-H-style fixed dimensions and copy once.

Caveat recorded for the bench readout: replicated documents/embeddings
carry identical bodies across replicas, which are GENUINE near-dups —
output-bound dedup queries (simhash_pairs etc.) therefore scale with
their now-quadratic-in-replicas output, not with scan cost.  The
linear-scaling check reads the non-pair-emitting queries.

Usage: python tools/make_sf1.py [replicas] (default 10); writes to
/root/repo/.cache/sf1.
"""

from __future__ import annotations

import os
import shutil
import sys

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.cache/sf1"

# per-table primary key + {fk_column: parent_table} (offset = parent max+1)
KEYED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        None,
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {"user_id": "events_user"}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
COPY = ["region", "nation"]


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)

    # one offset base per key domain (parent max + 1)
    base: dict[str, int] = {}
    tables = {}
    for name in list(KEYED) + COPY:
        tables[name] = spark.read.parquet(f"{SRC}/{name}.parquet")
    for name, (pk, _) in KEYED.items():
        if pk:
            base[name] = tables[name].agg(F.max(pk)).first()[0] + 1
    base["events_user"] = tables["events"].agg(F.max("user_id")).first()[0] + 1

    for name in COPY:
        tables[name].write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: copied once")

    for name, (pk, fks) in KEYED.items():
        df = tables[name]
        parts = []
        for i in range(replicas):
            d = df
            if pk:
                off = base["events" if name == "events" else name] * i
                d = d.withColumn(pk, F.col(pk) + F.lit(off))
            for fk, parent in fks.items():
                d = d.withColumn(fk, F.col(fk) + F.lit(base[parent] * i))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(16).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        n = spark.read.parquet(f"{DST}/{name}.parquet").count()
        print(f"{name}: {n} rows ({replicas}x)")
    spark.stop()


if __name__ == "__main__":
    main()
