"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + sorted values (float tol 1e-9).

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(rows_a, rows_b, cols):
    if len(rows_a) != len(rows_b):
        return f"row count {len(rows_a)} vs {len(rows_b)}"

    def key(r):
        return tuple((x is None, str(x)) for x in r)

    sa = sorted([tuple(norm(v) for v in r) for r in rows_a], key=key)
    sb = sorted([tuple(norm(v) for v in r) for r in rows_b], key=key)
    for i, (ra, rb) in enumerate(zip(sa, sb)):
        for c, (va, vb) in enumerate(zip(ra, rb)):
            if isinstance(va, float) and isinstance(vb, float):
                if abs(va - vb) > 1e-9 and abs(va - vb) > 1e-9 * max(abs(va), abs(vb)):
                    return f"row {i} col {cols[c]}: {va!r} vs {vb!r}"
            elif va != vb:
                return f"row {i} col {cols[c]}: {va!r} vs {vb!r}"
    return None


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF)
            cols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in cols) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            skipped += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows_raw = res.fetchall()
            order = [ocols.index(c) for c in sorted(ocols)]
            orows = [tuple(r[i] for i in order) for r in orows_raw]
            if sorted(ocols) != cols:
                print(f"FAIL  {name}: columns {cols} vs oracle {sorted(ocols)}")
                failed += 1
                continue
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed += 1
            continue
        err = compare(srows, orows, sorted(cols))
        if err:
            print(f"FAIL  {name}: {err}")
            failed += 1
        else:
            print(f"OK    {name} ({len(srows)} rows)")
            passed += 1
    print(f"\n{passed} ok, {failed} failed, {skipped} rows-only")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
