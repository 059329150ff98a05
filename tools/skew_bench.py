"""Zipf-skew stress bench (VERDICT r9 task 6).

make_sf1's uniform replication never creates a hot key, so the r9 sweep
could not see skew behavior.  This tool builds a deterministic skewed
variant of the sf0.1 tables — ONE hot key holding ~10% of rows plus a
Zipf-ish warm tail — and times the pair/join/agg family on it:

* ``groupby_agg`` over the hot user (map-side combine should make skew
  free — the control);
* ``conditional_join`` equi on the skewed fk (sort-merge with one fat
  key — the case AQE skew-join handles at runtime);
* ``skew_join`` (explicit salting) vs the SAME plain join, both under
  AQE, so the artifact records whether salting still pays on this box;
* ``dedupe_near`` / ``simhash_pairs`` on documents where the hot 2%
  share one body — the quadratic-output hazard the banding gates cap
  (hot fraction kept small enough that C(hot, 2) pair output stays
  materializable: 2% of 60k docs = 1.2k dups = ~0.7M pairs).

Skewed columns are derived from md5(key) — deterministic, layout-free.
Writes .cache/skew/*.parquet once (reused), prints one JSON line and
saves it to SKEW_BENCH_r10.json.

Usage: python tools/skew_bench.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SKEW_SRC_DIR", "/root/testdata/sf0.1")
DST = "/root/repo/.cache/skew"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _uniform(col):
    """md5-derived uniform in [0,1) — same trick as deterministic_sample."""
    from pyspark.sql import functions as F

    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / float(2**52)


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    u = _uniform(F.col("event_id"))
    # hot user 0: 10%; users 1..9: 2% each; tail uniform over 50k
    skew_user = (
        F.when(u < 0.10, F.lit(0))
        .when(u < 0.28, (u * 1000).cast("int") % 9 + 1)
        .otherwise((F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 15, 8), 16, 10) % 50_000).cast("bigint") + 10)
    )
    ev.withColumn("user_id", skew_user.cast("bigint")).write.mode(
        "overwrite"
    ).parquet(f"{DST}/events.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    uo = _uniform(F.col("o_orderkey"))
    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    n_cust = cust.count()
    hot_cust = (
        F.when(uo < 0.10, F.lit(1))
        .otherwise((F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 15, 8), 16, 10) % n_cust).cast("bigint") + 1)
    )
    orders.withColumn("o_custkey", hot_cust.cast("bigint")).write.mode(
        "overwrite"
    ).parquet(f"{DST}/orders.parquet")
    cust.write.mode("overwrite").parquet(f"{DST}/customer.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    ud = _uniform(F.col("doc_id"))
    # hot 2% share ONE body -> C(0.02*N, 2) genuine near-dup pairs
    docs.withColumn(
        "text",
        F.when(
            ud < 0.02,
            F.lit("the hot duplicated body every skewed pipeline meets "
                  "appears again and again across the corpus shards"),
        ).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    # hot-CLUSTER embeddings (r11): 50k rows dim-64, ONE cluster holding
    # 40% of rows — the BLAS-stage straggler shape (one Arrow task does
    # 20k^2 cosine work while every other core idles) that split= fixes
    n_emb, dim = 50_000, 64
    ids = spark.range(n_emb).withColumnRenamed("id", "vec_id")
    ue = _uniform(F.col("vec_id"))
    cluster = (
        F.when(ue < 0.40, F.lit(0))
        .otherwise(
            (
                F.conv(
                    F.substring(F.md5(F.col("vec_id").cast("string")), 20, 8),
                    16,
                    10,
                )
                % 63
            ).cast("int")
            + 1
        )
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":"), d.cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / float(2**52)
        * 2.0
        - 1.0,
    )
    ids.select(
        "vec_id", cluster.alias("cluster"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    import pyjanitor_spark as pj
    from pyjanitor_spark.utils.skew import skew_join

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("skew-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv or not os.path.exists(f"{DST}/embeddings.parquet"):
        build(spark)

    ev = spark.read.parquet(f"{DST}/events.parquet")
    orders = spark.read.parquet(f"{DST}/orders.parquet")
    cust = spark.read.parquet(f"{DST}/customer.parquet")
    docs = spark.read.parquet(f"{DST}/documents.parquet")

    out: dict[str, dict] = {}

    def run(name, fn):
        t0 = time.time()
        n = fn()
        out[name] = {"sec": round(time.time() - t0, 4), "rows": n}
        print(f"  {name}: {out[name]['sec']}s, {n} rows", file=sys.stderr)

    # control: hash-agg map-side combine makes the hot group free
    run("groupby_agg_hot_user", lambda: pj.groupby_agg(
        ev, by="user_id", agg_column_name="value", agg="avg",
        new_column_name="avg_v").count())

    # skewed fk equi join through conditional_join (sort-merge + AQE)
    run("conditional_join_skewed_fk", lambda: pj.conditional_join(
        orders, cust, ("o_custkey", "c_custkey", "==")).count())

    # plain join vs explicit salting on the same skewed key, both AQE
    run("plain_join_skewed_fk", lambda: orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count())
    run("skew_join_salted", lambda: skew_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").count())

    # hot-fingerprint pair family (banded; output genuinely quadratic
    # in the hot bucket — the gate is that they COMPLETE and the
    # pair count matches C(hot,2) exactly)
    run("simhash_pairs_hot_body", lambda: pj.simhash_pairs(
        docs, "doc_id", "text", bits=48, bands=4, max_hamming=3).count())
    run("dedupe_near_hot_body", lambda: pj.dedupe_near(
        docs, "doc_id", "text", k=8, bands=4, shingle_n=3).count())
    # the capped-by-default exact-jaccard path under the same skew
    run("ngram_jaccard_hot_body", lambda: pj.ngram_jaccard_pairs(
        docs, "doc_id", "text").count())

    # hot-CLUSTER BLAS stress (r11): one 20k-row cluster; split=1 runs
    # its pair work as ONE Arrow task, split=4 as 10 balanced sub-tasks
    emb = spark.read.parquet(f"{DST}/embeddings.parquet")
    run("embedding_near_dup_hot_cluster", lambda: pj.embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.9,
        block_col="cluster").count())
    run("embedding_near_dup_hot_cluster_split4", lambda: pj.embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.9,
        block_col="cluster", split=4).count())
    # r12: NO user-supplied split — the rows×dim window sizes the
    # triangle split per block (the 20k hot cluster is compute-bound:
    # 2.6e10 pair-flops vs the 2e9 default budget -> m≈4; cold
    # clusters stay m=1)
    run("embedding_near_dup_hot_cluster_auto", lambda: pj.embedding_near_dup(
        emb, "vec_id", "embedding", threshold=0.9,
        block_col="cluster", split="auto").count())
    # r13 (VERDICT r12 task 5): the hot cluster is EXACTLY the shape
    # the COMPUTE rule exists for — 20k rows × 64 dims = 1.28M cells,
    # far under the 25M memory budget, but 1.3e10 pair-flops.  Disable
    # the flops rule (absurd budget) and the memory-rule-only auto must
    # degrade back toward unsplit, attesting the flops rule is the one
    # doing the work on small-but-hot clusters
    run("embedding_near_dup_hot_cluster_auto_memrule_only",
        lambda: pj.embedding_near_dup(
            emb, "vec_id", "embedding", threshold=0.9,
            block_col="cluster", split="auto",
            auto_split_flops=10**18).count())
    run("semdedup_hot_cluster", lambda: pj.semdedup(
        emb, "embedding", "vec_id", "cluster", eps=0.9).count())
    run("semdedup_hot_cluster_split4", lambda: pj.semdedup(
        emb, "embedding", "vec_id", "cluster", eps=0.9, split=4).count())
    # r12: the bounded pre-flight must route this through the split
    # pipeline on its own (hot cluster ≈ 94% of total pair flops)
    run("semdedup_hot_cluster_auto", lambda: pj.semdedup(
        emb, "embedding", "vec_id", "cluster", eps=0.9,
        split="auto").count())
    # r13: flops rule disabled — memory-rule-only routing on the
    # small-cells/hot-flops cluster (see the near_dup variant above)
    run("semdedup_hot_cluster_auto_memrule_only", lambda: pj.semdedup(
        emb, "embedding", "vec_id", "cluster", eps=0.9,
        split="auto", auto_split_flops=10**18).count())

    n_docs = docs.count()
    n_hot = docs.filter(F.col("text").startswith("the hot duplicated")).count()
    out["_meta"] = {
        "src": SRC, "n_docs": n_docs, "n_hot_docs": n_hot,
        "expected_hot_pairs": n_hot * (n_hot - 1) // 2,
        "hot_user_rows": ev.filter(F.col("user_id") == 0).count(),
        "hot_cust_orders": orders.filter(F.col("o_custkey") == 1).count(),
        "n_embeddings": emb.count(),
        "hot_cluster_rows": emb.filter(F.col("cluster") == 0).count(),
    }
    line = json.dumps(out, sort_keys=True)
    print(line)
    dest = os.environ.get("SKEW_OUT", "/root/repo/SKEW_BENCH_r13.json")
    with open(dest, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
