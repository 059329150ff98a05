"""Executable documentation: the README's cookbook pipeline runs
verbatim (same verbs, same arguments) on the bundled test data, and its
intermediate contracts hold — docs that drift from the API fail CI.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pyjanitor_spark as pj
import pytest

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

DATA = "/root/testdata/sf0.001"


def test_readme_cookbook_pipeline(spark):
    docs = spark.read.parquet(f"{DATA}/documents.parquet")
    n0 = docs.count()

    # 1. language + quality filter
    docs = pj.language_id(docs, "text")
    docs = pj.quality_score(docs, "text")
    docs = docs.filter(
        (F.col("lang_pred") == "en") & (F.col("quality") > 0.3)
    )
    n1 = docs.count()
    assert 0 < n1 <= n0

    # 1b. Gopher repetition rules at the published thresholds
    rep = pj.gopher_repetition(docs, "doc_id", "text")
    keep = rep.filter(
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("top_2_gram_char_frac") <= 0.20)
        & (F.col("dup_5_gram_char_frac") <= 0.15)
    ).select("doc_id")
    docs = docs.join(keep, "doc_id", "left_semi")
    n1b = docs.count()
    assert 0 < n1b <= n1

    # 2. exact then near dedup
    docs = pj.dedupe_exact(docs, "text", id_col="doc_id")
    docs = pj.dedupe_near(
        docs, id_col="doc_id", column_name="text", jaccard_threshold=0.8
    )
    n2 = docs.count()
    assert 0 < n2 <= n1
    assert docs.select("doc_id").distinct().count() == n2

    # 3. decontamination: (id, score) frame, semi-join the clean ids
    bench = docs.limit(5).select(F.col("text").alias("bench_text"))
    scores = pj.contamination_score(
        docs,
        bench,
        id_col="doc_id",
        column_name="text",
        benchmark_column="bench_text",
    )
    assert scores.columns == ["doc_id", "contamination"]
    clean = scores.filter(F.col("contamination") < 0.5).select("doc_id")
    docs = docs.join(clean, "doc_id", "left_semi")
    n3 = docs.count()
    # the 5 benchmark docs contaminate themselves out
    assert 0 < n3 < n2

    # 4. holdout + packing
    docs = pj.split_train_holdout(docs, "doc_id", holdout_fraction=0.05)
    train = docs.filter(~F.col("is_holdout"))
    train = pj.assign_packs(train, "text", max_tokens=2048, order_by="doc_id")
    out = train.select("doc_id", "pack_id").toPandas()
    assert out["pack_id"].notna().all()
    assert len(out) > 0
    # packs are contiguous in doc_id order: a later doc never lands in
    # an earlier pack
    srt = out.sort_values("doc_id")
    assert (srt["pack_id"].diff().fillna(0) >= 0).all()


def test_readme_ann_lifecycle(spark, tmp_path):
    index = str(tmp_path / "index")
    embeddings = spark.read.parquet(f"{DATA}/embeddings.parquet")
    row = embeddings.filter(F.col("vec_id") == 0).select("embedding").head()
    query_vec = [float(v) for v in row[0]]

    # build once per corpus version
    vecs = pj.kmeans_assign(embeddings, "embedding", "vec_id", k=8)
    cents = pj.centroids(vecs, "embedding", "cluster")
    books = pj.pq_train(vecs, "embedding", "vec_id", m=4, k=16)
    coded = pj.pq_encode(vecs, "embedding", books)
    cents.write.parquet(f"{index}/centroids")
    books.write.parquet(f"{index}/codebooks")
    coded.write.partitionBy("cluster").parquet(f"{index}/vectors")

    # serve from the stored frames only
    stored = spark.read.parquet(f"{index}/vectors")
    hits = pj.ivf_pq_topk(
        stored,
        query_vec,
        "embedding",
        "vec_id",
        "cluster",
        k=10,
        nprobe=3,
        m=4,
        codebooks=spark.read.parquet(f"{index}/codebooks"),
        centroids_df=spark.read.parquet(f"{index}/centroids"),
    ).toPandas()
    assert len(hits) == 10
    # the query vector itself must surface (its ADC distance is minimal)
    assert 0 in set(hits["vec_id"])
    # index reuse is deterministic: a second serve returns the same ids
    hits2 = pj.ivf_pq_topk(
        stored,
        query_vec,
        "embedding",
        "vec_id",
        "cluster",
        k=10,
        nprobe=3,
        m=4,
        codebooks=spark.read.parquet(f"{index}/codebooks"),
        centroids_df=spark.read.parquet(f"{index}/centroids"),
    ).toPandas()
    assert list(hits["vec_id"]) == list(hits2["vec_id"])
