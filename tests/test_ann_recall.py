"""Recall / usefulness properties for the PQ ANN operators.

The driver oracle proves the ADC arithmetic; these properties prove the
ops are *useful* as approximate-nearest-neighbor search (VERDICT r8
task 3) — the analogue of the brute-force property in
``test_conditional_join_property.py``:

- exact L2 top-10 is recovered inside PQ's top-50 (recall well above
  the ~0.125 a random 50-of-400 candidate set would give),
- the worst true distance among PQ's top-10 is within a small constant
  factor of the exact 10th-NN distance,
- IVF-PQ with ``nprobe = all clusters`` degenerates to exactly
  ``pq_topk`` (pruning-off equivalence),
- pre-encoded scoring (``code_col``) equals inline encoding.

Bounds are pinned with margin below the measured values (0.8-1.0
recall, <=2.3 ratio on this seed) so box noise can't flake them;
vectors are seeded, clustered draws — the regime PQ is built for.
"""

from __future__ import annotations

import numpy as np
import pytest

import pyjanitor_spark as pj

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

SEED = 42
C, N, DIM = 8, 400, 16
QUERY_IDS = [0, 101, 399]


@pytest.fixture(scope="module")
def ann_data(spark):
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0, 5, (C, DIM))
    labels = rng.integers(0, C, N)
    X = centers[labels] + rng.normal(0, 1.0, (N, DIM))
    rows = [
        (int(i), int(labels[i]), [float(x) for x in X[i]]) for i in range(N)
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, label int, embedding array<double>"
    )
    cb = pj.pq_train(df, "embedding", "vec_id", m=4, k=16, iters=3)
    cb = df.sparkSession.createDataFrame(cb.collect(), cb.schema)  # freeze
    return df, X, cb


def _exact(X, qi, k=10):
    d = ((X - X[qi]) ** 2).sum(axis=1)
    return set(np.argsort(d)[:k].tolist()), d


def test_pq_topk_recall_and_ratio(ann_data):
    df, X, cb = ann_data
    recalls = []
    for qi in QUERY_IDS:
        exact10, d = _exact(X, qi)
        got = [
            r["vec_id"]
            for r in pj.pq_topk(
                df, [float(x) for x in X[qi]], "embedding", "vec_id",
                k=50, codebooks=cb,
            ).collect()
        ]
        rec = len(set(got) & exact10) / 10
        recalls.append(rec)
        assert rec >= 0.6, f"query {qi}: recall@10-in-50 {rec}"
        # usefulness: PQ's claimed top-10 are genuinely near — worst
        # true distance within 4x the exact 10th-NN distance
        worst = max(d[g] for g in got[:10])
        d10 = sorted(d)[9]
        assert worst <= 4.0 * d10, f"query {qi}: ratio {worst / d10:.2f}"
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_pq_recall_and_full_probe_equivalence(ann_data):
    df, X, cb = ann_data
    for qi in QUERY_IDS:
        exact10, _ = _exact(X, qi)
        q = [float(x) for x in X[qi]]
        got = [
            r["vec_id"]
            for r in pj.ivf_pq_topk(
                df, q, "embedding", "vec_id", "label",
                k=50, nprobe=3, codebooks=cb,
            ).collect()
        ]
        rec = len(set(got) & exact10) / 10
        assert rec >= 0.6, f"query {qi}: ivf recall {rec}"
    # nprobe = every cluster => identical to the unpruned ADC scan
    q = [float(x) for x in X[QUERY_IDS[0]]]
    full = pj.ivf_pq_topk(
        df, q, "embedding", "vec_id", "label", k=20, nprobe=C, codebooks=cb
    ).collect()
    flat = pj.pq_topk(df, q, "embedding", "vec_id", k=20, codebooks=cb).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in full] == [
        (r["vec_id"], r["adc_dist"]) for r in flat
    ]


def test_ivf_topk_recall_vs_exact_cosine(ann_data, spark):
    # the uncompressed IVF path: nprobe=3 of 8 true clusters must still
    # recover most of the exact cosine top-10 (clustered regime — the
    # query's neighbors live in its own + adjacent clusters)
    df, X, _ = ann_data
    norms = np.linalg.norm(X, axis=1)
    for qi in QUERY_IDS:
        q = X[qi]
        cos = (X @ q) / (norms * np.linalg.norm(q))
        exact10 = set(np.argsort(-cos)[:10].tolist())
        got = [
            r["vec_id"]
            for r in pj.ivf_topk(
                df, [float(x) for x in q], "embedding", "vec_id", "label",
                k=10, nprobe=3,
            ).collect()
        ]
        rec = len(set(got) & exact10) / 10
        assert rec >= 0.8, f"query {qi}: ivf_topk recall {rec}"
    # nprobe = all clusters == exact cosine_topk
    q = [float(x) for x in X[QUERY_IDS[0]]]
    full = pj.ivf_topk(df, q, "embedding", "vec_id", "label", k=10, nprobe=C)
    flat = pj.cosine_topk(df, q, "embedding", "vec_id", k=10)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in flat.collect()
    ]


def test_lsh_bucket_topk_recall(ann_data, spark):
    # single-probe hyperplane LSH scans ONLY the query's bucket, so a
    # query whose cluster straddles a hyperplane genuinely loses
    # neighbors — the pinned bound is "far above random", not parity
    # with exhaustive search (measured 0.9/0.2/0.3 on this seed at
    # planes=2; a random 50-of-400 candidate set would give 0.125)
    df, X, _ = ann_data
    norms = np.linalg.norm(X, axis=1)
    recalls = []
    for qi in QUERY_IDS:
        q = X[qi]
        cos = (X @ q) / (norms * np.linalg.norm(q))
        exact10 = set(np.argsort(-cos)[:10].tolist())
        got = [
            r["vec_id"]
            for r in pj.lsh_bucket_topk(
                df, [float(x) for x in q], "embedding", "vec_id",
                k=50, planes=2,
            ).collect()
        ]
        rec = len(set(got) & exact10) / 10
        recalls.append(rec)
        assert rec >= 0.1, f"query {qi}: {rec}"
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_pq_pre_encoded_equals_inline(ann_data):
    df, X, cb = ann_data
    q = [float(x) for x in X[0]]
    enc = pj.pq_encode(df, "embedding", cb)
    pre = pj.pq_topk(
        enc, q, "embedding", "vec_id", k=15, codebooks=cb, code_col="pq_code"
    ).collect()
    inline = pj.pq_topk(df, q, "embedding", "vec_id", k=15, codebooks=cb).collect()
    assert [r["vec_id"] for r in pre] == [r["vec_id"] for r in inline]
