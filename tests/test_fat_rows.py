"""Fat-row robustness: one document with 100k tokens (~0.7 MB) — the
per-ROW hazard class at corpus scale (expression pipelines build
per-row token/shingle arrays; a quadratic or per-gram-re-split shape
here would hang or OOM long before 100 TB).

Each verb must complete on the fat row with exact counts; the budget
assertion is generous (these run alongside the whole suite) but a
pathological regression blows it by orders of magnitude, not percent.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj

N_TOKENS = 100_000


@pytest.fixture(scope="module")
def fat(spark):
    # deterministic pseudo-words, some repetition so dedup signals fire
    words = [f"w{i % 9973}" for i in range(N_TOKENS)]
    text = " ".join(words)
    small = "tiny doc beside the giant"
    return spark.createDataFrame(
        [(1, text), (2, small)], "doc_id long, text string"
    )


def _timed(fn, budget_s: float):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    assert dt < budget_s, f"fat-row path took {dt:.1f}s (budget {budget_s}s)"
    return out


def test_token_count_fat(fat):
    rows = _timed(
        lambda: {r.doc_id: r.n_tokens for r in pj.token_count(fat, "text").collect()},
        60,
    )
    assert rows[1] == N_TOKENS and rows[2] == 5


def test_chunk_text_fat(fat):
    out = _timed(
        lambda: pj.chunk_text(fat, "text", max_tokens=512)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.sum("chunk_n_tokens").alias("tok"))
        .collect(),
        120,
    )
    got = {r.doc_id: (r.n, r.tok) for r in out}
    # ceil(100000/512) = 196 chunks covering every token exactly once
    assert got[1] == (196, N_TOKENS)
    assert got[2] == (1, 5)


def test_minhash_signature_fat(fat):
    rows = _timed(
        lambda: pj.minhash_signature(fat, "text", k=8).select(
            "doc_id", F.size("minhash").alias("k")
        ).collect(),
        180,
    )
    assert all(r.k == 8 for r in rows)


def test_simhash_fat(fat):
    rows = _timed(
        lambda: pj.simhash(fat, "text", bits=48).select("doc_id", "simhash").collect(),
        180,
    )
    assert len(rows) == 2 and all(r.simhash is not None for r in rows)


def test_gopher_repetition_fat(fat):
    out = _timed(
        lambda: {
            r.doc_id: r.asDict()
            for r in pj.gopher_repetition(fat, "doc_id", "text").collect()
        },
        240,
    )
    # 9973 distinct words over 100k occurrences: massive 2-gram repeats
    assert out[1]["dup_5_gram_char_frac"] > 0.9
    assert out[2]["dup_5_gram_char_frac"] == 0.0


def test_gopher_repetition_exact_fat(fat):
    """The span-union (exact=True) branch on the 100k-token row: the
    token-space interval folds must stay linear — per-interval slice
    sums touch each token index at most once — or this blows the
    budget by orders of magnitude."""
    out = _timed(
        lambda: {
            r.doc_id: r.asDict()
            for r in pj.gopher_repetition(
                fat, "doc_id", "text", exact=True
            ).collect()
        },
        240,
    )
    # span-union is bounded by the clamped upper-bound default, and
    # the 9973-word cycle still repeats every 5-gram many times
    assert out[1]["dup_5_gram_char_frac"] > 0.9
    assert out[2]["dup_5_gram_char_frac"] == 0.0


def test_dedupe_exact_fat(fat):
    rows = _timed(lambda: pj.dedupe_exact(fat, "text", "doc_id").count(), 60)
    assert rows == 2
