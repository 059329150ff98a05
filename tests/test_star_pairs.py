"""Star-mode LSH pair emission (VERDICT r10 task 2).

``minhash_lsh_pairs(mode='star')`` emits each bucket's min id paired
with every other member — O(bucket) edges instead of C(bucket, 2) —
and must yield IDENTICAL connected components, because a bucket is a
clique in the candidate graph and the star keeps it connected.  The
property is checked as a hypothesis differential: random small corpora
with forced duplicate groups, components from star pairs vs all
pairs, plus ``dedupe_near``'s kept set under both internal modes.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from pyjanitor_spark.operators.dedup import (
    _emit_pairs,
    _emit_star,
    minhash_lsh_pairs,
    near_dup_clusters,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]


def _doc(draw):
    words = draw(st.lists(st.sampled_from(VOCAB), min_size=3, max_size=8))
    return " ".join(words)


@st.composite
def corpus(draw):
    n_base = draw(st.integers(2, 6))
    bases = [_doc(draw) for _ in range(n_base)]
    rows = []
    i = 0
    for b in bases:
        copies = draw(st.integers(1, 4))
        for _ in range(copies):
            rows.append((i, b))
            i += 1
    return rows


def _components(spark, rows, mode):
    df = spark.createDataFrame(rows, "doc_id long, body string")
    pairs = minhash_lsh_pairs(df, "doc_id", "body", k=8, bands=4, mode=mode)
    cl = near_dup_clusters(pairs, nodes=df, id_col="doc_id")
    return {r.doc_id: r.cluster_id for r in cl.collect()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus())
@pytest.mark.slow  # heavy brute/sweep: builder gate
def test_star_components_identical(spark, rows):
    assert _components(spark, rows, "star") == _components(spark, rows, "all")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=corpus())
@pytest.mark.slow  # heavy brute/sweep: builder gate
def test_dedupe_near_star_matches_forced_all_pairs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, body string")
    # dedupe_near without a jaccard_threshold uses star pairs internally;
    # re-derive the kept set from all-pairs components by hand
    kept_star = {r.doc_id for r in pj.dedupe_near(df, "doc_id", "body").collect()}
    comp = _components(spark, rows, "all")
    kept_all = {i for i, c in comp.items() if i == c}
    assert kept_star == kept_all


def test_star_emission_is_linear(spark):
    # one bucket of n sorted ids -> n-1 star edges vs C(n,2) all pairs
    ids = list(range(10))
    b = spark.createDataFrame([(ids,)], "__ids array<long>")
    star = _emit_star(b).collect()
    allp = _emit_pairs(b).collect()
    assert len(star) == 9 and len(allp) == 45
    assert all(r.id_1 == 0 for r in star)
    assert {(r.id_1, r.id_2) for r in star} <= {(r.id_1, r.id_2) for r in allp}


def test_mode_validated(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, body string")
    with pytest.raises(ValueError, match="mode"):
        minhash_lsh_pairs(df, "doc_id", "body", mode="hub")
