"""Fuzz wave 17: the sampled-Jaccard estimator vs its documented
contract (``ngram_jaccard_pairs(shingle_sample=p)``, dedup.py).

The r12 recall attestation pins ONE constructed corpus; this wave
fuzzes random corpora × p × δ against BOTH halves of the docstring's
promise, so a future edit to the md5 cut (or to the self-consistent
sampled-space arithmetic) cannot silently drift:

* **identity** — the emitted ``jaccard`` equals a pure-Python
  re-derivation of Jaccard over the md5-cut sampled shingle space,
  exactly (same cut constant ``int(round(p * 2**32))``, same first-8-
  nibble integer compare).  This is the bit-for-bit property the
  DuckDB oracle gate relies on.
* **Chernoff contract** — against FULL-space Jaccard J with union
  size u, the documented bound P(|Ĵ − J| > δ) ≤ 2·exp(−2·δ²·p·u)
  holds in aggregate: violations across the corpus stay within the
  summed per-pair budget (×3 safety, +1 absolute slack for the
  randomized mode; the derandomized run is deterministic).

Pairs are built with ``shingle_n=1`` over per-pair token namespaces,
so shingles ARE tokens and (J, u) are exact by construction — no
cross-boundary shingle correlation to cloud the bound.  Derandomized
after two clean randomized sweeps (FUZZ17_RANDOM=1 to re-randomize).
"""

from __future__ import annotations

import hashlib
import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
import pytest

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ17_EXAMPLES", "12")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ17_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk_pair(ns: str, union: int, inter: int) -> tuple[set, set]:
    """Two token sets with |A∪B| = union, |A∩B| = inter, exactly."""
    shared = {f"{ns}s{i}" for i in range(inter)}
    rest = union - inter
    a_only = {f"{ns}a{i}" for i in range(rest // 2)}
    b_only = {f"{ns}b{i}" for i in range(rest - rest // 2)}
    return shared | a_only, shared | b_only


def _kept(tokens: set, cut: int) -> set:
    return {
        t
        for t in tokens
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) < cut
    }


@given(
    seed=st.integers(0, 10**6),
    union=st.integers(200, 1200),
    j_pct=st.integers(10, 95),
    p=st.sampled_from([0.15, 0.3, 0.5]),
    delta=st.sampled_from([0.1, 0.15, 0.2]),
)
@WAVE
def test_sampled_jaccard_identity_and_chernoff(
    spark, seed, union, j_pct, p, delta
):
    n_pairs = 8
    cut = int(round(p * 4294967296))
    rows, truth = [], {}
    for k in range(n_pairs):
        ns = f"x{seed}_{k}_"
        inter = max(1, union * j_pct // 100)
        a, b = _mk_pair(ns, union, inter)
        rows.append((2 * k, " ".join(sorted(a))))
        rows.append((2 * k + 1, " ".join(sorted(b))))
        truth[(2 * k, 2 * k + 1)] = (a, b)
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_1"], r["id_2"]): r["jaccard"]
        for r in pj.ngram_jaccard_pairs(
            d,
            "doc_id",
            "text",
            shingle_n=1,
            threshold=0.01,
            shingle_sample=p,
        ).collect()
    }

    # ---- identity: exact match with the python sampled-space rederivation
    want = {}
    for key, (a, b) in truth.items():
        ka, kb = _kept(a, cut), _kept(b, cut)
        u = len(ka | kb)
        i = len(ka & kb)
        if u and i and i / u >= 0.01:
            want[key] = i / u
    assert set(got) <= set(truth), f"spurious cross-pairs: {sorted(set(got) - set(truth))[:3]}"
    assert got.keys() == want.keys(), (
        sorted(want.keys() - got.keys())[:3],
        sorted(got.keys() - want.keys())[:3],
    )
    for key in want:
        assert abs(got[key] - want[key]) < 1e-12, (key, got[key], want[key])

    # ---- Chernoff contract vs FULL-space Jaccard
    budget = 0.0
    violations = 0
    for key, (a, b) in truth.items():
        j_true = len(a & b) / len(a | b)
        j_est = got.get(key, 0.0)  # vanished pair estimates 0
        budget += min(1.0, 2.0 * math.exp(-2.0 * delta * delta * p * len(a | b)))
        if abs(j_est - j_true) > delta:
            violations += 1
    assert violations <= 3 * budget + 1, (
        f"{violations} deviations > δ={delta} across {n_pairs} pairs; "
        f"summed Chernoff budget {budget:.4f} (p={p}, union={union})"
    )
