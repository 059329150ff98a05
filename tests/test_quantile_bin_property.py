"""Differential property test for quantile_bin: seeded random frames
(heavy ties, skew, negatives, nulls) against a pure-Python reference of
the documented contract bin(v) = floor((cnt_le(v) - 1) * q / n)."""

from __future__ import annotations

import math

import numpy as np
import pytest

import pyjanitor_spark as pj


def _reference_bins(values, q):
    nn = [v for v in values if v is not None]
    n = len(nn)
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        cle = sum(1 for w in nn if w <= v)
        out.append(math.floor((cle - 1) * q / n))
    return out


@pytest.mark.parametrize("seed,q", [(0, 2), (1, 4), (2, 7), (3, 10), (4, 3)])
def test_matches_reference_contract(spark, seed, q):
    rng = np.random.default_rng(seed)
    vals = []
    for i in range(200):
        r = rng.random()
        if r < 0.05:
            vals.append(None)
        elif r < 0.45:
            vals.append(float(rng.integers(-3, 4)))   # heavy ties incl. negatives
        else:
            vals.append(round(float(rng.normal(0, 100)), 2))
    df = spark.createDataFrame(list(enumerate(vals)), "id int, v double")
    got = {r["id"]: r["b"] for r in pj.quantile_bin(df, "v", "b", q).collect()}
    exp = dict(enumerate(_reference_bins(vals, q)))
    assert got == exp


def test_every_bin_within_range_and_monotone(spark):
    rng = np.random.default_rng(9)
    vals = [float(rng.integers(0, 50)) for _ in range(500)]
    df = spark.createDataFrame(list(enumerate(vals)), "id int, v double")
    rows = pj.quantile_bin(df, "v", "b", 8).collect()
    by_val = sorted((r["v"], r["b"]) for r in rows)
    assert all(0 <= b < 8 for _, b in by_val)
    # monotone: bin never decreases as the value grows
    for (v1, b1), (v2, b2) in zip(by_val, by_val[1:]):
        assert b1 <= b2
