"""Differential property test for quantile_bin: seeded random frames
(heavy ties, skew, negatives, nulls) against a pure-Python reference of
the documented contract bin(v) = floor((cnt_le(v) - 1) * q / n)."""

from __future__ import annotations

import math

import numpy as np
import pytest

import pyjanitor_spark as pj

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier


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


class TestWinsorize:
    def test_hand_computed(self, spark):
        # values 1..20: lower=0.1 -> smallest v with cnt_le/n >= 0.1 is 2;
        # upper=0.9 -> v=18
        df = spark.createDataFrame([(i, float(i)) for i in range(1, 21)],
                                   "id int, v double")
        out = {r["id"]: r["w"]
               for r in pj.winsorize(df, "v", dest="w", lower=0.1, upper=0.9).collect()}
        assert out[1] == 2.0 and out[2] == 2.0
        assert out[19] == 18.0 and out[20] == 18.0
        assert out[10] == 10.0  # interior untouched

    def test_nulls_and_bounds(self, spark):
        df = spark.createDataFrame([(1, 5.0), (2, None), (3, 100.0)],
                                   "id int, v double")
        out = {r["id"]: r["v"] for r in pj.winsorize(df, "v").collect()}
        assert out[2] is None
        # lower=0, upper=1 is the identity
        ident = {r["id"]: r["v"]
                 for r in pj.winsorize(df, "v", lower=0.0, upper=1.0).collect()}
        assert ident == {1: 5.0, 2: None, 3: 100.0}

    def test_ties_share_fate(self, spark):
        # heavy-hitter tie group at 1.0 spans the 5% cut: cnt_le(1)=10 of
        # 12 -> 1.0 is the 5% cutpoint itself, nothing below survives
        rows = [(i, 1.0) for i in range(10)] + [(10, 50.0), (11, 99.0)]
        df = spark.createDataFrame(rows, "id int, v double")
        out = pj.winsorize(df, "v", lower=0.05, upper=0.95)
        assert out.filter("v < 1.0").count() == 0

    def test_bad_bounds(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id int, v double")
        import pytest as _pt
        with _pt.raises(ValueError):
            pj.winsorize(df, "v", lower=0.9, upper=0.1)


class TestRobustScaleQuantiles:
    def test_quantiles_hand_computed(self, spark):
        df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                                   "id int, v double")
        r = pj.quantiles(df, "v", [0.0, 0.25, 0.5, 0.75, 1.0]).first()
        # smallest v with cnt_le/10 >= q: 1, 3, 5, 8, 10
        assert [r[f"q_{i}"] for i in range(5)] == [1.0, 3.0, 5.0, 8.0, 10.0]

    def test_robust_scale_values(self, spark):
        df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                                   "id int, v double")
        out = {r["id"]: r["rs"]
               for r in pj.robust_scale(df, "v", dest="rs").collect()}
        # med=5, iqr=8-3=5: v=10 -> 1.0; v=5 -> 0.0; v=1 -> -0.8
        assert out[10] == 1.0 and out[5] == 0.0 and out[1] == -0.8

    def test_zero_iqr_null(self, spark):
        df = spark.createDataFrame([(i, 7.0) for i in range(10)],
                                   "id int, v double")
        out = pj.robust_scale(df, "v", dest="rs")
        assert out.filter("rs IS NOT NULL").count() == 0

    def test_null_passthrough_and_inplace(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, None), (3, 3.0), (4, 9.0)],
                                   "id int, v double")
        out = pj.robust_scale(df, "v")
        assert out.columns == ["id", "v"]
        assert out.filter("id = 2").first()["v"] is None

    def test_bad_quantile_raises(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id int, v double")
        import pytest as _pt
        with _pt.raises(ValueError):
            pj.quantiles(df, "v", [0.5, 1.5])
