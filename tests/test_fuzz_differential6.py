"""Fuzz differentials, sixth wave: user-function transforms, rounding,
type casts, running distinct counts, natural sort, and the Series math
functions.  Same contract as the earlier waves: the reference executes
live on a deep copy, pinned ``derandomize=True`` after wider randomized
sweeps ran clean.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pyjanitor_spark as pj
from tests.reference_janitor import load_reference
from tests.test_reference_differential import _sdf, compare

ref = load_reference()
pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    ref is None, reason="reference janitor not importable in this environment"
)]

FUZZ = settings(max_examples=12, deadline=None, derandomize=True)

_floats = st.lists(
    st.floats(-100, 100, allow_nan=False), min_size=1, max_size=8
)


@FUZZ
@given(
    vals=_floats,
    fn_name=st.sampled_from(["log", "sqrt", "abs", "exp", "negative"]),
)
def test_fuzz_transform_column_ufunc(spark, vals, fn_name):
    # negatives through log/sqrt: NaN parity, not errors
    fn = getattr(np, fn_name)
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).transform_column("v", fn)
    got = pj.transform_column(
        _sdf(spark, pdf, schema="v double, k bigint"), "v", fn
    )
    compare(spark, exp, got)


@FUZZ
@given(
    vals=_floats,
    denominator=st.sampled_from([2.0, 3.0, 4.0, 7.0, 16.0]),
    digits=st.sampled_from([None, 1, 3]),
)
def test_fuzz_round_to_fraction(spark, vals, denominator, digits):
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    # the reference's digits default is np.inf (None is rejected by its
    # type check); ours maps None to the same no-extra-rounding default
    ref_digits = np.inf if digits is None else digits
    exp = pdf.copy(deep=True).round_to_fraction("v", denominator, ref_digits)
    got = pj.round_to_fraction(
        _sdf(spark, pdf, schema="v double, k bigint"),
        "v",
        denominator,
        digits,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    # 3-decimal values inside ±1e5: Java and python agree on the plain
    # decimal rendering; scientific-notation thresholds differ between
    # the engines (python '1e-05' vs Java '1.0E-5') — a documented
    # rendering divergence of string casts, not a value divergence
    vals=st.lists(
        st.floats(-99999, 99999, allow_nan=False).map(lambda v: round(v, 3)),
        min_size=1,
        max_size=8,
    ),
    dtype=st.sampled_from([str, float, int]),
)
def test_fuzz_change_type(spark, vals, dtype):
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).change_type("v", dtype)
    if dtype is str:
        # pandas str(float) renders the repr; normalize both to str for
        # the multiset compare (Spark double->string matches repr)
        exp = exp.assign(v=exp["v"].astype(str))
    got = pj.change_type(
        _sdf(spark, pdf, schema="v double, k bigint"), "v", dtype
    )
    compare(spark, exp, got)


@FUZZ
@given(
    vals=st.lists(
        st.sampled_from(["a", "A", "b", "Bc", "bC", "d"]),
        min_size=1,
        max_size=10,
    ),
    case_sensitive=st.booleans(),
)
def test_fuzz_count_cumulative_unique(spark, vals, case_sensitive):
    pdf = pd.DataFrame({"s": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).count_cumulative_unique(
        "s", "ccu", case_sensitive=case_sensitive
    )
    got = pj.count_cumulative_unique(
        _sdf(spark, pdf, schema="s string, k bigint"),
        "s",
        "ccu",
        case_sensitive=case_sensitive,
        order_by="k",
    )
    compare(spark, exp, got)


@FUZZ
@given(
    vals=st.lists(
        st.sampled_from(
            ["x10", "x2", "X1", "b", "10a", "2", "10", "x02", "y"]
        ),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    ascending=st.booleans(),
)
def test_fuzz_sort_naturally(spark, vals, ascending):
    pdf = pd.DataFrame({"s": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).sort_naturally("s")
    got = pj.sort_naturally(
        _sdf(spark, pdf, schema="s string, k bigint"),
        "s",
        ascending=ascending,
    )
    got_order = [r["s"] for r in got.collect()]
    # natural-KEY sequence must match (tie identity between 'x2'/'x02'
    # is stability in pandas, layout in Spark; `ascending` is this
    # repo's superset arg — key-reversal is its contract)
    def key(x):
        import re
        return [(0, int(p)) if p.isdigit() else (1, p)
                for p in re.split(r"(\d+)", x) if p]
    exp_keys = [key(x) for x in exp["s"]]
    if not ascending:
        exp_keys = exp_keys[::-1]
    assert [key(x) for x in got_order] == exp_keys


@FUZZ
@given(vals=st.lists(
    st.floats(-100, 100, allow_nan=False), min_size=2, max_size=8, unique=True
))
def test_fuzz_z_score_ecdf(spark, vals):
    # a spread below ~1e-150 underflows the variance to zero in double
    # arithmetic (both engines degenerate differently) — out of scope
    assume(max(vals) - min(vals) > 1e-150)
    s = pd.Series(vals, name="v")
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    sdf = _sdf(spark, pdf, schema="v double, k bigint")

    from pyjanitor_spark.functions.math import apply_math, ecdf, z_score

    exp_z = s.z_score()
    # the Column form of whole-column statistics deliberately raises
    # (single-task global window); apply_math is the scalable path
    got_z = apply_math(sdf, "v", z_score, dest="z").toPandas()
    got_z = got_z.sort_values("k").reset_index(drop=True)
    assert np.allclose(got_z["z"], exp_z, rtol=1e-9)

    exp_x, exp_y = s.ecdf()  # reference returns (sorted values, ecdf)
    got_e = apply_math(sdf, "v", ecdf, dest="e").toPandas()
    got_e = got_e.sort_values("v").reset_index(drop=True)
    assert np.allclose(got_e["v"], exp_x, rtol=1e-12)
    assert np.allclose(got_e["e"], exp_y, rtol=1e-9)
