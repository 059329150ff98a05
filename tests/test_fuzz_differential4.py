"""Fuzz differentials, fourth wave: ``conditional_join`` — the hardest
§2 operator — against the reference executing live (its pure-pandas
path, ``use_numba=False``).  Random value sets WITH NULLS through every
comparison operator and every ``how``, single-condition and
equi+non-equi two-condition forms.  Null semantics are the point: a
NULL on either side of a non-equi (or equi) condition never matches,
and unmatched outer rows surface exactly once per engine.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from tests.reference_janitor import load_reference
from tests.test_reference_differential import _sdf, compare

ref = load_reference()
pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    ref is None, reason="reference janitor not importable in this environment"
)]

FUZZ = settings(max_examples=12, deadline=None, derandomize=True)

_vals = st.lists(
    st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=7
)


def _f(vs):
    # float64-typed even when every draw is None: the reference
    # type-checks dtypes, and an object column is not a join column
    return pd.array(
        [None if v is None else float(v) for v in vs], dtype="float64"
    )


@FUZZ
@given(
    left=_vals,
    right=_vals,
    # '==' alone is rejected by the reference ("Equality only joins
    # are not supported") — the equi+range wave covers it
    op=st.sampled_from(["<", "<=", ">", ">=", "!="]),
    how=st.sampled_from(["inner", "left", "right", "outer"]),
)
def test_fuzz_conditional_join_single(spark, left, right, op, how):
    pdf1 = pd.DataFrame({"a": _f(left), "k": range(len(left))})
    pdf2 = pd.DataFrame({"b": _f(right), "v": range(len(right))})
    exp = pdf1.copy(deep=True).conditional_join(
        pdf2.copy(deep=True), ("a", "b", op), how=how
    )
    got = pj.conditional_join(
        _sdf(spark, pdf1, schema="a double, k bigint"),
        _sdf(spark, pdf2, schema="b double, v bigint"),
        ("a", "b", op),
        how=how,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    left=_vals,
    right=_vals,
    gl=st.lists(st.sampled_from(["g", "h"]), min_size=1, max_size=7),
    gr=st.lists(st.sampled_from(["g", "h"]), min_size=1, max_size=7),
    op=st.sampled_from(["<", "<=", ">", ">=", "!="]),
    how=st.sampled_from(["inner", "left", "right", "outer"]),
)
def test_fuzz_conditional_join_equi_plus_range(
    spark, left, right, gl, gr, op, how
):
    n1, n2 = min(len(left), len(gl)), min(len(right), len(gr))
    pdf1 = pd.DataFrame(
        {"a": _f(left[:n1]), "g1": gl[:n1], "k": range(n1)}
    )
    pdf2 = pd.DataFrame(
        {"b": _f(right[:n2]), "g2": gr[:n2], "v": range(n2)}
    )
    conds = [("g1", "g2", "=="), ("a", "b", op)]
    exp = pdf1.copy(deep=True).conditional_join(
        pdf2.copy(deep=True), *conds, how=how
    )
    got = pj.conditional_join(
        _sdf(spark, pdf1, schema="a double, g1 string, k bigint"),
        _sdf(spark, pdf2, schema="b double, g2 string, v bigint"),
        *conds,
        how=how,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    left=_vals,
    lo=_vals,
    strict=st.booleans(),
    how=st.sampled_from(["inner", "left"]),
)
def test_fuzz_conditional_join_interval(spark, left, lo, strict, how):
    # value-in-interval: lo <(=) a <(=) lo+3 — the bucketized range path
    n2 = len(lo)
    pdf1 = pd.DataFrame({"a": _f(left), "k": range(len(left))})
    pdf2 = pd.DataFrame(
        {
            "lo": _f(lo),
            "hi": pd.array([None if v is None else float(v) + 3.0 for v in lo], dtype="float64"),
            "v": range(n2),
        }
    )
    ops = (">", "<") if strict else (">=", "<=")
    conds = [("a", "lo", ops[0]), ("a", "hi", ops[1])]
    exp = pdf1.copy(deep=True).conditional_join(
        pdf2.copy(deep=True), *conds, how=how
    )
    got = pj.conditional_join(
        _sdf(spark, pdf1, schema="a double, k bigint"),
        _sdf(spark, pdf2, schema="lo double, hi double, v bigint"),
        *conds,
        how=how,
    )
    compare(spark, exp, got)
