"""Fuzz differentials, seventh wave: parameterized text methods,
predicate filters, conditional updates, and grid expansion.  Same
contract as the earlier waves: the reference executes live on a deep
copy, pinned ``derandomize=True`` after wider randomized sweeps ran
clean.
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

_WORDS = ["alpha", "Beta9", "x y", "", "été", "a.b", "zz"]
_texts = st.lists(
    st.one_of(st.none(), st.sampled_from(_WORDS)), min_size=1, max_size=8
)


@FUZZ
@given(
    col=_texts,
    fn_kwargs=st.sampled_from(
        [
            ("startswith", {"pat": "a"}),
            ("endswith", {"pat": "9"}),
            ("contains", {"pat": "e", "regex": False}),
            ("slice", {"start": 1, "stop": 4}),
            ("replace", {"pat": ".", "repl": "_", "regex": False}),
            ("zfill", {"width": 6}),
            ("wrap", {"width": 3}),
            ("find", {"sub": "a"}),
        ]
    ),
)
def test_fuzz_process_text_kwargs(spark, col, fn_kwargs):
    fn, kwargs = fn_kwargs
    pdf = pd.DataFrame({"t": col, "k": range(len(col))})
    exp = pdf.copy(deep=True).process_text(
        column_name="t", string_function=fn, **kwargs
    )
    got = pj.process_text(
        _sdf(spark, pdf, schema="t string, k bigint"),
        column_name="t",
        string_function=fn,
        **kwargs,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    col=_texts,
    search=st.sampled_from(["a", "9", "é", "x", "zz"]),
    complement=st.booleans(),
    case=st.booleans(),
)
def test_fuzz_filter_string(spark, col, search, complement, case):
    pdf = pd.DataFrame({"t": col, "k": range(len(col))})
    exp = pdf.copy(deep=True).filter_string(
        "t", search, complement=complement, case=case, na=False
    )
    got = pj.filter_string(
        _sdf(spark, pdf, schema="t string, k bigint"),
        "t",
        search,
        complement=complement,
        case=case,
        na=False,
    )
    compare(spark, exp.reset_index(drop=True), got)


@FUZZ
@given(
    vals=st.lists(st.integers(-20, 20), min_size=1, max_size=8),
    cut=st.integers(-15, 15),
    complement=st.booleans(),
)
def test_fuzz_filter_on(spark, vals, cut, complement):
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    crit = f"v > {cut}"
    exp = pdf.copy(deep=True).filter_on(crit, complement=complement)
    got = pj.filter_on(
        _sdf(spark, pdf, schema="v bigint, k bigint"),
        crit,
        complement=complement,
    )
    compare(spark, exp.reset_index(drop=True), got)


@FUZZ
@given(
    vals=st.lists(st.integers(-20, 20), min_size=1, max_size=8),
    cut=st.integers(-15, 15),
    target_val=st.one_of(st.integers(-5, 5), st.none()),
)
def test_fuzz_update_where(spark, vals, cut, target_val):
    pdf = pd.DataFrame(
        {
            "v": pd.array([float(v) for v in vals], dtype="float64"),
            "w": pd.array([float(v) * 2 for v in vals], dtype="float64"),
            "k": range(len(vals)),
        }
    )
    cond = f"v > {cut}"
    tv = None if target_val is None else float(target_val)
    exp = pdf.copy(deep=True).update_where(cond, "w", tv)
    got = pj.update_where(
        _sdf(spark, pdf, schema="v double, w double, k bigint"),
        cond,
        "w",
        tv,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    a=st.lists(st.integers(0, 5), min_size=1, max_size=4, unique=True),
    b=st.lists(st.sampled_from(["p", "q", "r"]), min_size=1, max_size=3,
               unique=True),
)
def test_fuzz_expand_grid(spark, a, b):
    exp = ref.expand_grid(others={"a": a, "b": b})
    # documented naming divergence (complete.py:77-82): the reference
    # emits MultiIndex (key, position); ours keeps the flat dict key
    # for 1-D array values — map (k, 0) -> k before comparing
    exp.columns = [c[0] if isinstance(c, tuple) else str(c) for c in exp.columns]
    got = pj.expand_grid(spark, {"a": a, "b": b})
    assert sorted(got.columns) == sorted(exp.columns), (got.columns, exp.columns)
    compare(spark, exp, got)


@FUZZ
@given(
    col=_texts,
    sep=st.sampled_from(["-", "|"]),
    ignore_empty=st.booleans(),
)
def test_fuzz_concatenate_columns(spark, col, sep, ignore_empty):
    # the documented null intent (adjudicated r9,
    # test_concatenate_columns_null_intent): null -> empty segment,
    # ignore_empty collapses its separator — the reference's
    # astype(str) renders the LITERAL "None" instead, an acknowledged
    # reference bug, so the oracle here is the documented rule; the
    # reference is compared only on its null-free agreement region
    n = len(col)
    pdf = pd.DataFrame(
        {
            "x": col,
            "y": [str(i) if i % 3 else None for i in range(n)],
            "k": range(n),
        }
    )

    def expect_join(x, y):
        seg = ["" if v is None else str(v) for v in (x, y)]
        if ignore_empty:
            return sep.join(s for s in seg if s != "")
        return sep.join(seg)

    exp = pdf.assign(joined=[expect_join(x, y) for x, y in zip(pdf.x, pdf.y)])
    if pdf[["x", "y"]].notna().all().all():
        ref_out = pdf.copy(deep=True).concatenate_columns(
            ["x", "y"], "joined", sep=sep, ignore_empty=ignore_empty
        )
        assert list(ref_out["joined"]) == list(exp["joined"])
    got = pj.concatenate_columns(
        _sdf(spark, pdf, schema="x string, y string, k bigint"),
        ["x", "y"],
        "joined",
        sep=sep,
        ignore_empty=ignore_empty,
    )
    compare(spark, exp, got)
