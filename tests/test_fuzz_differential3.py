"""Fuzz differentials, third wave: selector grammar, conditional
expressions, epoch converters, string split/one-hot reshapes, and
appearance-order encoders — the surfaces where a subtle grammar or
ordering mismatch would hide from hand-written cases.  Same contract as
the first two waves: the reference executes live on a deep copy, pinned
``derandomize=True`` after wider randomized sweeps ran clean.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from tests.reference_janitor import load_reference
from tests.test_reference_differential import _sdf, compare

ref = load_reference()
pytestmark = [pytest.mark.slow] + [pytest.mark.skipif(
    ref is None, reason="reference janitor not importable in this environment"
)]

FUZZ = settings(max_examples=12, deadline=None, derandomize=True)

_COLS = ["aa", "ab", "ba", "x1", "y_2", "ax9"]


@FUZZ
@given(
    present=st.lists(
        st.sampled_from(_COLS), min_size=2, max_size=6, unique=True
    ),
    selector=st.sampled_from(
        ["aa", "a*", "*1", "?a", "[ab]a", "*", ["aa", "ba"], ["x1"]]
    ),
    invert=st.booleans(),
)
def test_fuzz_select_columns_glob(spark, present, selector, invert):
    pdf = pd.DataFrame({c: [1, 2] for c in present})
    sels = selector if isinstance(selector, list) else [selector]
    try:
        exp = pdf.copy(deep=True).select_columns(*sels, invert=invert)
    except KeyError:
        # selector matches nothing: both engines must refuse
        with pytest.raises(KeyError):
            pj.select_columns(_sdf(spark, pdf), *sels, invert=invert)
        return
    got = pj.select_columns(_sdf(spark, pdf), *sels, invert=invert)
    assert got.columns == [str(c) for c in exp.columns]


@FUZZ
@given(
    vals=st.lists(
        st.floats(-50, 50, allow_nan=False), min_size=1, max_size=8
    ),
    cut1=st.integers(-40, 40),
    cut2=st.integers(-40, 40),
    default=st.one_of(st.integers(-5, 5), st.just(99)),
)
def test_fuzz_case_when(spark, vals, cut1, cut2, default):
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    # condition strings evaluate in both engines (pandas eval / Spark SQL)
    args = [f"v < {cut1}", -1.0, f"v < {cut2}", -2.0]
    exp = pdf.copy(deep=True).case_when(
        *args, float(default), column_name="out"
    )
    got = pj.case_when(
        _sdf(spark, pdf, schema="v double, k bigint"),
        *args,
        float(default),
        column_name="out",
    )
    compare(spark, exp, got)


@FUZZ
@given(
    serials=st.lists(
        st.integers(1, 80_000),  # 1900..2119 in excel day serials
        min_size=1,
        max_size=8,
    )
)
def test_fuzz_convert_excel_date(spark, serials):
    pdf = pd.DataFrame({"d": serials, "k": range(len(serials))})
    exp = pdf.copy(deep=True).convert_excel_date("d")
    got = pj.convert_excel_date(
        _sdf(spark, pdf, schema="d bigint, k bigint"), "d"
    )
    compare(spark, exp, got)


@FUZZ
@given(
    epochs=st.lists(
        st.integers(0, 4_000_000_000), min_size=1, max_size=8
    )
)
def test_fuzz_convert_unix_date(spark, epochs):
    pdf = pd.DataFrame({"t": epochs, "k": range(len(epochs))})
    exp = pdf.copy(deep=True).convert_unix_date("t")
    got = pj.convert_unix_date(
        _sdf(spark, pdf, schema="t bigint, k bigint"), "t"
    )
    compare(spark, exp, got)


_TOKEN = st.text(alphabet="abcXY9", min_size=1, max_size=4)


@FUZZ
@given(
    parts=st.lists(
        st.tuples(_TOKEN, _TOKEN, _TOKEN), min_size=1, max_size=6
    ),
    preserve_position=st.booleans(),
)
def test_fuzz_deconcatenate_column(spark, parts, preserve_position):
    pdf = pd.DataFrame(
        {"joined": ["-".join(p) for p in parts], "k": range(len(parts))}
    )
    kw = dict(
        sep="-",
        new_column_names=["p1", "p2", "p3"],
        preserve_position=preserve_position,
    )
    exp = pdf.copy(deep=True).deconcatenate_column("joined", **kw)
    got = pj.deconcatenate_column(
        _sdf(spark, pdf, schema="joined string, k bigint"), "joined", **kw
    )
    compare(spark, exp, got)


@FUZZ
@given(
    toks=st.lists(
        st.lists(_TOKEN, min_size=1, max_size=3, unique=True),
        min_size=1,
        max_size=6,
    ),
    concat=st.booleans(),
)
def test_fuzz_expand_column(spark, toks, concat):
    pdf = pd.DataFrame(
        {"tags": ["|".join(t) for t in toks], "k": range(len(toks))}
    )
    exp = pdf.copy(deep=True).expand_column("tags", sep="|", concat=concat)
    got = pj.expand_column(
        _sdf(spark, pdf, schema="tags string, k bigint"),
        "tags",
        sep="|",
        concat=concat,
    )
    # bool dummies render as int in Spark; compare() normalizes values,
    # but the column ORDER is part of the one-hot contract
    assert got.columns == [str(c) for c in exp.columns]
    exp = exp.astype({c: int for c in exp.columns if exp[c].dtype == bool})
    compare(spark, exp, got)


@FUZZ
@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["r", "s", "t", ""])),
        min_size=1,
        max_size=8,
    ),
)
def test_fuzz_factorize_appearance_order(spark, vals):
    pdf = pd.DataFrame({"c": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).factorize_columns("c")
    got = pj.factorize_columns(
        _sdf(spark, pdf, schema="c string, k bigint"), "c", order_by="k"
    )
    compare(spark, exp, got)


@FUZZ
@given(
    vals=st.lists(
        st.one_of(st.none(), st.sampled_from(["r", "s", "t"])),
        min_size=1,
        max_size=8,
    ),
)
def test_fuzz_label_encode(spark, vals):
    pdf = pd.DataFrame({"c": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).label_encode("c")
    got = pj.label_encode(
        _sdf(spark, pdf, schema="c string, k bigint"), "c", order_by="k"
    )
    compare(spark, exp, got)
