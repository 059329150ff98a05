"""Fuzz differentials, fifth wave: datetime surfaces and grouped
rankers — random dates through ``to_datetime`` format/coerce paths,
``truncate_datetime_dataframe`` over every datepart,
``filter_date`` bound/component filters, ``groupby_topk`` with ties and
nulls, ``min_max_scale`` random feature ranges, and ``flag_nulls``
random subsets.  Same contract as the earlier waves: the reference
executes live on a deep copy, pinned ``derandomize=True`` after wider
randomized sweeps ran clean.
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

_date = st.dates(
    min_value=pd.Timestamp("1971-01-01").date(),
    max_value=pd.Timestamp("2199-12-31").date(),
)
_ts = st.datetimes(
    min_value=pd.Timestamp("1971-01-01"),
    max_value=pd.Timestamp("2199-12-31"),
)


@FUZZ
@given(
    dates=st.lists(_date, min_size=1, max_size=6),
    fmt=st.sampled_from(["%Y-%m-%d", "%d/%m/%Y", "%Y%m%d", "%m-%d-%Y"]),
    garbage=st.booleans(),
)
def test_fuzz_to_datetime_format_coerce(spark, dates, fmt, garbage):
    vals = [d.strftime(fmt) for d in dates]
    if garbage:
        vals = vals + ["not a date"]
    pdf = pd.DataFrame({"d": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).to_datetime("d", format=fmt, errors="coerce")
    got = pj.to_datetime(
        _sdf(spark, pdf, schema="d string, k bigint"),
        "d",
        format=fmt,
        errors="coerce",
    )
    compare(spark, exp, got)


@FUZZ
@given(
    stamps=st.lists(_ts, min_size=1, max_size=6),
    part=st.sampled_from(
        ["year", "month", "day", "hour", "minute", "second"]
    ),
)
def test_fuzz_truncate_datetime(spark, stamps, part):
    # whole-microsecond stamps: Spark timestamps are µs, pandas ns
    stamps = [s.replace(microsecond=(s.microsecond // 1000) * 1000) for s in stamps]
    pdf = pd.DataFrame(
        {"t": pd.Series(stamps, dtype="datetime64[ns]"), "k": range(len(stamps))}
    )
    exp = pdf.copy(deep=True).truncate_datetime_dataframe(part.upper())
    got = pj.truncate_datetime_dataframe(_sdf(spark, pdf), part)
    compare(spark, exp, got)


@FUZZ
@given(
    dates=st.lists(_date, min_size=1, max_size=8),
    mode=st.sampled_from(["range", "start", "end", "years", "months", "days"]),
    bound_lo=_date,
    span=st.integers(0, 2000),
)
def test_fuzz_filter_date(spark, dates, mode, bound_lo, span):
    pdf = pd.DataFrame(
        {
            "d": pd.Series(pd.to_datetime(dates)),
            "k": range(len(dates)),
        }
    )
    kw = {}
    if mode in ("range", "start"):
        kw["start_date"] = bound_lo.isoformat()
    if mode in ("range", "end"):
        kw["end_date"] = (
            pd.Timestamp(bound_lo) + pd.Timedelta(days=span)
        ).date().isoformat()
    if mode == "years":
        kw["years"] = sorted({d.year for d in dates[::2]} or {2000})
    if mode == "months":
        kw["months"] = sorted({d.month for d in dates[::2]} or {1})
    if mode == "days":
        kw["days"] = sorted({d.day for d in dates[::2]} or {1})
    exp = pdf.copy(deep=True).filter_date("d", **kw)
    got = pj.filter_date(_sdf(spark, pdf), "d", **kw)
    compare(spark, exp.reset_index(drop=True), got)


@FUZZ
@given(
    keys=st.lists(st.sampled_from(["g", "h"]), min_size=1, max_size=10),
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 4)), min_size=1, max_size=10
    ),
    k=st.integers(1, 4),
    ascending=st.booleans(),
)
def test_fuzz_groupby_topk(spark, keys, vals, k, ascending):
    n = min(len(keys), len(vals))
    pdf = pd.DataFrame(
        {
            "g": keys[:n],
            "v": pd.array(
                [None if x is None else float(x) for x in vals[:n]],
                dtype="float64",
            ),
            # unique tiebreak so top-k under ties is deterministic in
            # BOTH engines (pandas keeps row order; Spark has none)
            "uid": range(n),
        }
    )
    exp = pdf.copy(deep=True).groupby_topk(
        by="g", column="v", k=k, ascending=ascending
    )
    got = pj.groupby_topk(
        _sdf(spark, pdf, schema="g string, v double, uid bigint"),
        by="g",
        column="v",
        k=k,
        ascending=ascending,
    )
    # ties at the k boundary make membership order-dependent — compare
    # the per-group VALUE multisets instead of row identity
    def canon(frame):
        return sorted(
            (g, sorted(sub["v"].fillna(-1e18))) for g, sub in frame.groupby("g")
        )
    assert canon(got.toPandas()) == canon(exp)


@FUZZ
@given(
    keys=st.lists(st.sampled_from(["g", "h"]), min_size=1, max_size=8),
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 4)), min_size=1, max_size=8
    ),
    ascending=st.booleans(),
)
def test_fuzz_take_first(spark, keys, vals, ascending):
    # all-null groups keep one (null) row: pandas sort_values is
    # nulls-last, never row-dropping
    n = min(len(keys), len(vals))
    pdf = pd.DataFrame(
        {
            "g": keys[:n],
            "v": pd.array(
                [None if x is None else float(x) for x in vals[:n]],
                dtype="float64",
            ),
        }
    )
    exp = pdf.copy(deep=True).take_first(subset="g", by="v", ascending=ascending)
    got = pj.take_first(
        _sdf(spark, pdf, schema="g string, v double"),
        subset="g",
        by="v",
        ascending=ascending,
    )
    # first-row identity under value ties is row-order-dependent in
    # pandas; compare the (group, value) pairs
    a = sorted(map(tuple, got.toPandas().fillna(-1e18).values.tolist()))
    b = sorted(map(tuple, exp.fillna(-1e18).values.tolist()))
    assert a == b


@FUZZ
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=2,
        max_size=8,
    ),
    lo=st.integers(-5, 0),
    hi=st.integers(1, 5),
)
def test_fuzz_min_max_scale(spark, vals, lo, hi):
    assume(len({v for v in vals if v is not None}) >= 2)
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="float64"), "k": range(len(vals))})
    exp = pdf.copy(deep=True).min_max_scale(
        feature_range=(float(lo), float(hi)), column_name="v"
    )
    got = pj.min_max_scale(
        _sdf(spark, pdf, schema="v double, k bigint"),
        feature_range=(float(lo), float(hi)),
        column_name="v",
    )
    compare(spark, exp, got)


@FUZZ
@given(
    a=st.lists(st.one_of(st.none(), st.integers(0, 3)), min_size=1, max_size=8),
    b=st.lists(
        st.one_of(st.none(), st.sampled_from(["p", "q"])), min_size=1, max_size=8
    ),
    subset=st.sampled_from([None, ["a"], ["b"], ["a", "b"]]),
)
def test_fuzz_flag_nulls(spark, a, b, subset):
    n = min(len(a), len(b))
    pdf = pd.DataFrame(
        {
            "a": pd.array(
                [None if v is None else float(v) for v in a[:n]], dtype="float64"
            ),
            "b": b[:n],
            "k": range(n),
        }
    )
    exp = pdf.copy(deep=True).flag_nulls(columns=subset)
    got = pj.flag_nulls(
        _sdf(spark, pdf, schema="a double, b string, k bigint"), columns=subset
    )
    compare(spark, exp, got)
