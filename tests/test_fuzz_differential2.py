"""Fuzz differentials, second wave: the high-matrix reshape/aggregate
verbs — random long/wide layouts through ``pivot_wider`` and
``complete``, random null patterns through ``impute``/``fill_direction``,
null GROUP KEYS through ``groupby_agg``, random name collisions through
``limit_column_characters``/``row_to_names``, and generated messy
currency strings.  Same contract as ``test_fuzz_differential``: the
reference executes live on a deep copy (several reference verbs mutate
their input), pinned ``derandomize=True`` after wider randomized sweeps
ran clean.
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


@FUZZ
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                  # id
            st.sampled_from(["a", "b", "c"]),   # names_from
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    ),
    two_values=st.booleans(),
)
def test_fuzz_pivot_wider(spark, rows, two_values):
    # one value per (id, nm): pandas pivot raises on duplicates
    seen = {}
    for i, nm, v in rows:
        seen[(i, nm)] = v
    assume(seen)
    recs = [
        {"id": i, "nm": nm, "v1": v, "v2": v * 2 if two_values else None}
        for (i, nm), v in sorted(seen.items())
    ]
    pdf = pd.DataFrame(recs)
    values_from = ["v1", "v2"] if two_values else "v1"
    if not two_values:
        pdf = pdf.drop(columns="v2")
    exp = pdf.copy(deep=True).pivot_wider(
        index="id", names_from="nm", values_from=values_from
    )
    got = pj.pivot_wider(
        _sdf(spark, pdf),
        index="id",
        names_from="nm",
        values_from=values_from,
    )
    # pivot_wider's column ORDER is part of the contract (values-major
    # for multi-values_from) — check it before the multiset compare
    assert got.columns == [str(c) for c in exp.columns]
    compare(spark, exp, got)


@FUZZ
@given(
    g1=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=6),
    fill_value=st.one_of(st.none(), st.integers(-9, 9)),
    explicit=st.booleans(),
)
def test_fuzz_complete(spark, g1, fill_value, explicit):
    n = len(g1)
    pdf = pd.DataFrame(
        {
            "g1": g1,
            "g2": [i % 2 for i in range(n)],
            "val": [None if i % 3 == 0 else float(i) for i in range(n)],
        }
    )
    kw = dict(fill_value=fill_value, explicit=explicit)
    exp = pdf.copy(deep=True).complete("g1", "g2", **kw)
    got = pj.complete(
        _sdf(spark, pdf, schema="g1 string, g2 bigint, val double"),
        "g1",
        "g2",
        **kw,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=2,
        max_size=8,
    ),
    stat=st.sampled_from(
        # the reference's full statistic set ('sum' is this repo's
        # documented superset — the reference raises KeyError on it)
        ["mean", "average", "median", "mode", "minimum", "min",
         "maximum", "max"]
    ),
)
def test_fuzz_impute_statistics(spark, vals, stat):
    assume(any(v is not None for v in vals))
    pdf = pd.DataFrame({"v": vals, "k": range(len(vals))})
    exp = pdf.copy(deep=True).impute("v", statistic_column_name=stat)
    got = pj.impute(
        _sdf(spark, pdf, schema="v double, k bigint"),
        "v",
        statistic_column_name=stat,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    a=st.lists(
        st.one_of(st.none(), st.integers(-99, 99)), min_size=2, max_size=8
    ),
    b=st.lists(
        st.one_of(st.none(), st.sampled_from(["p", "q", ""])),
        min_size=2,
        max_size=8,
    ),
    dir_a=st.sampled_from(["up", "down", "updown", "downup"]),
    dir_b=st.sampled_from(["up", "down", "updown", "downup"]),
)
def test_fuzz_fill_direction(spark, a, b, dir_a, dir_b):
    n = min(len(a), len(b))
    pdf = pd.DataFrame(
        {
            "a": [None if v is None else float(v) for v in a[:n]],
            "b": b[:n],
            "k": range(n),
        }
    )
    exp = pdf.copy(deep=True).fill_direction(a=dir_a, b=dir_b)
    got = pj.fill_direction(
        _sdf(spark, pdf, schema="a double, b string, k bigint"),
        directions={"a": dir_a, "b": dir_b},
        order_by="k",
    )
    compare(spark, exp, got)


@FUZZ
@given(
    keys=st.lists(
        st.one_of(st.none(), st.sampled_from(["g", "h"])),
        min_size=1,
        max_size=8,
    ),
    agg=st.sampled_from(["sum", "mean", "count", "min", "max", "median"]),
    dropna=st.booleans(),
)
def test_fuzz_groupby_agg_null_keys(spark, keys, agg, dropna):
    n = len(keys)
    pdf = pd.DataFrame({"g": keys, "v": [float(i) for i in range(n)]})
    exp = pdf.copy(deep=True).groupby_agg(
        by="g",
        new_column_name="out",
        agg_column_name="v",
        agg=agg,
        dropna=dropna,
    )
    got = pj.groupby_agg(
        _sdf(spark, pdf, schema="g string, v double"),
        by="g",
        new_column_name="out",
        agg_column_name="v",
        agg=agg,
        dropna=dropna,
    )
    compare(spark, exp, got)


@FUZZ
@given(
    names=st.lists(
        st.text(alphabet="abcXY_9", min_size=1, max_size=6),
        min_size=1,
        max_size=5,
        unique=True,
    ),
    limit=st.integers(1, 5),
)
def test_fuzz_limit_column_characters(spark, names, limit):
    pdf = pd.DataFrame({n: [1, 2] for n in names})
    exp = pdf.copy(deep=True).limit_column_characters(limit)
    exp_cols = [str(c) for c in exp.columns]
    assume(len(set(exp_cols)) == len(exp_cols))
    got = pj.limit_column_characters(_sdf(spark, pdf), limit)
    assert got.columns == exp_cols


@FUZZ
@given(
    nrows=st.integers(2, 6),
    pick=st.sampled_from([0, 1, "list", "slice"]),
    remove_rows=st.booleans(),
    remove_rows_above=st.booleans(),
)
def test_fuzz_row_to_names(spark, nrows, pick, remove_rows, remove_rows_above):
    pdf = pd.DataFrame(
        {
            "c1": [f"n{r}" for r in range(nrows)],
            "c2": [f"m{r}" for r in range(nrows)],
        }
    )
    if pick == "list":
        row_numbers = [0, 1]
    elif pick == "slice":
        row_numbers = slice(1, nrows)
    else:
        row_numbers = pick
    kw = dict(
        row_numbers=row_numbers,
        remove_rows=remove_rows,
        remove_rows_above=remove_rows_above,
    )
    try:
        exp = pdf.copy(deep=True).row_to_names(**kw)
    except Exception:
        assume(False)
    # multi-row picks give pandas a MultiIndex; Spark columns are flat,
    # so the verb's documented mapping is the collapse_levels underscore
    # join of each tuple
    exp_cols = [
        "_".join(map(str, c)) if isinstance(c, tuple) else str(c)
        for c in exp.columns
    ]
    exp.columns = exp_cols
    assume(len(set(exp_cols)) == len(exp_cols))
    # spark frames are unordered; the verb takes the row order explicitly
    sdf = _sdf(spark, pdf.assign(__order=range(nrows)))
    got = pj.row_to_names(sdf, order_by="__order", **kw).drop("__order")
    assert got.columns == exp_cols
    exp = exp.reset_index(drop=True)
    compare(spark, exp, got)


_CURRENCY = st.one_of(
    st.none(),
    st.integers(-9999, 9999).map(lambda v: f"{v:,}"),
    st.floats(-999, 999, allow_nan=False).map(lambda v: f"{round(v, 2):,}"),
    st.integers(1, 9999).map(lambda v: f"({v:,})"),   # accounting negative
    st.integers(1, 9999).map(lambda v: f"({v:,}.25)"),
    st.just("-"),                                      # accounting zero
    st.just("1,234.56"),
)


@FUZZ
@given(col=st.lists(_CURRENCY, min_size=1, max_size=8))
def test_fuzz_currency_accounting(spark, col):
    pdf = pd.DataFrame({"money": col, "k": range(len(col))})
    exp = pdf.copy(deep=True).currency_column_to_numeric(
        "money", cleaning_style="accounting"
    )
    got = pj.currency_column_to_numeric(
        _sdf(spark, pdf, schema="money string, k bigint"),
        "money",
        cleaning_style="accounting",
    )
    compare(spark, exp, got)
