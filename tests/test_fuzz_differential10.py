"""Fuzz differentials, tenth wave: structural column operations —
duplicate-row detection subsets, empty-row/column removal, constant and
duplicate column dropping, column movement/reordering, and
function-form renames.  Same contract as the earlier waves: the
reference executes live on a deep copy, pinned ``derandomize=True``
after wider randomized sweeps ran clean.
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
    a=st.lists(st.sampled_from(["x", "y", "z"]), min_size=2, max_size=10),
    b=st.lists(st.integers(0, 2), min_size=2, max_size=10),
    subset=st.sampled_from([None, ["a"], ["b"], ["a", "b"]]),
)
def test_fuzz_get_dupes(spark, a, b, subset):
    n = min(len(a), len(b))
    pdf = pd.DataFrame({"a": a[:n], "b": b[:n], "k": range(n)})
    # the reference keeps ALL rows of every duplicated key set
    exp = pdf.copy(deep=True).get_dupes(column_names=subset)
    got = pj.get_dupes(
        _sdf(spark, pdf, schema="a string, b bigint, k bigint"),
        column_names=subset,
    )
    if subset is None:
        # with k unique, full-row dupes require identical k — none; the
        # comparison is the empty set both sides
        assert got.count() == len(exp) == 0
        return
    compare(spark, exp.reset_index(drop=True), got)


@FUZZ
@given(
    n=st.integers(1, 6),
    empty_rows=st.lists(st.booleans(), min_size=1, max_size=6),
    empty_col=st.booleans(),
)
def test_fuzz_remove_empty(spark, n, empty_rows, empty_col):
    rows = (empty_rows * n)[:n]
    pdf = pd.DataFrame(
        {
            "a": [None if e else float(i) for i, e in enumerate(rows)],
            "b": [None if e else f"s{i}" for i, e in enumerate(rows)],
            "c": [None] * n if empty_col else [1.0] * n,
        }
    )
    exp = pdf.copy(deep=True).remove_empty()
    exp_cols = [str(c) for c in exp.columns]
    got = pj.remove_empty(
        _sdf(spark, pdf, schema="a double, b string, c double")
    )
    assert got.columns == exp_cols
    compare(spark, exp.reset_index(drop=True), got)


@FUZZ
@given(
    const_a=st.booleans(),
    const_b=st.booleans(),
    val=st.integers(-5, 5),
    n=st.integers(2, 8),
)
def test_fuzz_drop_constant_columns(spark, const_a, const_b, val, n):
    pdf = pd.DataFrame(
        {
            "a": [float(val)] * n if const_a else [float(i) for i in range(n)],
            "b": ["c"] * n if const_b else [f"s{i}" for i in range(n)],
            "k": range(n),
        }
    )
    exp = pdf.copy(deep=True).drop_constant_columns()
    got = pj.drop_constant_columns(
        _sdf(spark, pdf, schema="a double, b string, k bigint")
    )
    assert got.columns == [str(c) for c in exp.columns]
    compare(spark, exp, got)


@FUZZ
@given(
    cols=st.permutations(["a", "b", "c", "d"]),
    source=st.sampled_from(["a", "b", "c", "d"]),
    target=st.sampled_from(["a", "b", "c", "d"]),
    position=st.sampled_from(["before", "after"]),
)
def test_fuzz_move_column(spark, cols, source, target, position):
    assume(source != target)
    pdf = pd.DataFrame({c: [i, i + 1] for i, c in enumerate(cols)})
    exp = pdf.copy(deep=True).move(
        source=source, target=target, position=position, axis=1
    )
    got = pj.move(
        _sdf(spark, pdf), source=source, target=target, position=position,
        axis=1,
    )
    assert got.columns == [str(c) for c in exp.columns]


@FUZZ
@given(
    cols=st.permutations(["a", "b", "c", "d"]),
    head=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4,
        unique=True,
    ),
)
def test_fuzz_reorder_columns(spark, cols, head):
    pdf = pd.DataFrame({c: [1, 2] for c in cols})
    exp = pdf.copy(deep=True).reorder_columns(head)
    got = pj.reorder_columns(_sdf(spark, pdf), head)
    assert got.columns == [str(c) for c in exp.columns]


@FUZZ
@given(
    names=st.lists(
        st.sampled_from(["Aa", "b_C", "d9", "e e"]), min_size=1, max_size=4,
        unique=True,
    ),
    fn=st.sampled_from([str.lower, str.upper, str.title]),
)
def test_fuzz_rename_columns_function(spark, names, fn):
    pdf = pd.DataFrame({n: [1, 2] for n in names})
    exp = pdf.copy(deep=True).rename_columns(function=fn)
    exp_cols = [str(c) for c in exp.columns]
    assume(len(set(exp_cols)) == len(exp_cols))
    got = pj.rename_columns(_sdf(spark, pdf), function=fn)
    assert got.columns == exp_cols
