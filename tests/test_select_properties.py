"""Property tests for the select-syntax resolver (pure Python — no
Spark session needed, so hypothesis can run many examples cheaply)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given
from hypothesis import strategies as st

from pyjanitor_spark.utils.select import DropLabel, resolve_columns

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier


names = st.lists(
    st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
    min_size=1,
    max_size=12,
    unique=True,
)


@given(names)
def test_no_args_returns_all(cols):
    assert resolve_columns(cols) == cols


@given(names)
def test_exact_name_resolves_to_itself(cols):
    for c in cols:
        assert resolve_columns(cols, c) == [c]


@given(names)
def test_invert_partitions(cols):
    pick = cols[: len(cols) // 2]
    kept = resolve_columns(cols, pick) if pick else []
    dropped = resolve_columns(cols, pick, invert=True) if pick else cols
    assert sorted(kept + dropped) == sorted(cols)
    assert set(kept) & set(dropped) == set()


@given(names)
def test_droplabel_is_complement(cols):
    target = cols[0]
    out = resolve_columns(cols, DropLabel(target))
    assert target not in out
    assert out == [c for c in cols if c != target]


@given(names)
def test_regex_matches_search_semantics(cols):
    pat = re.compile("a")
    expected = [c for c in cols if pat.search(c)]
    if expected:
        assert resolve_columns(cols, pat) == expected


@given(names)
def test_callable_selector(cols):
    expected = [c for c in cols if len(c) > 3]
    if expected:
        assert resolve_columns(cols, lambda c: len(c) > 3) == expected


@given(names)
def test_order_and_dedup_preserved(cols):
    # duplicated selectors must not duplicate output; order follows columns
    out = resolve_columns(cols, list(cols) + list(cols))
    assert out == cols


@given(names)
def test_slice_label_bounds(cols):
    if len(cols) >= 3:
        out = resolve_columns(cols, slice(cols[1], cols[-1]))
        assert out == cols[1:]



def test_patterns_helper_parity():
    # ref functions/utils.py:140-164 — deprecated compile wrapper
    import re
    import warnings

    import pyjanitor_spark as pj

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pat = pj.patterns("^a_")
    assert isinstance(pat, re.Pattern) and pat.pattern == "^a_"
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pytest

        with pytest.raises(TypeError):
            pj.patterns(3)
