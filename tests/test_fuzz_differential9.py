"""Fuzz differentials, ninth wave: ``asof_join`` against
``pd.merge_asof`` — the op is beyond the reference (its docstring names
merge_asof as the semantic model), so pandas itself is the live oracle.
Random left/right timelines with duplicate keys, by-groups, every
direction, tolerance, and allow_exact_matches.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from tests.test_reference_differential import _sdf, compare

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

FUZZ = settings(max_examples=12, deadline=None, derandomize=True)

_times = st.lists(st.integers(0, 30), min_size=1, max_size=8)


def _frame(times, by, prefix):
    n = len(times)
    return pd.DataFrame(
        {
            "on": pd.array([float(t) for t in times], dtype="float64"),
            "g": [by[i % len(by)] for i in range(n)],
            f"{prefix}val": [float(i * 10) for i in range(n)],
        }
    )


@FUZZ
@given(
    lt=_times,
    rt=_times,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    allow_exact=st.booleans(),
    tolerance=st.sampled_from([None, 0.0, 2.0, 5.0]),
    use_by=st.booleans(),
)
def test_fuzz_asof_join(spark, lt, rt, direction, allow_exact, tolerance, use_by):
    # merge_asof forbids tolerance=0 with allow_exact_matches=False
    assume(not (tolerance == 0.0 and not allow_exact))
    by = ["a", "b"] if use_by else ["a"]
    left = _frame(sorted(lt), by, "l")
    right = _frame(sorted(rt), by, "r")
    # deterministic tie rule requires unique (g, on) on the RIGHT:
    # merge_asof picks the LAST right row among equal keys by row
    # position, which Spark cannot see — dedupe instead of depending
    # on it
    right = right.drop_duplicates(subset=["g", "on"], keep="last").reset_index(
        drop=True
    )
    kw = dict(
        on="on",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact,
    )
    exp = pd.merge_asof(
        left.sort_values(["on", "g"], kind="stable"),
        right.sort_values(["on", "g"], kind="stable"),
        by="g",
        **kw,
    )
    got = pj.asof_join(
        _sdf(spark, left, schema="on double, g string, lval double"),
        _sdf(spark, right, schema="on double, g string, rval double"),
        by="g",
        **kw,
    )
    # align naming: our suffix applies only on collisions; merge_asof
    # appends _x/_y — both sides here have disjoint payload names, so
    # only the on/g columns survive once in each engine
    exp = exp[["on", "g", "lval", "rval"]]
    got = got.select("on", "g", "lval", "rval")
    compare(spark, exp, got)
