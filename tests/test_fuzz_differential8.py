"""Fuzz differentials, eighth wave: RANDOM VERB PIPELINES.  A chain of
3-5 verbs drawn and ordered at random runs end-to-end on both engines —
this is where schema-propagation and interaction bugs live (a verb that
subtly retypes or renames breaks the NEXT verb, which no single-verb
differential sees).  Verbs in the pool keep the frame's column contract
(`s` string, `x` double, `k` bigint) so every ordering is valid.
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


def _ops(p):
    """name -> (pandas_step, spark_step), closed over drawn params."""
    return {
        "fill_s": (
            lambda d: d.fill_empty(column_names=["s"], value=p["fill"]),
            lambda d: pj.fill_empty(d, ["s"], p["fill"]),
        ),
        "impute_x": (
            lambda d: d.impute("x", statistic_column_name="mean"),
            lambda d: pj.impute(d, "x", statistic_column_name="mean"),
        ),
        "flag": (
            lambda d: d.flag_nulls(columns=["s", "x"]),
            lambda d: pj.flag_nulls(d, columns=["s", "x"]),
        ),
        "filter_x": (
            lambda d: d.filter_on(f"x > {p['cut']}"),
            lambda d: pj.filter_on(d, f"x > {p['cut']}"),
        ),
        "round_x": (
            lambda d: d.round_to_fraction("x", 4.0, 2),
            lambda d: pj.round_to_fraction(d, "x", 4.0, 2),
        ),
        "case": (
            lambda d: d.case_when(
                f"x < {p['cut']}", -1.0, 99.0, column_name="cw"
            ),
            lambda d: pj.case_when(
                d, f"x < {p['cut']}", -1.0, 99.0, column_name="cw"
            ),
        ),
        "upper_s": (
            lambda d: d.process_text(column_name="s", string_function="upper"),
            lambda d: pj.process_text(
                d, column_name="s", string_function="upper"
            ),
        ),
    }


@FUZZ
@given(
    strs=st.lists(
        st.one_of(st.none(), st.sampled_from(["ab", "cD", "", "é!"])),
        min_size=1,
        max_size=8,
    ),
    xs=st.lists(
        st.one_of(st.none(), st.integers(-10, 10)), min_size=1, max_size=8
    ),
    chain=st.permutations(
        ["fill_s", "impute_x", "flag", "filter_x", "round_x", "case", "upper_s"]
    ),
    length=st.integers(3, 5),
    fill=st.sampled_from(["?", "zz", ""]),
    cut=st.integers(-8, 8),
)
def test_fuzz_pipeline_chain(spark, strs, xs, chain, length, fill, cut):
    n = min(len(strs), len(xs))
    pdf = pd.DataFrame(
        {
            "s": strs[:n],
            "x": pd.array(
                [None if v is None else float(v) for v in xs[:n]],
                dtype="float64",
            ),
            "k": range(n),
        }
    )
    ops = _ops({"fill": fill, "cut": cut})
    steps = chain[:length]
    exp = pdf.copy(deep=True)
    for name in steps:
        exp = ops[name][0](exp)
    got = _sdf(spark, pdf, schema="s string, x double, k bigint")
    for name in steps:
        got = ops[name][1](got)
    compare(spark, exp.reset_index(drop=True), got)
