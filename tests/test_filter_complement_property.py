"""Property: every filter verb with a complement/invert form partitions
the frame EXACTLY — keep + complement == all rows, disjoint — no matter
where nulls sit.  This is the invariant behind pandas boolean-mask
complements (NaN comparisons are False before the negation), enforced
after the round-7 null-semantics sweep (``filters.py``,
``columns.py:select_rows``).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier


def _frame(spark, seed: int, n: int = 120):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = None if rng.random() < 0.25 else rng.uniform(-5, 5)
        s = None if rng.random() < 0.25 else rng.choice(["alpha", "beta", "gamma", "b"])
        rows.append((i, x, s))
    return spark.createDataFrame(rows, "id long, x double, s string")


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_filter_on_partitions(spark, seed):
    df = _frame(spark, seed)
    keep = pj.filter_on(df, "x > 1")
    comp = pj.filter_on(df, "x > 1", complement=True)
    assert keep.count() + comp.count() == df.count()
    assert keep.intersect(comp).count() == 0
    # null-evaluating rows all land in the complement
    assert comp.where(F.col("x").isNull()).count() == df.where(F.col("x").isNull()).count()


@pytest.mark.parametrize("seed", [3, 11])
def test_filter_column_isin_partitions(spark, seed):
    df = _frame(spark, seed)
    keep = pj.filter_column_isin(df, "s", ["alpha", "b"])
    comp = pj.filter_column_isin(df, "s", ["alpha", "b"], complement=True)
    assert keep.count() + comp.count() == df.count()
    assert comp.where(F.col("s").isNull()).count() == df.where(F.col("s").isNull()).count()


@pytest.mark.parametrize("seed", [5, 13])
def test_filter_string_partitions_with_na(spark, seed):
    df = _frame(spark, seed)
    for na in (True, False):
        keep = pj.filter_string(df, "s", "a", na=na)
        comp = pj.filter_string(df, "s", "a", na=na, complement=True)
        assert keep.count() + comp.count() == df.count()
    # without na=, null cells refuse to be masked (pandas contract)
    if df.where(F.col("s").isNull()).count():
        with pytest.raises(Exception):
            pj.filter_string(df, "s", "a").collect()


@pytest.mark.parametrize("seed", [9, 17])
def test_select_rows_invert_partitions(spark, seed):
    df = _frame(spark, seed)
    keep = pj.select_rows(df, F.col("x") > 1)
    inv = pj.select_rows(df, F.col("x") > 1, invert=True)
    assert keep.count() + inv.count() == df.count()
    assert inv.where(F.col("x").isNull()).count() == df.where(F.col("x").isNull()).count()
