"""Skew utilities: salted join and skew-safe exact distinct."""

from __future__ import annotations

from pyspark.sql import functions as F

import pyjanitor_spark as pj
from pyjanitor_spark.plans import shuffle_count


def test_skew_join_matches_plain_join(spark):
    # one pathologically hot key (80% of rows) + a long tail
    left = spark.createDataFrame(
        [(0 if i % 5 else i, i) for i in range(500)], ["k", "lv"]
    )
    right = spark.createDataFrame([(i, i * 10) for i in range(50)], ["k", "rv"])
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = pj.skew_join(left, right, "k", salt=8).select("k", "lv", "rv")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    assert "__salt" not in salted.columns


def test_skew_join_left(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x")], ["k", "rv"])
    out = pj.skew_join(left, right, "k", how="left", salt=4)
    got = {r["k"]: r["rv"] for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_count_distinct_exact(spark, lineitem):
    fast = pj.count_distinct_exact(lineitem, "l_returnflag", "l_partkey")
    slow = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_distinct")
    )
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, slow.collect()))
    assert a == b
    # shuffle key of stage 1 includes the value column (skew-spread)
    assert shuffle_count(fast) == 2
