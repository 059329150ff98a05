"""Differential property test for conditional_join: compare against a
brute-force pure-Python evaluation on seeded random frames (the
reference's own test strategy — `janitor/testing_utils/strategies.py`
feeds hypothesis frames to a merge+filter brute force; we use fixed
seeds for determinism and Spark-session economy)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

import pyjanitor_spark as pj

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

# Null semantics mirror the reference (pandas): '==' is null-SAFE
# (pd.merge pairs NaN keys), '!=' treats null as unequal to everything
# (so null rows match every row), range ops never match nulls.
OPS = {
    "==": lambda a, b: a == b,  # None == None is True in Python: null-safe
    "!=": lambda a, b: a is None or b is None or a != b,
    ">": lambda a, b: a is not None and b is not None and a > b,
    ">=": lambda a, b: a is not None and b is not None and a >= b,
    "<": lambda a, b: a is not None and b is not None and a < b,
    "<=": lambda a, b: a is not None and b is not None and a <= b,
}

SHAPES = [
    [("a", "x", "<"), ("a", "y", ">")],          # pure range (bucket path)
    [("a", "x", ">=")],                           # single inequality
    [("b", "k", "=="), ("a", "x", "<")],          # mixed equi + non-equi
    [("a", "x", "!=")],                           # pure not-equal
]


def _frames(seed: int, with_nulls: bool = False):
    rng = np.random.default_rng(seed)

    def mk(v):
        return None if (with_nulls and rng.random() < 0.15) else int(v)

    left = [
        {"a": mk(rng.integers(0, 20)), "b": mk(rng.integers(0, 4)), "lid": i}
        for i in range(40)
    ]
    right = [
        {
            "x": mk(rng.integers(0, 20)),
            "y": mk(rng.integers(-5, 15)),
            "k": mk(rng.integers(0, 4)),
            "rid": i,
        }
        for i in range(30)
    ]
    return left, right


def _brute(left, right, conds, how):
    inner = [
        {**l, **r}
        for l in left
        for r in right
        if all(OPS[op](l[lc], r[rc]) for lc, rc, op in conds)
    ]
    rows = [tuple(sorted(d.items())) for d in inner]
    if how in ("left", "outer"):
        matched = {tuple(sorted(l.items())) for l in left} & {
            tuple(sorted({k: d[k] for k in ("a", "b", "lid")}.items()))
            for d in inner
        }
        for l in left:
            if tuple(sorted(l.items())) not in matched:
                rows.append(
                    tuple(sorted({**l, "x": None, "y": None, "k": None, "rid": None}.items()))
                )
    if how in ("right", "outer"):
        matched = {
            tuple(sorted({k: d[k] for k in ("x", "y", "k", "rid")}.items()))
            for d in inner
        }
        for r in right:
            if tuple(sorted(r.items())) not in matched:
                rows.append(
                    tuple(sorted({**r, "a": None, "b": None, "lid": None}.items()))
                )
    return sorted(rows, key=_row_key)


def _row_key(row):
    # None-safe total order over (name, value) tuples
    return [(k, v is None, str(v)) for k, v in row]


@pytest.mark.parametrize(
    "seed,with_nulls", [(7, False), (42, False), (11, True), (23, True)]
)
@pytest.mark.parametrize("how", ["inner", "left", "right", "outer"])
@pytest.mark.parametrize("conds", SHAPES, ids=["range", "single", "mixed", "ne"])
def test_conditional_join_matches_brute_force(spark, seed, with_nulls, how, conds):
    left, right = _frames(seed, with_nulls)
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x int, y int, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, how=how)
    got = sorted(
        (tuple(sorted(r.asDict().items())) for r in out.collect()), key=_row_key
    )
    exp = _brute(left, right, conds, how)
    assert got == exp


class TestAsofJoinProperty:
    """Randomized differential test: asof_join vs a brute-force scan."""

    @staticmethod
    def _brute(left, right, direction, tolerance):
        out = {}
        for lid, g, t in left:
            cands = []
            for rg, rt, tag in right:
                if rg != g:
                    continue
                if direction == "backward" and rt <= t:
                    d = t - rt
                elif direction == "forward" and rt >= t:
                    d = rt - t
                elif direction == "nearest":
                    d = abs(rt - t)
                else:
                    continue
                if tolerance is not None and d > tolerance:
                    continue
                cands.append((d, rt, tag))
            if not cands:
                out[lid] = None
                continue
            dmin = min(c[0] for c in cands)
            best = [c for c in cands if c[0] == dmin]
            if direction == "nearest" and len(best) > 1:
                # ties to backward: the candidate with rt <= t
                back = [c for c in best if c[1] <= t]
                best = back or best
            # duplicate right 'on' values: any deterministic pick is
            # acceptable — restrict generation to unique (g, rt)
            out[lid] = best[0][2]
        return out

    def test_random_frames_all_directions(self, spark):
        import random

        rng = random.Random(42)
        for trial in range(3):
            gs = ["a", "b", "c"]
            left = [
                (i, rng.choice(gs), float(rng.randrange(0, 50)))
                for i in range(40)
            ]
            seen = set()
            right = []
            for j in range(30):
                g, t = rng.choice(gs), float(rng.randrange(0, 50))
                if (g, t) in seen:
                    continue
                seen.add((g, t))
                right.append((g, t, f"r{j}"))
            ldf = spark.createDataFrame(left, "lid int, g string, t double")
            rdf = spark.createDataFrame(right, "g string, t double, tag string")
            for direction in ("backward", "forward", "nearest"):
                for tol in (None, 5.0):
                    got = {
                        r["lid"]: r["tag"]
                        for r in pj.asof_join(
                            ldf, rdf, on="t", by="g",
                            direction=direction, tolerance=tol,
                        ).collect()
                    }
                    want = self._brute(left, right, direction, tol)
                    assert got == want, (trial, direction, tol)


@pytest.mark.parametrize("keep", ["first", "last"])
def test_keep_matches_brute_force(spark, keep):
    """keep='first'/'last' picks the min/max right row by the condition
    columns (in condition order).  Unique x per right row keeps the
    md5 content tie-break out of play, so the brute pick is exact."""
    left, right = _frames(11)
    for i, r in enumerate(right):
        r["x"] = r["x"] * 100 + i  # make the primary order key unique
    conds = [("a", "x", "<"), ("a", "y", ">")]
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x int, y int, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, keep=keep)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    exp = []
    for l in left:
        matched = [
            r for r in right
            if OPS["<"](l["a"], r["x"]) and OPS[">"](l["a"], r["y"])
        ]
        if matched:
            pick = (min if keep == "first" else max)(
                matched, key=lambda r: (r["x"], r["y"])
            )
            exp.append((l["lid"], pick["rid"]))
    assert got == sorted(exp)


def test_indicator_matches_brute_force(spark):
    left, right = _frames(13)
    conds = [("b", "k", "=="), ("a", "x", "<")]
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x int, y int, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, how="left", indicator=True)
    rows = [(r["lid"], r["rid"], r["_merge"]) for r in out.collect()]
    assert all(
        (m == "both") == (rid is not None) for _, rid, m in rows
    )
    matched_lids = {
        l["lid"] for l in left
        if any(l["b"] == r["k"] and l["a"] < r["x"] for r in right)
    }
    got_both = {lid for lid, _, m in rows if m == "both"}
    got_only = {lid for lid, _, m in rows if m == "left_only"}
    assert got_both == matched_lids
    assert got_only == {l["lid"] for l in left} - matched_lids
    # named indicator column
    named = pj.conditional_join(ldf, rdf, *conds, how="left", indicator="src")
    assert "src" in named.columns and "_merge" not in named.columns


@pytest.mark.parametrize("keep", ["first", "last"])
def test_keep_with_left_join_matches_brute_force(spark, keep):
    """keep + how='left': matched left rows keep exactly one right row
    (min/max by condition columns); unmatched left rows keep their
    single null-right row."""
    left, right = _frames(17)
    for i, r in enumerate(right):
        r["x"] = r["x"] * 100 + i
    conds = [("a", "x", "<"), ("a", "y", ">")]
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x int, y int, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, how="left", keep=keep)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    exp = []
    for l in left:
        matched = [
            r for r in right
            if OPS["<"](l["a"], r["x"]) and OPS[">"](l["a"], r["y"])
        ]
        if matched:
            pick = (min if keep == "first" else max)(
                matched, key=lambda r: (r["x"], r["y"])
            )
            exp.append((l["lid"], pick["rid"]))
        else:
            exp.append((l["lid"], None))
    def key(p):
        return (p[0], p[1] is None, p[1] or 0)
    assert sorted(got, key=key) == sorted(exp, key=key)


@pytest.mark.parametrize("how", ["right", "outer"])
@pytest.mark.parametrize("keep", ["first", "last"])
def test_keep_with_right_and_outer_joins_matches_brute_force(spark, keep, how):
    """keep + how='right'/'outer' (reference semantics — the null
    completion runs AFTER keep): each matched LEFT row keeps its one
    min/max right match, and every right row absent from the kept picks
    — including rows that only matched as non-picked candidates —
    surfaces as a null-left row; outer additionally keeps unmatched
    left rows as null-right rows."""
    left, right = _frames(23)
    for i, r in enumerate(right):
        r["x"] = r["x"] * 100 + i  # unique order key: brute pick is exact
    conds = [("a", "x", "<"), ("a", "y", ">")]
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x int, y int, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, how=how, keep=keep)
    got = sorted(
        ((r["lid"], r["rid"]) for r in out.collect()),
        key=lambda p: (p[0] is None, p[0] or 0, p[1] is None, p[1] or 0),
    )
    exp = []
    picked_rids = set()
    for l in left:
        matched = [
            r for r in right
            if OPS["<"](l["a"], r["x"]) and OPS[">"](l["a"], r["y"])
        ]
        if matched:
            pick = (min if keep == "first" else max)(
                matched, key=lambda r: (r["x"], r["y"])
            )
            picked_rids.add(pick["rid"])
            exp.append((l["lid"], pick["rid"]))
        elif how == "outer":
            exp.append((l["lid"], None))
    for r in right:
        if r["rid"] not in picked_rids:
            exp.append((None, r["rid"]))
    exp.sort(key=lambda p: (p[0] is None, p[0] or 0, p[1] is None, p[1] or 0))
    assert got == exp


@pytest.mark.parametrize("seed", [5, 17])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_cross_dtype_conditions_match_brute_force(spark, seed, how):
    # documented superset #2: int columns against double bounds (the
    # reference's kernels raise TypeError on mixed dtypes; Spark's
    # coercion compares exactly) — brute force evaluates in Python,
    # where int/float comparison is also exact for these magnitudes
    rng = np.random.default_rng(seed)
    left = [
        {"a": int(rng.integers(0, 20)), "b": int(rng.integers(0, 4)), "lid": i}
        for i in range(40)
    ]
    right = [
        {
            "x": float(rng.integers(0, 40)) / 2.0,
            "y": float(rng.integers(-10, 30)) / 2.0,
            "k": int(rng.integers(0, 4)),
            "rid": i,
        }
        for i in range(30)
    ]
    conds = [("a", "x", "<"), ("a", "y", ">")]
    ldf = spark.createDataFrame(left, "a int, b int, lid int")
    rdf = spark.createDataFrame(right, "x double, y double, k int, rid int")
    out = pj.conditional_join(ldf, rdf, *conds, how=how)
    got = sorted(
        (tuple(sorted(r.asDict().items())) for r in out.collect()), key=_row_key
    )
    exp = _brute(left, right, conds, how)
    assert got == exp
