"""Z-order (Morton) clustered writes: interleave correctness and the
file-skipping property the layout exists for."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
    return z


class TestZorderKey:
    def test_interleave_matches_reference_bits(self, spark):
        # values 0..(2^bits-1) scale to themselves (min=0, max=2^bits-1)
        bits = 4
        hi = (1 << bits) - 1
        rows = [(x, y) for x in range(hi + 1) for y in range(hi + 1)]
        df = spark.createDataFrame(rows, "x int, y int")
        out = pj.zorder_key(df, ["x", "y"], bits=bits, dest="z")
        for r in out.collect():
            assert r["z"] == _morton2(r["x"], r["y"], bits), (r["x"], r["y"], r["z"])

    def test_string_column_point_locality(self, spark):
        # equal strings hash to equal codes -> identical z contribution
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id int, s string"
        )
        out = {r["id"]: r["z"] for r in pj.zorder_key(df, ["s"], bits=8, dest="z").collect()}
        assert out[1] == out[2] != out[3]

    def test_null_and_constant_columns(self, spark):
        df = spark.createDataFrame(
            [(1, None, 5.0), (2, 3.0, 5.0)], "id int, a double, b double"
        )
        out = pj.zorder_key(df, ["a", "b"], bits=4, dest="z")
        got = {r["id"]: r["z"] for r in out.collect()}
        # constant b contributes 0 everywhere; null a maps to 0
        assert got[1] == 0

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with pytest.raises(ValueError):
            pj.zorder_key(df, [], bits=4)
        with pytest.raises(ValueError):
            pj.zorder_key(df, ["a", "b"], bits=32)
        with pytest.raises(KeyError):
            pj.zorder_key(df, ["nope"])


class TestWriteZordered:
    def test_point_query_skips_most_files(self, spark, tmp_path):
        """After z-ordering a uniform 2-D grid into 16 files, a small
        (x, y) box must physically live in FEW files, while the same
        write sorted by x alone spreads every y-range over all files.
        This is the property parquet footer pruning exploits."""
        n = 64
        rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
        df = spark.createDataFrame(rows, "x int, y int, payload int")

        zpath = str(tmp_path / "zorder")
        pj.write_zordered(df, zpath, ["x", "y"], bits=6, num_files=16)

        def files_containing(path, pred):
            hit = 0
            for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
                part = spark.read.parquet(f)
                if part.filter(pred).count() > 0:
                    hit += 1
            return hit, len(glob.glob(os.path.join(path, "part-*.parquet")))

        pred = (F.col("x").between(8, 15)) & (F.col("y").between(8, 15))
        z_hit, z_total = files_containing(zpath, pred)
        assert z_total >= 8
        # an 1/64th-area box on a z-curve with 16 segments touches O(1)
        # segments; allow slack for curve boundary crossings
        assert z_hit <= max(2, z_total // 4), (z_hit, z_total)

        # row preservation
        assert spark.read.parquet(zpath).count() == n * n

    def test_single_column_degenerates_to_range_sort(self, spark, tmp_path):
        df = spark.createDataFrame([(i,) for i in range(1000)], "v int")
        path = str(tmp_path / "z1")
        pj.write_zordered(df, path, ["v"], bits=10, num_files=4)
        files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
        ranges = []
        for f in files:
            agg = spark.read.parquet(f).agg(F.min("v"), F.max("v")).first()
            ranges.append((agg[0], agg[1]))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # disjoint, contiguous value ranges
