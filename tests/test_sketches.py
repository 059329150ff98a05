"""heavy_hitters (exact) and HLL cardinality sketches (mergeable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj


class TestHeavyHitters:
    def test_exact_counts_and_shares(self, spark):
        rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 9 + [("d",)] * 1
        df = spark.createDataFrame(rows, "v string")
        got = {r["v"]: (r["cnt"], r["share"]) for r in pj.heavy_hitters(df, "v", 0.09).collect()}
        assert set(got) == {"a", "b", "c"}
        assert got["a"] == (60, 0.60) and got["b"] == (30, 0.30)

    def test_grouped(self, spark):
        rows = [("x", "a")] * 9 + [("x", "b")] * 1 + [("y", "b")] * 10
        df = spark.createDataFrame(rows, "g string, v string")
        got = {(r["g"], r["v"]): r["share"] for r in pj.heavy_hitters(df, "v", 0.5, by=["g"]).collect()}
        assert set(got) == {("x", "a"), ("y", "b")}

    def test_output_bounded(self, spark):
        df = spark.createDataFrame([(i % 1000,) for i in range(10000)], "v int")
        out = pj.heavy_hitters(df, "v", 0.01)
        assert out.count() <= 100  # at most 1/min_share values

    def test_bad_share(self, spark):
        df = spark.createDataFrame([(1,)], "v int")
        with pytest.raises(ValueError):
            pj.heavy_hitters(df, "v", 0.0)

    def test_on_real_documents(self, documents):
        out = pj.heavy_hitters(documents, "lang", 0.05)
        shares = {r["lang"]: r["share"] for r in out.collect()}
        assert "en" in shares and abs(sum(shares.values()) - 1.0) < 0.3


class TestCardinalitySketch:
    def test_estimate_near_exact(self, spark):
        df = spark.createDataFrame([(i % 500,) for i in range(5000)], "v int")
        est = pj.cardinality_sketch(df, "v").first()["distinct_est"]
        assert abs(est - 500) / 500 < 0.1

    def test_grouped_estimates(self, spark):
        rows = [("a", i) for i in range(100)] + [("b", i % 10) for i in range(100)]
        df = spark.createDataFrame(rows, "g string, v int")
        got = {r["g"]: r["distinct_est"] for r in pj.cardinality_sketch(df, "v", by=["g"]).collect()}
        assert abs(got["a"] - 100) / 100 < 0.1 and abs(got["b"] - 10) / 10 < 0.15

    def test_merge_matches_union(self, spark):
        """Daily sketches merged == sketch of the union — the roll-up
        path never re-reads the raw data."""
        d1 = spark.createDataFrame([(i,) for i in range(0, 600)], "v int")
        d2 = spark.createDataFrame([(i,) for i in range(400, 1000)], "v int")
        s1 = pj.cardinality_sketch(d1.withColumn("day", F.lit(1)), "v", by=["day"], keep_sketch=True)
        s2 = pj.cardinality_sketch(d2.withColumn("day", F.lit(2)), "v", by=["day"], keep_sketch=True)
        sketches = s1.union(s2).select("distinct_est_sketch")
        merged = pj.merge_cardinality_sketches(sketches, "distinct_est_sketch").first()["distinct_est"]
        direct = pj.cardinality_sketch(d1.union(d2), "v").first()["distinct_est"]
        # union promotes the sketch representation, so the estimate can
        # differ slightly from the direct single-pass sketch — both must
        # sit inside the documented error envelope
        assert abs(merged - direct) / direct < 0.05
        assert abs(merged - 1000) / 1000 < 0.1

    def test_sketch_survives_parquet_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame([(i,) for i in range(300)], "v int")
        sk = pj.cardinality_sketch(df, "v", keep_sketch=True)
        p = str(tmp_path / "sk")
        sk.select("distinct_est_sketch").write.parquet(p)
        back = spark.read.parquet(p)
        est = pj.merge_cardinality_sketches(back, "distinct_est_sketch").first()["distinct_est"]
        assert abs(est - 300) / 300 < 0.1
