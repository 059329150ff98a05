"""Domain packs + conveniences: join_fasta, convert_units,
inflate_currency, join_apply, toset, data_description."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj


def test_join_fasta(spark, tmp_path):
    fa = tmp_path / "seqs.fa"
    fa.write_text(">s1 desc\nACGT\nTTGG\n>s2\nGGCC\n")
    df = spark.createDataFrame([("s1",), ("s2",), ("s3",)], ["sid"])
    out = pj.join_fasta(df, str(fa), "sid")
    got = {r["sid"]: r["sequence"] for r in out.collect()}
    assert got == {"s1": "ACGTTTGG", "s2": "GGCC", "s3": None}
    # small side must be broadcast: no shuffle on the big side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_convert_units(spark):
    df = spark.createDataFrame([(1, 2.0)], ["id", "d_km"])
    out = pj.convert_units(df, "d_km", "km", "m", dest_column_name="d_m")
    assert out.first()["d_m"] == 2000.0
    with pytest.raises(ValueError):
        pj.convert_units(df, "d_km", "km", "parsec")


def test_inflate_currency(spark):
    df = spark.createDataFrame([(1, 100.0)], ["id", "usd"])
    out = pj.inflate_currency(df, "usd", rate=1.5)
    assert out.first()["usd"] == 150.0
    with pytest.raises(ValueError):
        pj.inflate_currency(df, "usd", country="USA", currency_year=2020, to_year=2024)


def test_join_apply(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], ["k", "a"])
    right = spark.createDataFrame([(1, 3), (2, 4)], ["k", "b"])
    out = pj.join_apply(left, right, lambda d: d["a"] * d["b"], on="k")
    got = {r["k"]: r["applied"] for r in out.collect()}
    assert got == {1: 30, 2: 80}


def test_toset(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["v"])
    assert pj.toset(df, "v") == {1, 2, 3}


def test_data_description(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], ["k", "s"]
    )
    out = pj.data_description(df)
    assert out.columns == [
        "column_name", "type", "count", "pct_missing", "description"
    ]  # the reference accessor's exact surface
    got = {r["column_name"]: r for r in out.collect()}
    assert got["k"]["count"] == 4 and got["k"]["pct_missing"] == 0.0
    assert got["s"]["count"] == 2 and abs(got["s"]["pct_missing"] - 0.5) < 1e-12
    assert got["s"]["type"] == "string" and got["s"]["description"] == ""
    # set_description parity: dict and full-length list; bad list raises
    desc = pj.data_description(df, {"k": "the key"})
    assert {r["column_name"]: r["description"] for r in desc.collect()} == {
        "k": "the key", "s": "",
    }
    desc2 = pj.data_description(df, ["key col", "str col"])
    assert [r["description"] for r in desc2.collect()] == ["key col", "str col"]
    with pytest.raises(ValueError, match="Length of description list"):
        pj.data_description(df, ["only one"])


def test_convert_currency_raises():
    with pytest.raises(NotImplementedError):
        pj.convert_currency()


def test_convert_stock_get_symbol():
    company = {"AAPL": "Apple Inc."}
    assert pj.convert_stock("aapl", company=company) == "Apple Inc."
    with pytest.raises(ValueError):
        pj.convert_stock("AAPL")
    symbols = {"Apple Inc.": "AAPL"}
    assert pj.get_symbol("apple inc.", symbols=symbols) == "AAPL"
    assert pj.get_symbol("Nope Corp", symbols=symbols) is None


def test_skipna_skiperror_with_transform_column(spark):
    df = spark.createDataFrame([("3",), (None,), ("bad",)], ["v"])
    safe = pj.skiperror(pj.skipna(int))
    out = pj.transform_column(
        df, "v", safe, dest_column_name="n", return_type="long"
    )
    vals = [r["n"] for r in out.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert vals == [None, 3, None]


def test_chemistry_verbs_are_rdkit_gated(spark):
    df = spark.createDataFrame([("CCO",)], ["smiles"])
    for fn in (
        pj.smiles2mol,
        pj.morgan_fingerprint,
        pj.maccs_keys_fingerprint,
        pj.molecular_descriptors,
    ):
        with pytest.raises(ImportError, match="rdkit"):
            fn(df, "smiles")
