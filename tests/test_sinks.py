"""Sink tests: roundtrip, hive layout, file sizing, bucketed no-shuffle join."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pyjanitor_spark.plans import shuffle_count
from pyjanitor_spark.sources import (
    read_orc,
    write_bucketed_table,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)


def test_write_parquet_roundtrip(spark, lineitem, tmp_path):
    path = str(tmp_path / "li")
    write_parquet(lineitem.limit(100), path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert set(back.columns) == set(lineitem.columns)


def test_write_parquet_partitioned_layout(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_part")
    write_parquet(lineitem, path, partition_by=["l_returnflag"], sort_by=["l_shipdate"])
    dirs = {os.path.basename(d) for d in glob.glob(f"{path}/l_returnflag=*")}
    flags = {r[0] for r in lineitem.select("l_returnflag").distinct().collect()}
    assert dirs == {f"l_returnflag={f}" for f in flags}
    # repartition on the partition key -> one file per value, not one per task
    for d in glob.glob(f"{path}/l_returnflag=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1
    # partition pruning: reading one value scans only that directory
    one = spark.read.parquet(path).filter(F.col("l_returnflag") == sorted(flags)[0])
    assert one.count() == lineitem.filter(F.col("l_returnflag") == sorted(flags)[0]).count()


def test_write_parquet_max_records_per_file(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_sized")
    write_parquet(lineitem.coalesce(1), path, max_records_per_file=1000)
    files = glob.glob(f"{path}/*.parquet")
    total = lineitem.count()
    assert len(files) >= total // 1000
    assert spark.read.parquet(path).count() == total


def test_write_orc_roundtrip_layout_and_pushdown(spark, lineitem, tmp_path):
    path = str(tmp_path / "li_orc")
    write_orc(lineitem, path, partition_by=["l_returnflag"], sort_by=["l_shipdate"])
    back = read_orc(spark, path)
    assert back.count() == lineitem.count()
    assert set(back.columns) == set(lineitem.columns)
    # hive layout: one file per partition value (repartition on the key)
    for d in glob.glob(f"{path}/l_returnflag=*"):
        assert len(glob.glob(f"{d}/*.orc")) == 1
    # predicate pushdown + partition pruning reach the ORC scan
    q = back.filter(
        (F.col("l_returnflag") == "A") & (F.col("l_quantity") > 25)
    ).select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    assert q.count() == lineitem.filter(
        (F.col("l_returnflag") == "A") & (F.col("l_quantity") > 25)
    ).count()


def test_write_csv_json_roundtrip(spark, lineitem, tmp_path):
    sub = lineitem.select("l_orderkey", "l_quantity", "l_returnflag").limit(50)
    write_csv(sub, str(tmp_path / "csv"))
    write_json(sub, str(tmp_path / "json"))
    assert spark.read.option("header", "true").csv(str(tmp_path / "csv")).count() == 50
    assert spark.read.json(str(tmp_path / "json")).count() == 50


@pytest.fixture(scope="module")
def bucketed_tables(spark, lineitem, orders, tmp_path_factory):
    # external bucketed tables (explicit path) — the session's warehouse
    # dir is a static conf, so point each table at a pytest tmp dir
    base = tmp_path_factory.mktemp("bucketed")
    write_bucketed_table(
        lineitem.select("l_orderkey", "l_quantity"),
        "li_bkt", bucket_by=["l_orderkey"], num_buckets=8, sort_by=["l_orderkey"],
        path=str(base / "li_bkt"),
    )
    write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"),
        "ord_bkt", bucket_by=["o_orderkey"], num_buckets=8, sort_by=["o_orderkey"],
        path=str(base / "ord_bkt"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """The whole point of bucketing: identically-bucketed equi-join needs
    zero Exchange — the write-time shuffle is reused by every join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table("li_bkt")
        od = spark.table("ord_bkt")
        joined = li.join(od, li.l_orderkey == od.o_orderkey)
        assert shuffle_count(joined) == 0
        # and it's still correct
        plain = (
            spark.table("li_bkt")
            .join(spark.table("ord_bkt").hint("broadcast"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
        )
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the bucket partitioning."""
    agg = spark.table("li_bkt").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert shuffle_count(agg) == 0
    assert agg.count() > 0
