"""Phase-0 walking skeleton: imports, clean_names, filter, window agg."""

from __future__ import annotations

import pyjanitor_spark as pj
from pyspark.sql import functions as F


def test_imports():
    assert callable(pj.clean_names)
    assert callable(pj.conditional_join) if hasattr(pj, "conditional_join") else True


def test_clean_names(dirty_df):
    out = pj.clean_names(dirty_df, remove_special=True)
    assert out.columns == ["a", "bell_chart", "decorated_elephant", "animals", "cities"]
    assert out.count() == 9


def test_flagship_pipeline(lineitem):
    """clean_names -> filter_date -> groupby_agg window aggregate."""
    out = (
        lineitem.transform(lambda d: pj.clean_names(d))
        .transform(
            lambda d: pj.filter_date(
                d, "l_shipdate", start_date="1994-01-01", end_date="1996-12-31"
            )
        )
        .transform(
            lambda d: pj.groupby_agg(
                d,
                by=["l_returnflag"],
                new_column_name="avg_qty_by_flag",
                agg_column_name="l_quantity",
                agg="mean",
            )
        )
    )
    rows = out.select("l_returnflag", "avg_qty_by_flag").distinct().collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["avg_qty_by_flag"] is not None


def test_coalesce_fill(missing_df):
    out = pj.coalesce(missing_df, ["a", "decorated-elephant"], "filled")
    assert out.filter(F.col("filled").isNull()).count() == 0

    out2 = pj.fill_empty(missing_df, ["a"], 99)
    assert out2.filter(F.col("a").isNull()).count() == 0


def test_fill_direction(missing_df):
    out = pj.fill_direction(missing_df, {"a": "down", "Bell__Chart": "up"}, order_by="_row_order")
    got = {r["_row_order"]: (r["a"], r["Bell__Chart"]) for r in out.collect()}
    # row 2 had a=None -> ffill from row 1 => 2
    assert got[2][0] == 2
    # row 1 had Bell__Chart=None -> bfill from row 2 => 3.2346
    assert abs(got[1][1] - 3.2346) < 1e-9


def test_let_combinator_binds_value(spark):
    from pyspark.sql import functions as F
    from pyjanitor_spark.utils.expr import let

    df = spark.createDataFrame([("a b c",), (None,)], "t string")
    bound = df.select(
        let(
            F.split(F.col("t"), " "),
            lambda toks: F.transform(toks, lambda x: F.concat(x, x)),
        ).alias("o")
    )
    direct = df.select(
        F.transform(F.split(F.col("t"), " "), lambda x: F.concat(x, x)).alias("o")
    )
    assert [r["o"] for r in bound.collect()] == [r["o"] for r in direct.collect()]
    # scalar values work too
    one = df.select(let(F.length("t"), lambda n: n + n).alias("o")).collect()
    assert [r["o"] for r in one] == [10, None]
