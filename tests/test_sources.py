"""Source readers: read_csvs, read_commandline, xlsx gating."""

from __future__ import annotations

import pytest

import pyjanitor_spark as pj
from pyjanitor_spark.sources import read_commandline, read_csvs, xlsx_cells, xlsx_table


@pytest.fixture()
def csv_dir(tmp_path):
    (tmp_path / "a.csv").write_text("k,v\n1,x\n2,y\n")
    (tmp_path / "b.csv").write_text("k,v\n3,z\n")
    (tmp_path / "bad.txt").write_text("k;v\n9;q\n")
    return tmp_path


def test_read_csvs_glob(spark, csv_dir):
    df = read_csvs(spark, str(csv_dir / "*.csv"))
    assert df.count() == 3
    assert set(df.columns) == {"k", "v"}


def test_read_csvs_separate(spark, csv_dir):
    dfs = read_csvs(spark, str(csv_dir / "*.csv"), separate_df=True)
    assert len(dfs) == 2
    assert sum(d.count() for d in dfs.values()) == 3


def test_read_csvs_schema_mismatch(spark, csv_dir):
    (csv_dir / "c.csv").write_text("other,cols,here\n1,2,3\n")
    with pytest.raises(ValueError, match="schema"):
        read_csvs(spark, str(csv_dir / "*.csv"))


def test_read_csvs_no_match(spark, csv_dir):
    with pytest.raises(ValueError, match="no files"):
        read_csvs(spark, str(csv_dir / "*.nope"))


def test_read_commandline(spark, csv_dir):
    df = read_commandline(spark, f"cat {csv_dir}/a.csv")
    assert df.count() == 2
    assert set(df.columns) == {"k", "v"}


def test_xlsx_gated(spark, tmp_path):
    # openpyxl is not bundled in this environment: the verbs must fail
    # with a clear ImportError, not crash obscurely
    pytest.importorskip_message = None
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl installed — gating not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="openpyxl"):
        xlsx_table(spark, str(tmp_path / "x.xlsx"))
    with pytest.raises(ImportError, match="openpyxl"):
        xlsx_cells(spark, str(tmp_path / "x.xlsx"))


class TestReadJsonl:
    def test_roundtrip_and_corrupt_capture(self, spark, tmp_path):
        import json as _json

        p = tmp_path / "docs.jsonl"
        lines = [
            _json.dumps({"id": 1, "text": "hello world"}),
            _json.dumps({"id": 2, "text": "zweite zeile"}),
            '{"id": 3, "text": broken',
            _json.dumps({"id": 4, "text": None}),
        ]
        p.write_text("\n".join(lines) + "\n")
        from pyjanitor_spark.sources import read_jsonl

        df = read_jsonl(spark, str(p))
        assert "_corrupt_record" in df.columns
        good = df.filter("_corrupt_record IS NULL")
        bad = df.filter("_corrupt_record IS NOT NULL")
        assert sorted(r["id"] for r in good.collect() if r["id"] is not None) == [1, 2, 4]
        assert bad.count() == 1

    def test_explicit_schema_skips_inference(self, spark, tmp_path):
        import json as _json

        p = tmp_path / "d.jsonl"
        p.write_text(_json.dumps({"id": 7, "text": "x"}) + "\n")
        from pyjanitor_spark.sources import read_jsonl

        df = read_jsonl(
            spark, str(p), schema="id BIGINT, text STRING, _corrupt_record STRING"
        )
        assert df.collect()[0]["id"] == 7

    def test_reader_options_reach_permissive_path(self, spark, tmp_path):
        """User options (dateFormat, ...) must apply to the text+from_json
        default path, not only to inference/DROPMALFORMED."""
        import datetime

        p = tmp_path / "d.jsonl"
        p.write_text('{"id": 1, "d": "31/12/2020"}\n')
        from pyjanitor_spark.sources import read_jsonl

        df = read_jsonl(
            spark, str(p), schema="id BIGINT, d DATE", dateFormat="dd/MM/yyyy"
        )
        row = df.collect()[0]
        assert row["d"] == datetime.date(2020, 12, 31)
        assert row["_corrupt_record"] is None

    def test_line_sep_reaches_text_scan(self, spark, tmp_path):
        p = tmp_path / "d.jsonl"
        p.write_text('{"id": 1};{"id": 2}')
        from pyjanitor_spark.sources import read_jsonl

        df = read_jsonl(spark, str(p), schema="id BIGINT", lineSep=";")
        assert sorted(r["id"] for r in df.collect()) == [1, 2]

    def test_dropmalformed(self, spark, tmp_path):
        p = tmp_path / "d.jsonl"
        p.write_text('{"id": 1}\n{oops\n{"id": 2}\n')
        from pyjanitor_spark.sources import read_jsonl

        df = read_jsonl(spark, str(p), corrupt_column=None)
        assert sorted(r["id"] for r in df.collect()) == [1, 2]
