"""Source readers: read_csvs, read_commandline, read_jsonl, and the
stdlib xlsx readers (xlsx_table / xlsx_cells)."""

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


def _write_xlsx(path):
    """Hand-build a small but structurally complete .xlsx with the
    stdlib: two sheets, shared + inline strings, numerics (int/float),
    a bool, a cached formula, a styled-blank cell, rich-text runs, and
    a declared table over Data!A1:B3."""
    import zipfile

    parts = {
        "[Content_Types].xml": """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
</Types>""",
        "_rels/.rels": """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>""",
        "xl/workbook.xml": """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Data" sheetId="1" r:id="rId1"/>
  <sheet name="Notes" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>""",
        "xl/_rels/workbook.xml.rels": """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
 <Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>""",
        # rich-text run in si[2]: "na" + "me" must read back as "name"
        "xl/sharedStrings.xml": """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
 <si><t>ab</t></si>
 <si><t>cd</t></si>
 <si><r><t>na</t></r><r><t>me</t></r></si>
 <si><t>qty</t></si>
</sst>""",
        "xl/worksheets/sheet1.xml": """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>2</v></c>
   <c r="B1" t="s"><v>3</v></c>
   <c r="D1" t="b"><v>1</v></c>
   <c r="E1" s="1"/>
  </row>
  <row r="2">
   <c r="A2" t="s"><v>0</v></c>
   <c r="B2"><v>1</v></c>
   <c r="C2"><f>SUM(B2:B3)</f><v>3.5</v></c>
  </row>
  <row r="3">
   <c r="A3" t="s"><v>1</v></c>
   <c r="B3"><v>2.5</v></c>
  </row>
 </sheetData>
 <tableParts count="1"><tablePart r:id="rId1"/></tableParts>
</worksheet>""",
        "xl/worksheets/_rels/sheet1.xml.rels": """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/table" Target="../tables/table1.xml"/>
</Relationships>""",
        "xl/tables/table1.xml": """<?xml version="1.0"?>
<table xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 id="1" name="T1" displayName="T1" ref="A1:B3"/>""",
        "xl/worksheets/sheet2.xml": """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>hello note</t></is></c></row>
 </sheetData>
</worksheet>""",
    }
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in parts.items():
            zf.writestr(name, content)


class TestXlsx:
    def test_table_extraction(self, spark, tmp_path):
        p = tmp_path / "wb.xlsx"
        _write_xlsx(p)
        tables = xlsx_table(spark, str(p))
        assert set(tables) == {"T1"}
        df = xlsx_table(spark, str(p), table="T1")
        # rich-text header "na"+"me" -> "name"; int 1 unified to float
        # alongside 2.5
        assert df.columns == ["name", "qty"]
        rows = {r["name"]: r["qty"] for r in df.collect()}
        assert rows == {"ab": 1.0, "cd": 2.5}

    def test_table_missing_name_raises(self, spark, tmp_path):
        p = tmp_path / "wb.xlsx"
        _write_xlsx(p)
        with pytest.raises(KeyError, match="nope"):
            xlsx_table(spark, str(p), table="nope")

    def test_cells_melt(self, spark, tmp_path):
        p = tmp_path / "wb.xlsx"
        _write_xlsx(p)
        df = xlsx_cells(spark, str(p))
        cells = {(r["sheet"], r["coordinate"]): r for r in df.collect()}
        assert cells[("Data", "A1")]["value"] == "name"
        assert cells[("Data", "A1")]["data_type"] == "s"
        assert cells[("Data", "B2")]["value"] == "1"
        assert cells[("Data", "B2")]["data_type"] == "n"
        assert cells[("Data", "D1")]["value"] == "True"
        assert cells[("Data", "D1")]["data_type"] == "b"
        # formula cell: data_only=False semantics — the formula string
        assert cells[("Data", "C2")]["value"] == "=SUM(B2:B3)"
        assert cells[("Data", "C2")]["data_type"] == "f"
        assert cells[("Data", "C2")]["row"] == 2
        assert cells[("Data", "C2")]["column"] == 3
        assert cells[("Notes", "A1")]["value"] == "hello note"
        # styled blank cell excluded by default, included on demand
        assert ("Data", "E1") not in cells
        with_blanks = {
            (r["sheet"], r["coordinate"])
            for r in xlsx_cells(spark, str(p), include_blank_cells=True).collect()
        }
        assert ("Data", "E1") in with_blanks

    def test_cells_sheetnames_filter(self, spark, tmp_path):
        p = tmp_path / "wb.xlsx"
        _write_xlsx(p)
        df = xlsx_cells(spark, str(p), sheetnames=["Notes"])
        assert {r["sheet"] for r in df.collect()} == {"Notes"}


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
