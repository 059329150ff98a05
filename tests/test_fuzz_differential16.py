"""Fuzz wave 16: the stdlib xlsx parser on corrupt archives.

``Workbook`` (``sources/_xlsx.py``) parses zip + XML from UNTRUSTED
bytes for the driver-side ``xlsx_table`` / ``xlsx_cells`` verbs.  The
contract fuzzed: random zip-level corruption (truncation, bit flips,
injected bytes) AND member-level corruption of a structurally-valid
archive (scrambled XML, garbage cell refs, out-of-range shared-string
indexes) must either parse cleanly or raise ``ValueError`` — never
leak ``BadZipFile`` / ``KeyError`` / ``IndexError`` / ``AttributeError``
/ ``ParseError``, and never allocate past the part/grid caps
(zip-bomb members and giga-cell table refs are rejected up front).
Derandomized after two clean randomized sweeps (FUZZ16_RANDOM=1 to
re-randomize).
"""

from __future__ import annotations

import io
import os
import zipfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyjanitor_spark.sources._xlsx import (

    _MAX_GRID_CELLS,
    _MAX_PART_BYTES,
    Workbook,
    build_demo_workbook,
)

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ16_EXAMPLES", "30")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ16_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def demo_bytes(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("xlsx") / "demo.xlsx")
    build_demo_workbook(p)
    with open(p, "rb") as f:
        return f.read()


def _parse(tmp_path, blob: bytes):
    """Write blob and parse; returns the Workbook or the ValueError."""
    p = str(tmp_path / "fuzz.xlsx")
    with open(p, "wb") as f:
        f.write(blob)
    try:
        return Workbook(p)
    except ValueError as exc:
        return exc


def _check(result, blob):
    """Either a consistent Workbook or a ValueError — nothing else
    (any other exception type propagates out of _parse and fails)."""
    if isinstance(result, ValueError):
        return
    for name, cells in result.sheets.items():
        assert isinstance(name, str)
        for c in cells:
            assert c.row >= 1 and c.column >= 1
            assert c.data_type in ("n", "s", "b", "e", "f", "str", "inlineStr")


@WAVE
@given(data=st.data())
def test_zip_level_corruption(tmp_path, demo_bytes, data):
    blob = bytearray(demo_bytes)
    mode = data.draw(st.integers(0, 3))
    if mode == 0:  # truncate anywhere (mid central directory, mid member)
        blob = blob[: data.draw(st.integers(0, len(blob) - 1))]
    elif mode == 1:  # bit flips
        for _ in range(data.draw(st.integers(1, 8))):
            i = data.draw(st.integers(0, len(blob) - 1))
            blob[i] ^= 1 << data.draw(st.integers(0, 7))
    elif mode == 2:  # inject bytes mid-stream
        i = data.draw(st.integers(0, len(blob)))
        ins = data.draw(st.binary(min_size=1, max_size=16))
        blob = blob[:i] + bytearray(ins) + blob[i:]
    else:  # arbitrary garbage, not a zip at all
        blob = bytearray(data.draw(st.binary(min_size=0, max_size=256)))
    _check(_parse(tmp_path, bytes(blob)), bytes(blob))


def _rezip(demo_bytes: bytes, replace: dict[str, bytes]) -> bytes:
    """Rebuild the demo archive with some members replaced — the zip
    stays valid, so the parser gets deep into the XML layer."""
    src = zipfile.ZipFile(io.BytesIO(demo_bytes))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for name in src.namelist():
            out.writestr(name, replace.get(name, src.read(name)))
    return buf.getvalue()


@WAVE
@given(data=st.data())
def test_member_level_corruption(tmp_path, demo_bytes, data):
    src = zipfile.ZipFile(io.BytesIO(demo_bytes))
    member = data.draw(st.sampled_from(src.namelist()))
    body = bytearray(src.read(member))
    mode = data.draw(st.integers(0, 2))
    if mode == 0:  # truncate the XML mid-tag
        body = body[: data.draw(st.integers(0, len(body) - 1))]
    elif mode == 1:  # bit flips inside the XML
        for _ in range(data.draw(st.integers(1, 6))):
            i = data.draw(st.integers(0, len(body) - 1))
            body[i] ^= 1 << data.draw(st.integers(0, 7))
    else:  # replace with arbitrary bytes
        body = bytearray(data.draw(st.binary(min_size=0, max_size=128)))
    blob = _rezip(demo_bytes, {member: bytes(body)})
    _check(_parse(tmp_path, blob), blob)


def test_adversarial_shapes(tmp_path, demo_bytes):
    sheet_hdr = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>%s</sheetData></worksheet>'
    )
    # out-of-range shared-string index
    r = _parse(tmp_path, _rezip(demo_bytes, {
        "xl/worksheets/sheet1.xml":
            (sheet_hdr % '<row r="1"><c r="A1" t="s"><v>999999</v></c></row>')
            .encode(),
    }))
    assert isinstance(r, ValueError) and "shared-string index" in str(r)
    # garbage cell ref
    r = _parse(tmp_path, _rezip(demo_bytes, {
        "xl/worksheets/sheet1.xml":
            (sheet_hdr % '<row r="1"><c r="a1$"><v>1</v></c></row>').encode(),
    }))
    assert isinstance(r, ValueError) and "cell ref" in str(r)
    # non-integer row attribute
    r = _parse(tmp_path, _rezip(demo_bytes, {
        "xl/worksheets/sheet1.xml":
            (sheet_hdr % '<row r="NaN"><c><v>1</v></c></row>').encode(),
    }))
    assert isinstance(r, ValueError)


def test_zip_bomb_member_rejected(tmp_path, demo_bytes):
    # a sharedStrings part declaring > _MAX_PART_BYTES decompressed:
    # rejected from the DECLARED size, before inflating
    bomb = b"<sst>" + b" " * (_MAX_PART_BYTES + 1) + b"</sst>"
    blob = _rezip(demo_bytes, {"xl/sharedStrings.xml": bomb})
    r = _parse(tmp_path, blob)
    assert isinstance(r, ValueError) and "cap" in str(r)


def test_giga_cell_table_ref_rejected(tmp_path, demo_bytes):
    # the full-spreadsheet ref (17 billion cells) must not allocate
    blob = _rezip(demo_bytes, {
        "xl/tables/table1.xml": (
            '<?xml version="1.0"?>'
            '<table xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" id="1" name="T1" displayName="T1"'
            ' ref="A1:XFD1048576"/>'
        ).encode(),
    })
    p = str(tmp_path / "big.xlsx")
    with open(p, "wb") as f:
        f.write(blob)
    wb = Workbook(p)  # parse is fine; the table is just declared
    with pytest.raises(ValueError, match="cap"):
        wb.range_values(*wb.tables["T1"])
    assert 16384 * 1048576 > _MAX_GRID_CELLS


def test_valid_workbook_still_parses(tmp_path, demo_bytes):
    p = str(tmp_path / "ok.xlsx")
    with open(p, "wb") as f:
        f.write(demo_bytes)
    wb = Workbook(p)
    assert list(wb.sheets) == ["Data"]
    assert wb.tables == {"T1": ("Data", "A1:B3")}
    grid = wb.range_values("Data", "A1:B3")
    assert grid[0] == ["name", "qty"] and grid[2] == ["cd", 2.5]
