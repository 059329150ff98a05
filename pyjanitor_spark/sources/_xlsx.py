"""Minimal stdlib .xlsx reader (``zipfile`` + ``xml.etree``).

An ``.xlsx`` workbook is a documented public format (ECMA-376 /
ISO 29500 "SpreadsheetML"): a zip archive of XML parts.  This module
parses just the parts the ``xlsx_table`` / ``xlsx_cells`` verbs need —
workbook sheet list, relationship targets, the shared-string table,
per-sheet cell grids, and declared table definitions — with no optional
dependency, so the verbs work in containers without openpyxl.

Driver-side by design: spreadsheets are inherently single-machine
inputs (bounded by workbook size), the resulting DataFrame is what
distributes.
"""

from __future__ import annotations

import posixpath
import re
import zipfile
from xml.etree import ElementTree as ET

_R_ID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")

# Per-part decompressed-size ceiling (64 MiB) and range_values grid
# cell ceiling: a corrupt or adversarial workbook must not force a
# multi-GiB allocation on the driver.
_MAX_PART_BYTES = 64 << 20
_MAX_GRID_CELLS = 10_000_000


def _read_part(zf: zipfile.ZipFile, member: str) -> bytes:
    """Read a zip member with the declared uncompressed size checked
    BEFORE inflating (zip-bomb guard; zipfile enforces the declared
    size during read)."""
    info = zf.getinfo(member)
    if info.file_size > _MAX_PART_BYTES:
        raise ValueError(
            f"xlsx part {member!r} declares {info.file_size} bytes "
            f"(cap {_MAX_PART_BYTES})"
        )
    return zf.read(member)


__all__ = ["Workbook", "Cell", "col_to_num", "num_to_col", "build_demo_workbook"]


def col_to_num(letters: str) -> int:
    """'A' -> 1, 'Z' -> 26, 'AA' -> 27 (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n


def num_to_col(n: int) -> str:
    out = ""
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out = chr(65 + rem) + out
    return out


class Cell:
    __slots__ = ("row", "column", "data_type", "value", "formula")

    def __init__(self, row, column, data_type, value, formula=None):
        self.row = row
        self.column = column
        self.data_type = data_type  # openpyxl-style: n / s / b / e / f
        self.value = value  # cached (computed) value, python-typed
        self.formula = formula  # "=..." when the cell holds a formula

    @property
    def coordinate(self) -> str:
        return f"{num_to_col(self.column)}{self.row}"


def _text(el) -> str:
    """Concatenated text of every ``t`` descendant (rich-text runs)."""
    return "".join(t.text or "" for t in el.iter() if t.tag.endswith("}t"))


def _parse_rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """Relationship id -> zip member name, resolved relative to *part*."""
    rels_name = posixpath.join(posixpath.dirname(part), "_rels", posixpath.basename(part) + ".rels")
    if rels_name not in zf.namelist():
        return {}
    out = {}
    for rel in ET.fromstring(_read_part(zf, rels_name)).iter():
        if not rel.tag.endswith("}Relationship"):
            continue
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target.lstrip("/")
        else:
            resolved = posixpath.normpath(
                posixpath.join(posixpath.dirname(part), target)
            )
        out[rel.get("Id")] = resolved
    return out


def _typed(raw: str | None, t: str):
    """Python-type a cached cell value per its xlsx type attribute."""
    if raw is None:
        return None
    if t == "b":
        return raw in ("1", "true", "TRUE")
    if t == "n":
        try:
            f = float(raw)
        except ValueError:
            return raw
        return int(f) if f.is_integer() and ("." not in raw and "e" not in raw.lower()) else f
    return raw


def build_demo_workbook(path: str) -> str:
    """Write a small deterministic workbook (one sheet, shared strings,
    a numeric + float cell, a cached formula, a declared table over
    Data!A1:B3).  Used by the correctness-gate queries so the xlsx
    readers have an executable, oracle-checkable fixture; byte-stable
    across runs (fixed zip timestamps)."""
    parts = {
        "_rels/.rels": (
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
            ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
            "</Relationships>"
        ),
        "xl/sharedStrings.xml": (
            '<?xml version="1.0"?>'
            '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<si><t>name</t></si><si><t>qty</t></si>"
            "<si><t>ab</t></si><si><t>cd</t></si></sst>"
        ),
        "xl/worksheets/sheet1.xml": (
            '<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
            ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            "<sheetData>"
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1</v></c>'
            '<c r="C2"><f>SUM(B2:B3)</f><v>3.5</v></c></row>'
            '<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>2.5</v></c></row>'
            "</sheetData>"
            '<tableParts count="1"><tablePart r:id="rId1"/></tableParts></worksheet>'
        ),
        "xl/worksheets/_rels/sheet1.xml.rels": (
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/table" Target="../tables/table1.xml"/>'
            "</Relationships>"
        ),
        "xl/tables/table1.xml": (
            '<?xml version="1.0"?>'
            '<table xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
            ' id="1" name="T1" displayName="T1" ref="A1:B3"/>'
        ),
    }
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in parts.items():
            zf.writestr(zipfile.ZipInfo(name, (2020, 1, 1, 0, 0, 0)), content)
    return path


class Workbook:
    """Parsed workbook: ``sheets`` (ordered name -> list[Cell]) and
    ``tables`` (name -> (sheet, ref)) for declared Excel tables.

    Untrusted-bytes contract (fuzz wave 16): ANY malformed workbook —
    bad/truncated zip, missing required part, malformed XML, garbage
    cell refs or row numbers, out-of-range shared-string indexes,
    zip-bomb members — raises ``ValueError``; no ``BadZipFile`` /
    ``KeyError`` / ``IndexError`` / ``AttributeError`` / ``ParseError``
    leaks, and no allocation beyond :data:`_MAX_PART_BYTES` per part
    (the declared uncompressed size is checked BEFORE inflating, so a
    bomb is rejected, not survived).  Entity-expansion (billion-laughs)
    amplification is rejected by the interpreter's expat (≥ 2.4
    enables amplification limits), surfacing as a parse error here."""

    def __init__(self, path: str):
        self.sheets: dict[str, list[Cell]] = {}
        self.tables: dict[str, tuple[str, str]] = {}
        try:
            self._load(path)
        except ValueError:
            raise
        except Exception as exc:
            # a parser of untrusted bytes has exactly one failure mode
            raise ValueError(
                f"malformed xlsx {path!r}: "
                f"{exc.__class__.__name__}: {exc}"
            ) from exc

    def _load(self, path: str) -> None:
        with zipfile.ZipFile(path) as zf:
            wb_rels = _parse_rels(zf, "xl/workbook.xml")
            shared = self._shared_strings(zf)
            for sheet in ET.fromstring(_read_part(zf, "xl/workbook.xml")).iter():
                if not sheet.tag.endswith("}sheet"):
                    continue
                name = sheet.get("name")
                member = wb_rels.get(sheet.get(_R_ID))
                if name is None or member is None or member not in zf.namelist():
                    continue
                self.sheets[name] = self._parse_sheet(zf, member, shared)
                self._parse_tables(zf, member, name)

    @staticmethod
    def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
        if "xl/sharedStrings.xml" not in zf.namelist():
            return []
        root = ET.fromstring(_read_part(zf, "xl/sharedStrings.xml"))
        return [_text(si) for si in root if si.tag.endswith("}si")]

    @staticmethod
    def _parse_sheet(zf, member: str, shared: list[str]) -> list[Cell]:
        cells: list[Cell] = []
        row_num = 0
        for row in ET.fromstring(_read_part(zf, member)).iter():
            if not row.tag.endswith("}row"):
                continue
            row_num = int(row.get("r", row_num + 1))
            col_num = 0
            for c in row:
                if not c.tag.endswith("}c"):
                    continue
                ref = c.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    if m is None:
                        raise ValueError(f"bad cell ref {ref!r} in {member!r}")
                    col_num = col_to_num(m.group(1))
                    row_num = int(m.group(2))
                else:
                    col_num += 1
                t = c.get("t", "n")
                formula = None
                raw = None
                for child in c:
                    if child.tag.endswith("}f"):
                        formula = "=" + (child.text or "")
                    elif child.tag.endswith("}v"):
                        raw = child.text
                    elif child.tag.endswith("}is"):
                        raw = _text(child)
                if t in ("s",) and raw is not None:
                    idx = int(raw)
                    if not 0 <= idx < len(shared):
                        raise ValueError(
                            f"shared-string index {idx} out of range "
                            f"({len(shared)} entries) in {member!r}"
                        )
                    value = shared[idx]
                    dt = "s"
                elif t in ("str", "inlineStr"):
                    value, dt = raw, "s"
                else:
                    value = _typed(raw, t)
                    dt = t  # n / b / e
                if formula is not None:
                    dt = "f"
                cells.append(Cell(row_num, col_num, dt, value, formula))
        return cells

    def _parse_tables(self, zf, member: str, sheet_name: str) -> None:
        for target in _parse_rels(zf, member).values():
            if "/tables/" not in target or target not in zf.namelist():
                continue
            tbl = ET.fromstring(_read_part(zf, target))
            name = tbl.get("displayName") or tbl.get("name")
            ref = tbl.get("ref")
            if name and ref:
                self.tables[name] = (sheet_name, ref)

    def range_values(self, sheet: str, ref: str) -> list[list]:
        """Dense 2-D grid of cached values for a 'A1:C4'-style range."""
        start, _, end = ref.partition(":")
        m1, m2 = _CELL_REF.match(start), _CELL_REF.match(end or start)
        if m1 is None or m2 is None:
            raise ValueError(f"bad range ref {ref!r}")
        c1, r1 = col_to_num(m1.group(1)), int(m1.group(2))
        c2, r2 = col_to_num(m2.group(1)), int(m2.group(2))
        if c2 < c1 or r2 < r1:
            raise ValueError(f"inverted range ref {ref!r}")
        if (c2 - c1 + 1) * (r2 - r1 + 1) > _MAX_GRID_CELLS:
            raise ValueError(
                f"range {ref!r} spans {(c2 - c1 + 1) * (r2 - r1 + 1)} "
                f"cells (cap {_MAX_GRID_CELLS})"
            )
        grid = [[None] * (c2 - c1 + 1) for _ in range(r2 - r1 + 1)]
        for cell in self.sheets.get(sheet, ()):
            if r1 <= cell.row <= r2 and c1 <= cell.column <= c2:
                grid[cell.row - r1][cell.column - c1] = cell.value
        return grid
