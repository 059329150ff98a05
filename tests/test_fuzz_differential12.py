"""Fuzz wave 12: sink roundtrip fidelity under adversarial content.

The csv/json sinks got value-oracle gates in r11 (clean TPC-H content);
this wave drives the HARD content a 100 TB text corpus actually
contains — embedded delimiters, quotes, newlines, leading/trailing
whitespace, empty-vs-null, unicode, the null-token lookalike ``\\N`` —
and asserts ``write_* -> read_*`` returns the EXACT original multiset.

The wave's findings are already fixed in ``sinks.py`` (write_csv
preserves whitespace and distinguishes empty from null via quoted
``""``; read_csv pairs it with multiLine + an unmatchable NUL
nullValue).  Kept randomized-then-derandomized like wave 11
(FUZZ12_RANDOM=1 re-randomizes locally).
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyjanitor_spark.sources import read_csv, write_csv, write_json

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ12_EXAMPLES", "8")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ12_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

NASTY = [
    "",            # empty (must NOT collapse to null)
    "a,b",         # delimiter
    'q"uote',      # quote
    "new\nline",   # embedded newline (RFC 4180 quoted)
    "\r\nwin",     # CRLF
    " lead",       # leading whitespace (writer default trims!)
    "trail ",      # trailing whitespace
    "\t tab \t",
    "\\N",         # null-token lookalike
    "NULL",
    "ünïcødé ✓ 中文",
    "'single'",
    ";semi;",
    "=cmd()",      # spreadsheet-injection shape, must stay literal
]

text_cell = st.one_of(
    st.none(),
    st.sampled_from(NASTY),
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs",),
            # univocity's unescaped-quote heuristics make a bare \r
            # inside an unquoted field ambiguous by spec; real corpora
            # normalize line endings first, and the NASTY list pins the
            # quoted-CRLF case explicitly
            exclude_characters="\r\x00",
        ),
        max_size=12,
    ),
)


@st.composite
def frames(draw):
    n = draw(st.integers(1, 6))
    return [
        (
            i,
            draw(text_cell),
            draw(st.one_of(st.none(), st.integers(-2**40, 2**40))),
            draw(
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, width=64),
                )
            ),
        )
        for i in range(n)
    ]


SCHEMA = "id long, s string, n long, d double"


def _key(rows):
    return sorted(
        rows, key=lambda r: (r[0], str(r[1]), str(r[2]), str(r[3]))
    )


@WAVE
@given(rows=frames())
def test_csv_roundtrip_exact(spark, rows, tmp_path_factory):
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path_factory.mktemp("csv_rt"))
    write_csv(df, d)
    back = read_csv(spark, d, schema=SCHEMA)
    got = [(r.id, r.s, r.n, r.d) for r in back.collect()]
    assert _key(got) == _key(rows), (got, rows)


@WAVE
@given(rows=frames())
def test_json_roundtrip_exact(spark, rows, tmp_path_factory):
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path_factory.mktemp("json_rt"))
    write_json(df, d)
    back = spark.read.schema(SCHEMA).json(d)
    got = [(r.id, r.s, r.n, r.d) for r in back.collect()]
    assert _key(got) == _key(rows), (got, rows)


def test_csv_nasty_catalog_roundtrips(spark, tmp_path):
    """Every NASTY value, plus null, in one deterministic frame."""
    rows = [(i, v) for i, v in enumerate(NASTY)] + [(len(NASTY), None)]
    df = spark.createDataFrame(rows, "id long, s string")
    d = str(tmp_path / "catalog")
    write_csv(df, d)
    back = read_csv(spark, d, schema="id long, s string")
    got = {r.id: r.s for r in back.collect()}
    assert got == dict(rows), got


def test_csv_default_spark_reader_is_lossy_documented(spark, tmp_path):
    """Pin WHY read_csv exists: a plain spark.read.csv over the same
    files conflates empty with null and splits embedded newlines."""
    rows = [(1, ""), (2, None), (3, "a\nb")]
    df = spark.createDataFrame(rows, "id long, s string")
    d = str(tmp_path / "lossy")
    write_csv(df, d)
    naive = (
        spark.read.option("header", "true")
        .schema("id long, s string")
        .csv(d)
    )
    got = {(r.id, r.s) for r in naive.collect()}
    assert got != set(rows)  # the naive read is WRONG on this content
    faithful = read_csv(spark, d, schema="id long, s string")
    assert {(r.id, r.s) for r in faithful.collect()} == set(rows)


def test_float_special_values_roundtrip(spark, tmp_path):
    rows = [
        (1, float("nan")),
        (2, float("inf")),
        (3, float("-inf")),
        (4, -0.0),
        (5, 1.7976931348623157e308),
        (6, 5e-324),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, d double")
    d = str(tmp_path / "floats")
    write_csv(df, d)
    back = read_csv(spark, d, schema="id long, d double")
    got = {r.id: r.d for r in back.collect()}
    import math

    assert math.isnan(got[1])
    assert got[2] == float("inf") and got[3] == float("-inf")
    assert got[4] == 0.0 and got[5] == rows[4][1] and got[6] == rows[5][1]
    assert got[7] is None
