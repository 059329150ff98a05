"""Fuzz wave 13: the expression-built TEXT verbs against exact Python
re-derivations under adversarial whitespace/unicode content.

These verbs are chains of split/translate/regexp expressions whose
semantics live in Java-regex land (ASCII ``\\s``, space-only ``trim``);
the oracles replicate those semantics precisely (``re.ASCII``,
``strip(' ')``), so the differential pins BEHAVIOR — including the
documented edges (a blank document tokenizes to one empty token; a
leading newline survives space-only trim) — against regression and
engine-version drift.

Covered: ``token_count``, ``normalize_text``, ``pii_redact`` (+match
counts), ``chunk_text`` (starts/overlap/ordinals/n_tokens).
Derandomized after two clean randomized sweeps (FUZZ13_RANDOM=1 to
re-randomize locally).
"""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from pyjanitor_spark.operators.text_analysis import (

    _ACCENT_DST,
    _ACCENT_SRC,
    _PUNCT_DST,
    _PUNCT_SRC,
    PII_PATTERNS,
)

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ13_EXAMPLES", "8")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ13_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# adversarial text: ASCII + mapped punctuation/accents + whitespace mix
PIECES = [
    "word", "WoRd", "élan", "Ünï", "“curly”", "—dash",
    "a b",  # NBSP (folds to space before collapse)
    "", " ", "  ", "\n", "\t", "\n\n", " lead", "trail ",
    "x.y!z?", "123", "a-b_c",
]

texts = st.lists(st.sampled_from(PIECES), min_size=0, max_size=10).map(
    "".join
)


def _trim(s: str) -> str:
    return s.strip(" ")  # Spark trim: space characters only


def _tokens(s: str) -> list[str]:
    return re.split(r"\s+", _trim(s), flags=re.ASCII)


# ------------------------------------------------------------ token_count

@WAVE
@given(ts=st.lists(texts, min_size=1, max_size=6))
def test_token_count_vs_python(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "id long, t string")
    got = {r.id: r.n_tokens for r in pj.token_count(df, "t").collect()}
    want = {i: len(_tokens(t)) for i, t in enumerate(ts)}
    assert got == want, (got, want, ts)


# ---------------------------------------------------------- normalize_text

def _normalize(s: str) -> str:
    s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
    s = s.translate(str.maketrans(_PUNCT_SRC, _PUNCT_DST))
    s = s.lower()
    s = s.translate(str.maketrans(_ACCENT_SRC, _ACCENT_DST))
    s = re.sub(r"\s+", " ", s, flags=re.ASCII).strip(" ")
    return s


@WAVE
@given(ts=st.lists(texts, min_size=1, max_size=6))
def test_normalize_text_vs_python(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), "id long, t string")
    got = {r.id: r.t for r in pj.normalize_text(df, "t").collect()}
    want = {i: _normalize(t) for i, t in enumerate(ts)}
    assert got == want, (got, want, ts)


# -------------------------------------------------------------- pii_redact

PII_BITS = [
    "mail me at bob.smith+x@example.co.uk now",
    "ssn 123-45-6789 end",
    "call 555-123-4567 or 555.987.6543",
    "no pii here",
    "almost 12-345-6789 and a@b",
    "",
]


@WAVE
@given(ts=st.lists(st.sampled_from(PII_BITS), min_size=1, max_size=5))
def test_pii_redact_vs_python(spark, ts):
    joined = [" ".join(row) for row in [ts]]
    df = spark.createDataFrame(list(enumerate(joined)), "id long, t string")
    out = pj.pii_redact(df, "t").collect()
    for r in out:
        s = joined[r.id]
        red = s
        for kind in ("email", "ssn", "phone"):
            red = re.sub(PII_PATTERNS[kind], f"[{kind.upper()}]", red)
        assert r.t_redacted == red, (r.t_redacted, red)
        for kind in ("email", "ssn", "phone"):
            want_n = len(re.findall(PII_PATTERNS[kind], s))
            assert getattr(r, f"pii_{kind}_count") == want_n, (kind, s)


# -------------------------------------------------------------- chunk_text

def _chunks(s: str, max_tokens: int, overlap: int):
    toks = _tokens(s) if len(_trim(s)) > 0 else []
    n = len(toks)
    if n == 0:
        return []
    step = max_tokens - overlap
    out = []
    for s1 in range(1, max(n, 1) + 1, step):  # 1-based starts
        if not (s1 == 1 or (n - s1 + 1) > overlap):
            continue
        sl = toks[s1 - 1 : s1 - 1 + max_tokens]
        out.append((" ".join(sl), min(n - s1 + 1, max_tokens)))
    return out


@WAVE
@given(
    ts=st.lists(texts, min_size=1, max_size=4),
    max_tokens=st.integers(1, 6),
    overlap=st.integers(0, 3),
)
def test_chunk_text_vs_python(spark, ts, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    df = spark.createDataFrame(list(enumerate(ts)), "id long, t string")
    out = pj.chunk_text(
        df, "t", max_tokens=max_tokens, overlap=overlap
    ).collect()
    got: dict = {}
    for r in out:
        got.setdefault(r.id, []).append((r.chunk_id, r.chunk, r.chunk_n_tokens))
    for i, t in enumerate(ts):
        want = _chunks(t, max_tokens, overlap)
        have = sorted(got.get(i, []))
        assert [(j, c, n) for j, (c, n) in enumerate(want)] == have, (
            t, want, have,
        )
