"""Fuzz wave 15: multimodal decoders on corrupt payloads.

``binary_metadata`` / ``decode_features`` / ``resize_payload`` /
``frame_sample`` parse PNG/WAV headers from stdlib code on UNTRUSTED
bytes.  The contract fuzzed: random truncations, bit flips, byte
injections and garbage — including corruptions that keep the magic
bytes intact so the parser gets well past the header — must NULL-route
or raw-route, never kill the task or drop a row: every input id comes
back exactly once, schemas hold, and a successfully-decoded corrupt
payload still reports internally-consistent fields.  Derandomized
after two clean randomized sweeps (FUZZ15_RANDOM=1 to re-randomize).
"""

from __future__ import annotations

import io
import os
import struct
import wave

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyjanitor_spark as pj
from pyjanitor_spark.utils.png import encode_png

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ15_EXAMPLES", "8")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ15_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

KINDS = {"png", "wav", "raw"}


def _wav_bytes(samples, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _corrupt(draw, blob: bytes) -> bytes:
    mode = draw(st.integers(0, 4))
    if not blob:
        return blob
    if mode == 0:  # truncate anywhere (possibly mid-header)
        return blob[: draw(st.integers(0, len(blob) - 1))]
    if mode == 1:  # single bit flip anywhere
        i = draw(st.integers(0, len(blob) - 1))
        b = bytearray(blob)
        b[i] ^= 1 << draw(st.integers(0, 7))
        return bytes(b)
    if mode == 2:  # keep magic, scramble the body
        keep = min(len(blob), 12)
        body = draw(st.binary(min_size=0, max_size=64))
        return blob[:keep] + body
    if mode == 3:  # inject bytes mid-stream
        i = draw(st.integers(0, len(blob)))
        ins = draw(st.binary(min_size=1, max_size=8))
        return blob[:i] + ins + blob[i:]
    return blob + draw(st.binary(min_size=1, max_size=16))  # trailing junk


@st.composite
def payloads(draw):
    rows = []
    n = draw(st.integers(1, 8))
    for i in range(n):
        kind = draw(st.integers(0, 5))
        if kind == 0:  # valid png
            w, h, c = draw(st.integers(1, 5)), draw(st.integers(1, 5)), 1
            px = [((i * 37 + j) % 256) for j in range(w * h * c)]
            rows.append((i, encode_png(w, h, c, bytes(px))))
        elif kind == 1:  # corrupted png
            px = [0, 255, 17, 204]
            rows.append((i, _corrupt(draw, encode_png(2, 2, 1, bytes(px)))))
        elif kind == 2:  # valid wav
            samples = draw(
                st.lists(st.integers(-32768, 32767), min_size=0, max_size=16)
            )
            rows.append((i, _wav_bytes(samples)))
        elif kind == 3:  # corrupted wav
            rows.append((i, _corrupt(draw, _wav_bytes([100, -100, 31000]))))
        elif kind == 4:  # arbitrary bytes
            rows.append((i, draw(st.binary(min_size=0, max_size=64))))
        else:  # NULL payload
            rows.append((i, None))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None) for i, p in rows],
        "doc_id long, payload binary",
    )


@WAVE
@given(rows=payloads())
def test_decode_features_never_dies(spark, rows):
    out = {r["doc_id"]: r for r in pj.decode_features(_df(spark, rows)).collect()}
    assert sorted(out) == sorted(i for i, _ in rows)
    byid = dict(rows)
    for i, r in out.items():
        if byid[i] is None:
            assert r["kind"] is None and r["n_bytes"] is None
            continue
        assert r["n_bytes"] == len(byid[i])
        assert r["kind"] in KINDS, r["kind"]
        if r["kind"] == "raw":
            assert r["width"] is None and r["height"] is None
        else:  # decoded despite corruption: fields must be consistent
            assert r["width"] >= 0 and r["height"] >= 1
            assert r["channels"] >= 1
            assert 0.0 <= r["feat_mean"] <= 1.0


@WAVE
@given(rows=payloads())
def test_binary_metadata_never_dies(spark, rows):
    out = {
        r["doc_id"]: r for r in pj.binary_metadata(_df(spark, rows)).collect()
    }
    assert sorted(out) == sorted(i for i, _ in rows)
    for i, p in rows:
        r = out[i]
        if p is None:
            assert r["n_bytes"] is None
        else:
            assert r["n_bytes"] == len(p)
            assert r["digest"] is not None


@WAVE
@given(rows=payloads())
def test_resize_and_frame_sample_never_die(spark, rows):
    df = _df(spark, rows)
    rs = {r["doc_id"]: r for r in pj.resize_payload(df, target_bytes=16).collect()}
    assert sorted(rs) == sorted(i for i, _ in rows)
    for i, p in rows:
        if p is None:
            assert rs[i]["payload"] is None
        else:
            assert len(bytes(rs[i]["payload"])) == 16
            assert rs[i]["orig_bytes"] == len(p)
    # frame_sample EXPLODES payloads to frame rows: ids with a payload
    # shorter than the stride (or null) legitimately emit no frames —
    # the contract is no task death and no frames from null payloads
    fr = pj.frame_sample(df, every=4).collect()
    seen = {r["doc_id"] for r in fr}
    valid = {i for i, p in rows if p is not None and len(p) >= 1}
    assert seen <= valid
    for i, p in rows:
        if p is not None and len(p) >= 1:
            want = len(range(0, len(p), 4))
            got = sum(1 for r in fr if r["doc_id"] == i)
            assert got == want, (i, got, want)
