"""Real multimodal decode: stdlib PNG codec, WAV via wave, raw fallback,
vectorized frame_sample."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj
from pyjanitor_spark.utils.png import PNG_MAGIC, decode_png, encode_png


def _gradient(width, height, channels):
    return bytes(
        (x * 7 + y * 13 + c * 31) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


class TestPngCodec:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip(self, channels):
        px = _gradient(9, 5, channels)
        blob = encode_png(9, 5, channels, px)
        d = decode_png(blob)
        assert (d["width"], d["height"], d["channels"]) == (9, 5, channels)
        assert d["pixels"] == px

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types(self, ftype):
        # author a PNG whose every row uses the given filter, applying
        # the filter forward here; the decoder must invert it exactly
        width, height, channels = 7, 4, 3
        px = _gradient(width, height, channels)
        stride = width * channels
        rows = []
        prev = bytes(stride)
        for y in range(height):
            cur = px[y * stride : (y + 1) * stride]
            filt = bytearray(cur)
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ftype == 1:
                    filt[i] = (cur[i] - a) & 0xFF
                elif ftype == 2:
                    filt[i] = (cur[i] - b) & 0xFF
                elif ftype == 3:
                    filt[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[i] = (cur[i] - pred) & 0xFF
            rows.append(bytes([ftype]) + bytes(filt))
            prev = cur

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        blob = (
            PNG_MAGIC
            + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(blob)["pixels"] == px

    def test_rejects_garbage_and_unsupported(self):
        with pytest.raises(ValueError, match="magic"):
            decode_png(b"not a png at all")
        # 16-bit depth rejected
        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )
        blob = PNG_MAGIC + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        )
        with pytest.raises(ValueError, match="bit depth"):
            decode_png(blob)


def _wav_bytes(samples, framerate=8000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


class TestDecodeFeaturesReal:
    def _df(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_png_decoded_for_real(self, spark):
        px = _gradient(8, 6, 3)
        blob = encode_png(8, 6, 3, px)
        row = pj.decode_features(self._df(spark, [blob])).first()
        assert row["kind"] == "png"
        assert (row["width"], row["height"], row["channels"]) == (8, 6, 3)
        assert abs(row["feat_mean"] - sum(px) / len(px) / 255.0) < 1e-12
        assert row["n_bytes"] == len(blob)

    def test_wav_decoded_for_real(self, spark):
        samples = [0, 16384, -16384, 32767, -32768, 0]
        blob = _wav_bytes(samples)
        row = pj.decode_features(self._df(spark, [blob])).first()
        assert row["kind"] == "wav"
        assert (row["width"], row["height"], row["channels"]) == (len(samples), 1, 1)
        want = sum(abs(s) for s in samples) / len(samples) / 32768.0
        assert abs(row["feat_mean"] - want) < 1e-12

    def test_raw_fallback_tagged(self, spark):
        rows = {r["doc_id"]: r for r in pj.decode_features(
            self._df(spark, [b"plain text payload", b""])
        ).collect()}
        assert rows[0]["kind"] == "raw" and rows[0]["width"] is None
        assert rows[1]["kind"] == "raw" and rows[1]["feat_mean"] == 0.0

    def test_mixed_batch(self, spark):
        blob = encode_png(4, 4, 1, _gradient(4, 4, 1))
        out = pj.decode_features(
            self._df(spark, [blob, b"not media", _wav_bytes([100, -100])])
        )
        kinds = {r["doc_id"]: r["kind"] for r in out.collect()}
        assert kinds == {0: "png", 1: "raw", 2: "wav"}


class TestFrameSampleVectorized:
    def test_values_match_serial(self, spark):
        payloads = [bytes(range(256)) * 3, b"abc", b""]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )
        got = sorted(
            (r["doc_id"], r["frame_no"], r["value"])
            for r in pj.frame_sample(df, every=16).collect()
        )
        want = sorted(
            (i, fno, p[off])
            for i, p in enumerate(payloads)
            for fno, off in enumerate(range(0, len(p), 16))
        )
        assert got == want


from hypothesis import given, settings
from hypothesis import strategies as st


class TestPngCodecProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.integers(1, 4),
        data=st.data(),
    )
    def test_roundtrip_random_pixels(self, w, h, ch, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
                )
            )
        )
        d = decode_png(encode_png(w, h, ch, px))
        assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
        assert d["pixels"] == px


class TestNullPayloads:
    """NULL binary payloads flow through the mapInPandas verbs as NULL
    metadata / zero frames — never a Python worker crash."""

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, None), (2, bytearray(b"real bytes here"))],
            "doc_id long, payload binary",
        )

    def test_decode_features_null_row(self, spark):
        rows = {r["doc_id"]: r for r in pj.decode_features(self._df(spark)).collect()}
        assert rows[1]["kind"] is None and rows[1]["n_bytes"] is None
        assert rows[1]["feat_mean"] is None
        assert rows[2]["kind"] == "raw" and rows[2]["n_bytes"] == 15

    def test_frame_sample_null_skipped(self, spark):
        out = pj.frame_sample(self._df(spark), every=4)
        ids = [r["doc_id"] for r in out.collect()]
        assert set(ids) == {2} and len(ids) == 4  # ceil(15/4)

    def test_resize_payload_null_passthrough(self, spark):
        rows = {r["doc_id"]: r for r in pj.resize_payload(
            self._df(spark), target_bytes=8).collect()}
        assert rows[1]["payload"] is None and rows[1]["orig_bytes"] is None
        assert len(rows[2]["payload"]) == 8 and rows[2]["orig_bytes"] == 15
