"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode is REAL for the formats stdlib can handle and import-gated for
the rest (same gate pattern as the rdkit chemistry pack):

* PNG  — PIL when installed (fast path), else the pure-stdlib codec in
  ``utils/png.py`` (public PNG spec, zlib+struct);
* WAV  — stdlib ``wave`` + numpy sample statistics;
* anything else — PIL if it recognizes the bytes, else a deterministic
  byte-stripe fake (kind='raw'), clearly marked in the output's ``kind``
  column so downstream filters can segregate undecoded rows.

Design: binary payloads stay in the executor (never collected); each
``mapInPandas`` batch is an Arrow RecordBatch, so bytes move
JVM→Python zero-copy.  Partitioning is whatever the upstream source
gives — for 100 TB of images, partition by file/object id and size
``spark.sql.files.maxPartitionBytes`` so one task holds a bounded
number of payloads.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyjanitor_spark.utils.png import PNG_MAGIC, decode_png

__all__ = [
    "attach_binary",
    "binary_metadata",
    "decode_features",
    "frame_sample",
    "resize_payload",
]

try:  # import-gated fast path; absent in this container
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None


def attach_binary(df: DataFrame, source_col: str, dest: str = "payload") -> DataFrame:
    """Encode a column into a binary payload column (test harness for
    the multimodal path; real pipelines read binary from parquet/files)."""
    return df.withColumn(dest, F.encode(F.col(source_col).cast("string"), "UTF-8"))


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length, first
    byte (magic probe), md5 digest — pure expressions, no decode."""
    p = F.col(payload_col)
    first_byte = F.conv(F.hex(F.substring(p, 1, 1)), 16, 10).cast("int")
    return (
        df.withColumn("n_bytes", F.length(p))
        .withColumn("magic", first_byte)
        .withColumn("digest", F.md5(p))
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic fallback 'decoder' for unrecognized formats:
    byte-mean per stripe.  Rows taking this path are tagged
    ``kind='raw'`` so they are distinguishable from real decodes."""
    if not payload:
        return [0.0] * dim
    stripe = max(len(payload) // dim, 1)
    return [
        sum(payload[i * stripe : (i + 1) * stripe])
        / max(len(payload[i * stripe : (i + 1) * stripe]), 1)
        for i in range(dim)
    ]


def _decode_wav(data: bytes) -> dict | None:
    """WAV via stdlib ``wave``: frame count, channel count, and the mean
    absolute sample amplitude normalized to [0, 1]."""
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            frames = w.readframes(w.getnframes())
        if n_channels < 1:
            return None
        # A truncated body can yield a buffer that is not a multiple of
        # the sample width (fuzz wave 15) — trim the ragged tail rather
        # than letting frombuffer raise.
        frames = frames[: len(frames) - len(frames) % (sampwidth * n_channels)]
        if sampwidth == 1:
            samples = (
                np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
            )
            scale = 128.0
        elif sampwidth == 2:
            samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
            scale = 32768.0
        else:  # 24/32-bit: rare in fixtures; treat as undecodable here
            return None
    except Exception:
        return None
    mean = float(np.abs(samples).mean() / scale) if samples.size else 0.0
    return {
        "kind": "wav",
        # report frames actually decoded, not the header's claim — a
        # corrupt header can declare more frames than the body holds
        "width": len(samples) // n_channels,
        "height": 1,
        "channels": n_channels,
        "feat_mean": mean,
        "feat_dim": n_channels,
    }


def _decode_image(data: bytes) -> dict | None:
    """PNG via PIL when installed, else the stdlib codec; feat_mean is
    the mean pixel byte value normalized to [0, 1]."""
    if _PILImage is not None:
        try:
            img = _PILImage.open(io.BytesIO(data))
            img.load()
        except Exception:
            return None
        px = img.tobytes()
        channels = len(img.getbands())
        mean = (sum(px) / len(px) / 255.0) if px else 0.0
        return {
            "kind": (img.format or "image").lower(),
            "width": img.width,
            "height": img.height,
            "channels": channels,
            "feat_mean": mean,
            "feat_dim": channels,
        }
    if data[:8] == PNG_MAGIC:
        try:
            d = decode_png(data)
        except ValueError:
            return None
        px = d["pixels"]
        mean = (sum(px) / len(px) / 255.0) if px else 0.0
        return {
            "kind": "png",
            "width": d["width"],
            "height": d["height"],
            "channels": d["channels"],
            "feat_mean": mean,
            "feat_dim": d["channels"],
        }
    return None


def _decode_payload(data: bytes, dim: int) -> dict:
    if data[:8] == PNG_MAGIC or _PILImage is not None:
        got = _decode_image(data)
        if got is not None:
            return got
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        got = _decode_wav(data)
        if got is not None:
            return got
    feats = _fake_decode(data, dim)
    return {
        "kind": "raw",
        "width": None,
        "height": None,
        "channels": None,
        "feat_mean": sum(feats) / len(feats),
        "feat_dim": dim,
    }


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 4,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Output schema is fixed up front (required by mapInPandas).  PNG and
    WAV payloads decode for real (see module docstring); other formats
    decode via PIL when installed, else fall back to the deterministic
    byte-stripe features with ``kind='raw'``."""
    import pandas as pd

    _null_rec = {
        "kind": None, "width": None, "height": None,
        "channels": None, "feat_mean": None, "feat_dim": None,
    }

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            # NULL payload -> all-NULL feature row (never a crash)
            recs = [
                _decode_payload(bytes(b), dim) if b is not None else _null_rec
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.array(
                        [len(b) if b is not None else None
                         for b in pdf[payload_col]],
                        dtype="Int32",
                    ),
                    "kind": [r["kind"] for r in recs],
                    "width": pd.array(
                        [r["width"] for r in recs], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in recs], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [r["channels"] for r in recs], dtype="Int32"
                    ),
                    "feat_mean": [r["feat_mean"] for r in recs],
                    "feat_dim": pd.array(
                        [r["feat_dim"] for r in recs], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, _FEATURE_SCHEMA)


def resize_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_bytes: int = 64,
) -> DataFrame:
    """'Resize' the opaque payload to a fixed byte length by uniform
    resampling — the stand-in for an image resize (PIL ``Image.resize``
    in production; the transform keeps the real Spark shape: fixed
    output schema, Arrow batches, payload never leaves the executor)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("orig_bytes", T.IntegerType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in it:
            outs, origs = [], []
            for b in pdf[payload_col]:
                if b is None:  # NULL payload passes through as NULL
                    outs.append(None)
                    origs.append(None)
                    continue
                data = np.frombuffer(bytes(b), dtype=np.uint8)
                n = data.size
                if n == 0:
                    outs.append(b"\x00" * target_bytes)
                else:
                    idx = (np.arange(target_bytes, dtype=np.int64) * n) // target_bytes
                    outs.append(data[idx].tobytes())
                origs.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": outs,
                    "orig_bytes": pd.array(origs, dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every: int = 16,
) -> DataFrame:
    """'Video frame sampling' over the opaque payload: emit every
    ``every``-th byte as a frame row (id, frame_no, value).  The real
    implementation would demux frames; the Spark shape — one input row
    explodes to many frame rows inside mapInPandas — is identical.

    Fully vectorized inside each Arrow batch: ``np.frombuffer`` views
    the payloads zero-copy, strided indexing picks the frames, and ids
    repeat by per-payload frame counts — no per-row Python loop."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("value", T.IntegerType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in it:
            # NULL payload -> zero frames, same as an empty payload
            arrs = [
                np.frombuffer(bytes(b), dtype=np.uint8)[::every]
                if b is not None
                else np.array([], dtype=np.uint8)
                for b in pdf[payload_col]
            ]
            counts = np.array([a.size for a in arrs], dtype=np.int64)
            vals = (
                np.concatenate(arrs) if arrs else np.array([], dtype=np.uint8)
            )
            ids = np.repeat(pdf[id_col].to_numpy(), counts)
            frame_no = (
                np.concatenate([np.arange(c, dtype=np.int32) for c in counts])
                if len(counts)
                else np.array([], dtype=np.int32)
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": frame_no,
                    "value": vals.astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema)
