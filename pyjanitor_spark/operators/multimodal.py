"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_stub=`` selects a deterministic fake that derives
features from the raw bytes, so the Spark-side plumbing — schema,
batch iteration, partitioning — is real and tested.  Swap
``_fake_decode`` for a PIL/librosa call in production.

Design: binary payloads stay in the executor (never collected); each
``mapInPandas`` batch is an Arrow RecordBatch, so bytes move
JVM→Python zero-copy.  Partitioning is whatever the upstream source
gives — for 100 TB of images, partition by file/object id and size
``spark.sql.files.maxPartitionBytes`` so one task holds a bounded
number of payloads.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary",
    "binary_metadata",
    "decode_features",
    "frame_sample",
    "resize_payload",
]


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
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def _fake_decode(payload: bytes, dim: int = 4) -> list[float]:
    """Deterministic fake 'decoder': byte-mean per stripe.  STUB —
    replace with a real image/audio decode (PIL.Image.open etc.)."""
    if not payload:
        return [0.0] * dim
    stripe = max(len(payload) // dim, 1)
    return [
        sum(payload[i * stripe : (i + 1) * stripe]) / max(len(payload[i * stripe : (i + 1) * stripe]), 1)
        for i in range(dim)
    ]


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 4,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Output schema is fixed up front (required by mapInPandas); the
    decode itself is the deterministic stub above."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = pdf[payload_col].map(lambda b: _fake_decode(bytes(b), dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "feat_mean": feats.map(lambda v: sum(v) / len(v)),
                    "feat_dim": dim,
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
    in production; this container has no image libs, so the transform is
    a deterministic byte resample with the same Spark shape: fixed
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
        for pdf in it:
            outs, origs = [], []
            for b in pdf[payload_col]:
                data = bytes(b)
                n = len(data)
                if n == 0:
                    outs.append(b"\x00" * target_bytes)
                else:
                    outs.append(
                        bytes(data[(i * n) // target_bytes] for i in range(target_bytes))
                    )
                origs.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": outs,
                    "orig_bytes": pd.Series(origs, dtype="int32"),
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
    explodes to many frame rows inside mapInPandas — is identical."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("value", T.IntegerType()),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, frames, vals = [], [], []
            for _, row in pdf.iterrows():
                data = bytes(row[payload_col])
                for i, off in enumerate(range(0, len(data), every)):
                    ids.append(row[id_col])
                    frames.append(i)
                    vals.append(data[off])
            yield pd.DataFrame({"doc_id": ids, "frame_no": frames, "value": vals})

    return df.select(id_col, payload_col).mapInPandas(batches, schema)
