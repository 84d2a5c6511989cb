"""Multimodal binary-column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over ``mapInPandas``. The decode step
itself is STUBBED (no imaging/audio libraries in this environment) with
a deterministic fake keyed on the payload hash — the Spark-side
contract (schema, batching, partition behavior) is real and tested.

Real sources would use ``spark.read.format("binaryFile")`` (path,
modificationTime, length, content) — same downstream plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this environment


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: dimensions and an
    8-dim feature derived from the payload sha256. Replace with
    PIL/cv2/librosa when available."""
    h = hashlib.sha256(payload).digest()
    width = 32 + h[0] % 608
    height = 32 + h[1] % 608
    n_frames = 1 + h[2] % 16
    feature = [b / 255.0 for b in h[:8]]
    return width, height, n_frames, feature


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: per Arrow batch, payload -> (dims, frames,
    feature vector). Raises NotImplementedError for real decoding when
    decoders are absent UNLESS the deterministic fake is acceptable —
    callers opt in implicitly; production swaps _fake_decode only."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": decoded.map(lambda t: t[0]).astype("int32"),
                    "height": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int32"),
                    "feature": decoded.map(lambda t: t[3]),
                }
            )
            yield out

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: text bytes as
    the opaque payload (FIXTURES.md §B — stands in for image/audio)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.sha2("text", 256).alias("sha256"),
    )
