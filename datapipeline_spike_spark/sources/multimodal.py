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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("scale", T.FloatType()),
        T.StructField("letterbox", T.BooleanType()),
    ]
)


def resize_media(decoded: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Aspect-preserving resize plan over decoded media: computes the
    scale factor and whether letterboxing is needed per item. The pixel
    transform itself is the stubbed step (no imaging libs here); the
    geometry math, Arrow batching, and schema are the real contract a
    PIL/cv2 `im.resize` drop-in would use."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (target_w / pdf["width"]).combine(target_h / pdf["height"], min)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale": scale.astype("float32"),
                    "letterbox": (pdf["width"] * target_h != pdf["height"] * target_w),
                }
            )

    return decoded.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_frames(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for video media: 1-to-many mapInPandas — each
    video row fans out to one row per kept frame (indices 0, n, 2n...).
    The per-frame feature is the stubbed decode feature salted by frame
    index; a real pipeline decodes the frame bytes here. Output row
    count is sum(ceil(n_frames/every_n)) over videos — bounded and
    predictable, no unbounded explode."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            if not len(vids):
                continue
            rows = []
            for r in vids.itertuples(index=False):
                for idx in range(0, int(r.n_frames), every_n):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "n_frames": int(r.n_frames),
                            "feature": [min(1.0, f + idx / 100.0) for f in r.feature],
                        }
                    )
            yield pd.DataFrame(rows)

    return decoded.mapInPandas(frames, schema=FRAME_SCHEMA)


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
