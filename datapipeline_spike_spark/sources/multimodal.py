"""Multimodal binary-column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` payloads + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over ``mapInPandas``.

Decode tiers:
- **Container headers are parsed for real** with pure stdlib
  (``struct``/``zlib``): PNG IHDR, JPEG SOF, GIF logical screen
  descriptor -> (format, width, height). No imaging library needed.
- **Full-pixel decode** (resample, color-convert) is the only stubbed
  step (no PIL/cv2/librosa in this environment): non-image payloads
  fall back to a deterministic fake keyed on the payload hash, so the
  Spark-side contract (schema, batching, partition behavior) stays
  real and tested either way.

Real sources would use ``spark.read.format("binaryFile")`` (path,
modificationTime, length, content) — same downstream plumbing.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
        T.StructField("media_format", T.StringType()),  # parsed container, null if unrecognized
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),  # video containers only
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

# Frame-count convention for the metadata tier: MP4 sample tables are
# not walked (that is full decode), so n_frames is estimated at a
# nominal 25 fps from the mvhd duration — documented, deterministic,
# and replaced by the real stts count when a full decoder is wired in.
NOMINAL_VIDEO_FPS = 25

REAL_PIXEL_DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this environment

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (all SOFn except
# DHT/JPG/DAC which share the 0xC0 nibble but are not frames)
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Pure-stdlib container-header parse -> (format, width, height), or
    None when the payload is not a recognized image. This is a REAL
    decoder for the metadata tier: it reads the bytes a PIL ``im.size``
    would, with ``struct`` alone.

    - PNG: 8-byte signature, then the IHDR chunk holds width/height as
      big-endian uint32 at offsets 16/20.
    - JPEG: walk the marker segments from SOI until a SOFn frame header;
      height/width are big-endian uint16 at +5/+7 into the segment.
    - GIF: 6-byte version signature, then the logical screen descriptor
      holds width/height as little-endian uint16.
    """
    if len(payload) >= 24 and payload[:8] == _PNG_SIG and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte: only one 0xFF is padding
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    return None


def parse_audio_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """Pure-stdlib audio container parse -> (format, n_channels,
    sample_rate, bits_per_sample), or None when unrecognized. WAV/RIFF:
    walk the chunks from offset 12 until 'fmt ' (little-endian fields
    at +10/+12/+22 into the chunk body per the RIFF spec)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"fmt " and i + 8 + 16 <= len(payload):
            channels, rate = struct.unpack("<HI", payload[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", payload[i + 22 : i + 24])
            return "wav", channels, rate, bits
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return None


def parse_audio_meta(payload: bytes) -> tuple[str, int, int, int, int] | None:
    """Like :func:`parse_audio_header` but also walks to the ``data``
    chunk for the sample count -> (format, n_channels, sample_rate,
    bits_per_sample, n_samples). Still pure stdlib; None when not a
    RIFF/WAVE container or the fmt chunk is missing."""
    header = parse_audio_header(payload)
    if header is None:
        return None
    fmt, channels, rate, bits = header
    block = max(1, channels * bits // 8)
    n_samples = 0
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"data":
            n_samples = size // block
            break
        i += 8 + size + (size & 1)
    return fmt, channels, rate, bits, n_samples


def wav_data_offset(payload: bytes) -> int | None:
    """Byte offset of the ``data`` chunk's PAYLOAD via the real RIFF
    chunk walk (r14 review): ``payload.find(b"data")`` locks onto the
    first byte-string match anywhere — a LIST/INFO chunk whose text
    contains the substring "data" (e.g. an ICMT comment "metadata v2")
    sits BEFORE the data chunk in real WAVs and silently misaligned
    every sample read. Walking chunk headers like
    :func:`parse_audio_meta` does cannot be fooled by chunk bodies.
    None when no data chunk exists."""
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if tag == b"data":
            return i + 8
        i += 8 + size + (size & 1)
    return None


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

_WAV_RATES = (8000, 16000, 22050, 44100)
_WAV_BITS = (8, 16, 24)


def audio_media_from_documents(docs: DataFrame) -> DataFrame:
    """Real WAV bytes for the corpus: per document a complete PCM RIFF
    container whose (channels, rate, bits, samples) derive
    deterministically from doc_id — same oracle-replayable pattern as
    :func:`image_media_from_documents`."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_wav(
                            n_channels=1 + d % 2,
                            sample_rate=_WAV_RATES[d % 4],
                            bits=_WAV_BITS[d % 3],
                            n_samples=8 + d % 50,
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "audio",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas audio decode, metadata tier: RIFF chunk walk ->
    (format, channels, rate, bits, samples, duration). duration_ms =
    n_samples * 1000 // rate (integer math, SQL-replayable). Waveform
    decode (the full tier) would land here when an audio lib exists."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(parse_audio_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_format": metas.map(lambda t: t and t[0]),
                    "n_channels": pd.array(
                        metas.map(lambda t: t and t[1]), dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        metas.map(lambda t: t and t[2]), dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        metas.map(lambda t: t and t[3]), dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        metas.map(lambda t: t and t[4]), dtype="Int64"
                    ),
                    "duration_ms": pd.array(
                        metas.map(lambda t: t and t[4] * 1000 // t[2]), dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(decode_batches, schema=AUDIO_DECODED_SCHEMA)


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each ISO BMFF box in
    buf[start:end]. Handles 64-bit largesize (size==1) and to-end
    (size==0) boxes; stops on malformed sizes rather than raising."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        typ = buf[i + 4 : i + 8]
        if size == 0:  # box extends to end of enclosing container
            yield typ, i + 8, end
            return
        if size == 1:  # 64-bit largesize follows the type
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            if size < 16 or i + size > end:
                return
            yield typ, i + 16, i + size
            i += size
            continue
        if size < 8 or i + size > end:
            return
        yield typ, i + 8, i + size
        i += size


def parse_video_header(payload: bytes) -> tuple[str, int | None, int | None, int, int] | None:
    """Pure-stdlib MP4 (ISO BMFF) container parse -> (format, width,
    height, duration_ms, n_tracks), or None when unrecognized. Walks
    the top-level boxes to ``moov``, reads ``mvhd`` (timescale +
    duration, v0 and v1 layouts) and the first ``tkhd`` carrying
    nonzero 16.16 fixed-point presentation dimensions; counts ``trak``
    children. Sample tables (frame counts) are deliberately not walked
    — that is the full-decode tier."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    width = height = None
    timescale = duration = None
    n_tracks = 0
    for typ, bs, be in _walk_boxes(payload, 0, len(payload)):
        if typ != b"moov":
            continue
        for ctyp, cs, ce in _walk_boxes(payload, bs, be):
            if ctyp == b"mvhd" and ce - cs >= 20:
                ver = payload[cs]
                if ver == 1 and ce - cs >= 32:
                    (timescale,) = struct.unpack(">I", payload[cs + 20 : cs + 24])
                    (duration,) = struct.unpack(">Q", payload[cs + 24 : cs + 32])
                else:
                    timescale, duration = struct.unpack(">II", payload[cs + 12 : cs + 20])
            elif ctyp == b"trak":
                n_tracks += 1
                for ttyp, ts_, te in _walk_boxes(payload, cs, ce):
                    if ttyp == b"tkhd" and width is None and te - ts_ >= 8:
                        off = 88 if payload[ts_] == 1 else 76
                        if te - ts_ >= off + 8:
                            w16, h16 = struct.unpack(
                                ">II", payload[ts_ + off : ts_ + off + 8]
                            )
                            if w16 or h16:
                                width, height = w16 >> 16, h16 >> 16
    if not timescale:
        return None
    duration_ms = int(duration or 0) * 1000 // timescale
    return "mp4", width, height, duration_ms, n_tracks


_MP4_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _mp4_box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def synthetic_mp4(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """A complete, valid MP4 skeleton (ftyp + moov[mvhd + trak[tkhd]])
    built with stdlib only — spec-layout v0 boxes (100-byte mvhd body,
    84-byte tkhd body, unity matrix), no media data. Real bytes for
    exercising the header parser."""
    duration = duration_ms * timescale // 1000
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd_body = (
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation / modification time
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + _MP4_MATRIX
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2)  # next_track_ID
    )
    tkhd_body = (
        struct.pack(">I", 0x00000007)  # version 0 + (enabled|in_movie|in_preview)
        + struct.pack(">II", 0, 0)  # creation / modification time
        + struct.pack(">I", 1)  # track_ID
        + b"\x00" * 4  # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alternate, volume, reserved
        + _MP4_MATRIX
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed point
    )
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd_body))
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd_body) + trak)
    return ftyp + moov


def synthetic_wav(
    n_channels: int = 1, sample_rate: int = 16000, bits: int = 16, n_samples: int = 8
) -> bytes:
    """A complete, valid PCM WAV (RIFF + fmt + data of silence) built
    with stdlib only."""
    block = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block, block, bits
    )
    data = b"\x00" * (n_samples * block)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synthetic_wav_pattern(seed: int, n_samples: int, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV whose samples follow a deterministic integer
    pattern of ``seed`` — sample i = ((seed * 31 + i * 17) % 4001) - 2000
    — so a SQL oracle can regenerate the exact waveform and replay any
    feature computed from the DECODED bytes (the full-decode tier, not
    just headers)."""
    samples = [
        ((seed * 31 + i * 17) % 4001) - 2000 for i in range(n_samples)
    ]
    data = struct.pack(f"<{n_samples}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_pattern_media_from_documents(docs: DataFrame) -> DataFrame:
    """Patterned-waveform WAVs (mono 16-bit, 8 + doc_id % 50 samples):
    the corpus for the full-decode audio feature path."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_wav_pattern(
                            seed=int(d), n_samples=8 + int(d) % 50
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "audio",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_audio_pcm_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """FULL-decode audio tier: RIFF chunk walk -> raw PCM int16 frames ->
    per-clip signal features, computed so a SQL oracle replays them
    exactly from the regenerated waveform:

    - sum-of-squares and peak accumulate in EXACT integer arithmetic
      (int16 samples, bounded clips — no float reduction order anywhere);
    - rms = round(sqrt(sum_sq / n), 6): one division and one IEEE sqrt,
      identical in any engine;
    - mean = round(sum / n, 6) likewise from an exact integer sum.

    Arrow-batched mapInPandas; clips with unsupported shapes (non-PCM,
    not 16-bit mono) yield NULL features rather than failing the scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def one(payload: bytes):
            meta = parse_audio_meta(payload)
            if not meta or meta[1] != 1 or meta[3] != 16 or meta[4] == 0:
                return None
            n = meta[4]
            i = wav_data_offset(payload)
            if i is None:
                return None
            raw = payload[i : i + 2 * n]
            try:
                # a truncated data chunk (len(raw) < 2n) must degrade to
                # a NULL row, not fail the whole scan
                xs = struct.unpack(f"<{n}h", raw)
            except struct.error:
                return None
            sum_x = sum(xs)                      # exact ints
            sum_sq = sum(x * x for x in xs)
            peak = max(abs(x) for x in xs)
            return (
                n,
                round(math.sqrt(sum_sq / n), 6),
                int(peak),
                round(sum_x / n, 6),
            )

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(
                        out.map(lambda t: t and t[0]), dtype="Int64"
                    ),
                    "rms": out.map(lambda t: t and t[1]).astype("Float64"),
                    "peak": pd.array(out.map(lambda t: t and t[2]), dtype="Int64"),
                    "mean_amplitude": out.map(lambda t: t and t[3]).astype("Float64"),
                }
            )

    return df.mapInPandas(
        feats,
        schema=(
            "media_id long, n_samples long, rms double, "
            "peak long, mean_amplitude double"
        ),
    )


def decode_audio_band_ratios(
    df: DataFrame, payload_col: str = "payload", n_bands: int = 4
) -> DataFrame:
    """Audio SPECTRAL tier (r8, the frequency-domain sibling of
    :func:`decode_audio_pcm_features`): RIFF walk -> int16 PCM -> rFFT
    -> per-clip spectral balance. The sub-Nyquist non-DC bins 1..hi
    (hi = (n-1)//2) split into ``n_bands`` contiguous bands; each
    band's share of the spectral energy comes back as
    band_ratio_1..n_bands, with the EXACT integer time-domain energy
    (sum x^2) alongside as the SQL-anchorable Parseval cross-check
    (sum |X_k|^2 over ALL bins == n * sum x^2).

    Ratios are scale-free O(1) values, so 6dp rounding absorbs the
    ~1e-12 relative drift between numpy's FFT and a direct-DFT trig-sum
    replay (the dominant_frequency_verified precedent) — an r9 oracle
    can regenerate the waveform and replay every column. Clips with
    hi < n_bands (too short to populate each band) or unsupported
    shapes yield NULL ratios, never a failed scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(payload: bytes):
            meta = parse_audio_meta(payload)
            if not meta or meta[1] != 1 or meta[3] != 16 or meta[4] == 0:
                return None
            n = meta[4]
            i = wav_data_offset(payload)
            if i is None:
                return None
            try:
                xs = struct.unpack(f"<{n}h", payload[i : i + 2 * n])
            except struct.error:
                return None
            hi = (n - 1) // 2
            if hi < n_bands:
                return (n, sum(x * x for x in xs), None)
            mag2 = np.abs(np.fft.rfft(np.asarray(xs, dtype=np.float64))) ** 2
            spec = mag2[1 : hi + 1]
            total = float(spec.sum())
            if total <= 0.0:
                return (n, sum(x * x for x in xs), [0.0] * n_bands)
            edges = [1 + b * hi // n_bands for b in range(n_bands + 1)]
            ratios = [
                round(float(spec[edges[b] - 1 : edges[b + 1] - 1].sum()) / total, 6)
                for b in range(n_bands)
            ]
            return (n, sum(x * x for x in xs), ratios)

        for pdf in batches:
            out = pdf[payload_col].map(one)
            cols = {
                "media_id": pdf["media_id"],
                "n_samples": pd.array(out.map(lambda t: t and t[0]), dtype="Int64"),
                "energy_td": pd.array(out.map(lambda t: t and t[1]), dtype="Int64"),
            }
            for b in range(n_bands):
                cols[f"band_ratio_{b + 1}"] = out.map(
                    lambda t, b=b: t[2][b] if t and t[2] else None
                ).astype("Float64")
            yield pd.DataFrame(cols)

    ratio_cols = ", ".join(f"band_ratio_{b + 1} double" for b in range(n_bands))
    return df.mapInPandas(
        feats, schema=f"media_id long, n_samples long, energy_td long, {ratio_cols}"
    )


def synthetic_png_pattern(seed: int, width: int, height: int) -> bytes:
    """8-bit grayscale PNG whose pixel k (row-major) is
    ``(seed * 7 + k * 13) % 256`` — filter byte 0 on every scanline, so
    the decoder's unfiltering is trivial and a SQL oracle regenerates
    the exact pixel stream from (seed, width, height)."""
    rows = []
    k = 0
    for _ in range(height):
        row = bytearray([0])  # filter: None
        for _ in range(width):
            row.append((seed * 7 + k * 13) % 256)
            k += 1
        rows.append(bytes(row))
    raw = b"".join(rows)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def image_pattern_media_from_documents(docs: DataFrame) -> DataFrame:
    """Patterned grayscale PNGs (4 + doc_id % 13 wide, 3 + doc_id % 7
    tall): the corpus for the full-decode image feature path."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_png_pattern(
                            seed=int(d), width=4 + int(d) % 13, height=3 + int(d) % 7
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "image",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def _png_gray8_pixels(payload: bytes) -> tuple[int, int, list[int]] | None:
    """Shared full-decode kernel for the PNG pixel tiers (the r12 wave-3
    dedup: the stats and dHash decoders patched this logic in lockstep
    twice): chunk walk -> IHDR validation (grayscale-8, filter-None
    only) -> BOUNDED zlib inflate (a deflate bomb degrades to None
    before materializing; dims capped at 64M pixels) -> scanline
    unfilter. Returns (w, h, row-major pixels) or None for anything
    malformed/out-of-subset — callers emit a NULL row, never raise."""
    if not payload.startswith(_PNG_SIG):
        return None
    i = len(_PNG_SIG)
    w = h = None
    idat = b""
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + ln]
        if tag == b"IHDR":
            try:
                w, h, bits, ctype = struct.unpack(">IIBB", body[:10])
            except struct.error:  # truncated IHDR
                return None
            if bits != 8 or ctype != 0:
                return None
        elif tag == b"IDAT":
            idat += body
        i += 12 + ln
    if not w or not h or not idat or w * h > (1 << 26):
        return None  # absent/absurd dims: untrusted header
    try:
        need = (w + 1) * h
        d = zlib.decompressobj()
        raw = d.decompress(idat, need + 1)
        if len(raw) != need or d.unconsumed_tail:
            return None
    except zlib.error:
        return None
    px: list[int] = []
    for r in range(h):
        row = raw[r * (w + 1) : (r + 1) * (w + 1)]
        if len(row) != w + 1 or row[0] != 0:
            return None  # only filter None is supported
        px.extend(row[1:])
    return w, h, px


def decode_image_pixel_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """FULL-decode image tier: PNG chunk walk -> zlib-inflate IDAT ->
    unfilter scanlines (:func:`_png_gray8_pixels`) -> per-image pixel
    statistics, with integer-exact accumulation (8-bit pixels; sum /
    min / max over exact ints; mean = one division rounded 6dp) so a
    SQL oracle replays every number from the regenerated pixel stream.
    Only filter-0 grayscale-8 images are decoded (what the pattern
    builder emits); anything else yields NULL features rather than
    failing the scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            decoded = _png_gray8_pixels(payload)
            if decoded is None:
                return None
            _, _, px = decoded
            n = len(px)
            return (n, round(sum(px) / n, 6), min(px), max(px))

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_pixels": pd.array(out.map(lambda t: t and t[0]), dtype="Int64"),
                    "mean_px": out.map(lambda t: t and t[1]).astype("Float64"),
                    "min_px": pd.array(out.map(lambda t: t and t[2]), dtype="Int64"),
                    "max_px": pd.array(out.map(lambda t: t and t[3]), dtype="Int64"),
                }
            )

    return df.mapInPandas(
        feats,
        schema="media_id long, n_pixels long, mean_px double, min_px long, max_px long",
    )


def synthetic_png(width: int, height: int) -> bytes:
    """A complete, valid 8-bit grayscale PNG of the given dimensions
    (signature + IHDR + zlib IDAT of zero scanlines + IEND), built with
    stdlib only — real bytes for exercising the header parser."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * ((1 + width) * height), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def synthetic_jpeg(width: int, height: int) -> bytes:
    """A JPEG prefix with a well-formed SOF0 frame header carrying the
    dimensions (SOI + APP0/JFIF + SOF0 + EOI; no scan data — header
    parsing is the tier under test)."""
    jfif = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + jfif + sof0 + b"\xff\xd9"


def synthetic_gif(width: int, height: int) -> bytes:
    """A GIF89a header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


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
    """mapInPandas decode: per Arrow batch, payload -> (format, dims,
    frames, feature vector). Recognized image containers (PNG/JPEG/GIF)
    get their REAL parsed dimensions via :func:`parse_image_header`;
    other payloads fall back to the deterministic hash fake (the
    full-pixel tier production would route to PIL/cv2/librosa)."""

    def _dim(x):
        # a container header is untrusted input: a corrupt IHDR/tkhd can
        # claim a 4-byte dimension past int32 — report NULL instead of
        # failing the Arrow batch's Int32 cast (r12 fuzz contract)
        return x if x is not None and 0 < x < (1 << 31) else None

    def decode_one(
        payload: bytes,
    ) -> tuple[str | None, int | None, int | None, int, int | None, list[float]]:
        feat = [b / 255.0 for b in hashlib.sha256(payload).digest()[:8]]
        image = parse_image_header(payload)
        if image is not None:
            fmt, w, h = image
            return fmt, _dim(w), _dim(h), 1, None, feat
        video = parse_video_header(payload)
        if video is not None:
            fmt, w, h, dur_ms, _ = video
            # durations are Int64 and 0 is a VALID placeholder duration
            # (empty mvhd) — only negative/past-int64 claims are the
            # corrupt-header case, a looser bound than the dims'
            if dur_ms is not None and not (0 <= dur_ms < (1 << 63)):
                dur_ms = None
            n_frames = (
                max(1, min(dur_ms * NOMINAL_VIDEO_FPS // 1000, (1 << 31) - 1))
                if dur_ms is not None
                else 1
            )
            return fmt, _dim(w), _dim(h), n_frames, dur_ms, feat
        audio = parse_audio_header(payload)
        if audio is not None:
            # dimensions are meaningless for audio; rate/bits live on
            # parse_audio_header for callers that want them
            return audio[0], None, None, 1, None, feat
        w, h, n_frames, feat = _fake_decode(payload)
        return None, w, h, n_frames, None, feat

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(decode_one)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "media_format": decoded.map(lambda t: t[0]),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": pd.array(decoded.map(lambda t: t[1]), dtype="Int32"),
                    "height": pd.array(decoded.map(lambda t: t[2]), dtype="Int32"),
                    "n_frames": decoded.map(lambda t: t[3]).astype("int32"),
                    "duration_ms": pd.array(
                        decoded.map(lambda t: t[4]), dtype="Int64"
                    ),
                    "feature": decoded.map(lambda t: t[5]),
                }
            )
            yield out

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def image_media_from_documents(docs: DataFrame) -> DataFrame:
    """Real image bytes for the corpus: per document, a complete
    synthetic PNG / JPEG-header / GIF payload (round-robin by doc_id)
    whose dimensions derive deterministically from doc_id — so a SQL
    oracle can recompute the expected (format, width, height) from
    doc_id alone, and a hash match proves the binary encode -> header
    parse round-trip, not just the plumbing."""
    builders = {0: ("png", synthetic_png), 1: ("jpeg", synthetic_jpeg), 2: ("gif", synthetic_gif)}

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmt_w_h = pdf["doc_id"].map(
                lambda d: (builders[d % 3][0], 16 + d % 64, 16 + (d // 3) % 48)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        builders[d % 3][1](w, h)
                        for d, (_, w, h) in zip(pdf["doc_id"], fmt_w_h)
                    ],
                    "media_type": fmt_w_h.map(lambda t: "image"),
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def video_media_from_documents(docs: DataFrame) -> DataFrame:
    """Real MP4 bytes for the corpus: per document a complete synthetic
    container whose dimensions and duration derive deterministically
    from doc_id (same oracle-replayable pattern as
    :func:`image_media_from_documents`)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_mp4(
                            64 + d % 128, 48 + (d // 2) % 96, 500 + (d % 100) * 40
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "video",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


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


# --- JPEG baseline-DCT full-decode tier (r7) ---------------------------------
#
# A real baseline JPEG codec in pure stdlib: canonical Huffman tables
# from the public ITU-T T.81 spec (Annex K), DPCM DC + run-length AC
# entropy coding with byte stuffing, dequantization, and a separable
# float IDCT. The pattern generator emits CONSTANT 8x8 blocks (DC-only,
# quant table all ones): the DCT of a constant block is exactly
# 8*(v-128) in the DC slot with all ACs zero, and the float IDCT of a
# DC-only block lands within ~1e-13 of the integer source value, so
# decode-round recovers the source pixels EXACTLY — which is what lets
# a SQL oracle replay features computed from fully entropy-decoded
# bytes. The decoder itself is general baseline grayscale (arbitrary
# AC coefficients, ZRL/EOB runs, any 8-bit quant table) — the AC path
# is differential-tested against an independent direct 2D IDCT.

import math

# ITU-T T.81 Table K.3 / K.4 (typical luminance DC): counts per code
# length 1..16, then the symbol values in canonical order.
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
# ITU-T T.81 Table K.5 (typical luminance AC)
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)
# zigzag[k] = natural (row-major) index of zigzag position k
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_IDCT_C = [1 / math.sqrt(2)] + [1.0] * 7


def _huff_codes(bits, vals):
    """Canonical Huffman assignment per T.81 C.2: symbol -> (code, len)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF -> 0xFF00 byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


class _JpegBitReader:
    """Inverse of the writer: un-stuffs 0xFF00; raises on a marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("eof in entropy stream")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.buf) and self.buf[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker in entropy stream")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def encode_jpeg_gray(blocks, width: int, height: int, qtable=None) -> bytes:
    """Baseline JFIF encoder for one grayscale component: ``blocks`` are
    QUANTIZED coefficient 64-lists in natural (row-major) order, one per
    8x8 MCU in row-major MCU order. Emits SOI + DQT + SOF0 + DHT (the
    Annex K typical luminance tables) + SOS + entropy data + EOI."""
    q = list(qtable) if qtable is not None else [1] * 64
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = 0
    for blk in blocks:
        zz = [blk[_ZIGZAG[k]] for k in range(64)]
        diff = zz[0] - pred
        pred = zz[0]
        s = abs(diff).bit_length()
        if s > 11:
            raise ValueError(
                f"DC difference {diff} exceeds baseline Huffman category 11"
            )
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k] != 0:
                last_nz = k
                break
        run = 0
        k = 1
        while k <= last_nz:
            if zz[k] == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL: 16 zeros
                w.write(code, ln)
                run -= 16
            s = abs(zz[k]).bit_length()
            if s > 10:
                raise ValueError(
                    f"AC coefficient {zz[k]} exceeds baseline Huffman category 10"
                )
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1, s)
            run = 0
            k += 1
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            w.write(code, ln)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(q[_ZIGZAG[k]] for k in range(64)))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(w.out) + b"\xff\xd9"


def _idct_1d(v):
    return [
        0.5 * sum(_IDCT_C[u] * v[u] * _IDCT_COS[u][x] for u in range(8))
        for x in range(8)
    ]


def decode_jpeg_gray(payload: bytes):
    """FULL baseline decode of a single-component (grayscale) JPEG:
    marker walk -> DQT/DHT/SOF0/SOS -> Huffman entropy decode (DPCM DC,
    run-length AC, ZRL/EOB) -> dequantize -> de-zigzag -> separable
    float IDCT -> level shift + clamp + round. Returns (width, height,
    pixels row-major list[int]) or None for anything non-baseline,
    multi-component, restart-marker'd, or malformed — callers degrade
    to NULL rows, never raise."""
    try:
        if payload[:2] != b"\xff\xd8":
            return None
        i = 2
        qtables: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        w = h = qid = td = ta = None
        scan_start = None
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:
                break
            (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = payload[i + 4 : i + 2 + ln]
            if marker == 0xDB:
                j = 0
                while j + 65 <= len(body):
                    if body[j] >> 4 != 0:  # 16-bit quant: not baseline-8
                        return None
                    qtables[body[j] & 15] = list(body[j + 1 : j + 65])
                    j += 65
            elif marker == 0xC4:
                j = 0
                while j + 17 <= len(body):
                    cls, tid = body[j] >> 4, body[j] & 15
                    bits = list(body[j + 1 : j + 17])
                    n = sum(bits)
                    vals = list(body[j + 17 : j + 17 + n])
                    huff[(cls, tid)] = {
                        (ln_, code): sym
                        for sym, (code, ln_) in _huff_codes(bits, vals).items()
                    }
                    j += 17 + n
            elif marker == 0xC0:
                prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
                if prec != 8 or ncomp != 1 or body[7] != 0x11:
                    return None
                qid = body[8]
            elif marker in (0xDD,):  # DRI: restart intervals unsupported
                return None
            elif 0xC1 <= marker <= 0xCF and marker != 0xC4:
                return None  # progressive/arithmetic/other frame types
            elif marker == 0xDA:
                if body[0] != 1:
                    return None
                td, ta = body[2] >> 4, body[2] & 15
                scan_start = i + 2 + ln
                break
            i += 2 + ln
        if scan_start is None or w is None or qid is None:
            return None
        q = qtables.get(qid)
        dc_map, ac_map = huff.get((0, td)), huff.get((1, ta))
        if q is None or dc_map is None or ac_map is None:
            return None
        r = _JpegBitReader(payload, scan_start)

        def huff_decode(m):
            code = 0
            for ln_ in range(1, 17):
                code = (code << 1) | r.read_bit()
                if (ln_, code) in m:
                    return m[(ln_, code)]
            raise ValueError("invalid huffman code")

        def extend(v, s):
            return v - (1 << s) + 1 if v < (1 << (s - 1)) else v

        bx, by = (w + 7) // 8, (h + 7) // 8
        pred = 0
        pixels = [0] * (w * h)
        for mcu in range(bx * by):
            zz = [0] * 64
            s = huff_decode(dc_map)
            pred += extend(r.read_bits(s), s) if s else 0
            zz[0] = pred
            k = 1
            while k <= 63:
                rs = huff_decode(ac_map)
                if rs == 0x00:
                    break
                if rs == 0xF0:
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 15
                if k > 63 or s == 0:
                    raise ValueError("ac index overflow")
                zz[k] = extend(r.read_bits(s), s)
                k += 1
            coef = [0.0] * 64
            for k2 in range(64):
                coef[_ZIGZAG[k2]] = zz[k2] * q[k2]
            rows = [_idct_1d(coef[v * 8 : v * 8 + 8]) for v in range(8)]
            cols = [
                _idct_1d([rows[v][x] for v in range(8)]) for x in range(8)
            ]  # cols[x][y]
            mby, mbx = divmod(mcu, bx)
            for y in range(8):
                py = mby * 8 + y
                if py >= h:
                    continue
                base = py * w + mbx * 8
                for x in range(8):
                    if mbx * 8 + x >= w:
                        continue
                    val = int(round(cols[x][y] + 128))
                    pixels[base + x] = 0 if val < 0 else (255 if val > 255 else val)
        return w, h, pixels
    except (ValueError, IndexError, struct.error):
        return None


def synthetic_jpeg_pattern(seed: int, width: int, height: int) -> bytes:
    """Baseline grayscale JPEG whose 8x8 block b (row-major) is the
    CONSTANT value ``(seed * 11 + b * 29) % 256``: with an all-ones
    quant table the quantized DCT is exactly [8*(v-128), 0, ..., 0],
    which entropy-codes losslessly and IDCTs back to v exactly after
    rounding — so a SQL oracle regenerates the decoded pixel stream
    from (seed, width, height) alone. Dimensions must be multiples
    of 8."""
    if width % 8 or height % 8:
        raise ValueError("pattern dimensions must be multiples of 8")
    blocks = []
    for b in range((width // 8) * (height // 8)):
        v = (seed * 11 + b * 29) % 256
        blk = [0] * 64
        blk[0] = 8 * (v - 128)
        blocks.append(blk)
    return encode_jpeg_gray(blocks, width, height)


def jpeg_pattern_media_from_documents(docs: DataFrame) -> DataFrame:
    """Patterned baseline JPEGs (8*(2 + doc_id % 3) wide, 8*(1 +
    doc_id % 2) tall): the corpus for the full-decode JPEG path."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_jpeg_pattern(
                            seed=int(d),
                            width=8 * (2 + int(d) % 3),
                            height=8 * (1 + int(d) % 2),
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "image",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_jpeg_pixel_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """FULL-decode JPEG tier (the baseline-DCT counterpart of
    decode_image_pixel_features): Huffman entropy decode -> dequant ->
    IDCT -> per-image pixel statistics with integer-exact accumulation
    over the rounded pixels. Arrow-batched mapInPandas; non-baseline or
    malformed payloads yield NULL features rather than failing the
    scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            decoded = decode_jpeg_gray(payload)
            if decoded is None:
                return None
            _, _, px = decoded
            n = len(px)
            if n == 0:
                return None
            return (n, round(sum(px) / n, 6), min(px), max(px))

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_pixels": pd.array(out.map(lambda t: t and t[0]), dtype="Int64"),
                    "mean_px": out.map(lambda t: t and t[1]).astype("Float64"),
                    "min_px": pd.array(out.map(lambda t: t and t[2]), dtype="Int64"),
                    "max_px": pd.array(out.map(lambda t: t and t[3]), dtype="Int64"),
                }
            )

    return df.mapInPandas(
        feats,
        schema="media_id long, n_pixels long, mean_px double, min_px long, max_px long",
    )


# --- MJPEG/MP4 video full-decode tier (r7) -----------------------------------
#
# Completes the video story past the header tier: a REAL ISO-BMFF
# container with a full sample table (stsd/stts/stsz/stsc/stco) whose
# mdat holds one baseline JPEG per frame (Motion-JPEG), and a decoder
# that walks moov -> trak -> mdia -> minf -> stbl, slices each sample
# out of the payload by stsz/stco, and runs the baseline JPEG decoder
# on every frame. The constant-block JPEG pattern round-trips
# integer-exactly, so per-video pixel statistics AND the inter-frame
# motion energy replay in SQL from the generative formula.


def synthetic_mjpeg_mp4(
    seed: int, n_frames: int, width: int, height: int, timescale: int = 1000
) -> bytes:
    """A complete MP4 whose track is Motion-JPEG: mdat carries
    ``n_frames`` baseline JPEGs (frame f uses pattern seed
    ``seed * 131 + f * 17``), and the sample table indexes them
    exactly (stsz per-frame sizes, stco absolute offsets, one sample
    per chunk). 40 ms per frame (25 fps) in ``stts``."""
    frames = [
        synthetic_jpeg_pattern(seed * 131 + f * 17, width, height)
        for f in range(n_frames)
    ]
    return _mp4_from_jpeg_frames(frames, width, height, timescale)


def _mp4_from_jpeg_frames(
    frames: list[bytes], width: int, height: int, timescale: int = 1000
) -> bytes:
    """Assemble a complete one-track MJPEG MP4 around pre-encoded JPEG
    frames (shared by the motion-energy and scene-cut synths): full
    sample table, absolute stco offsets, 40 ms/frame."""
    n_frames = len(frames)
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    duration = n_frames * 40 * timescale // 1000

    mvhd_body = (
        struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + _MP4_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2)
    )
    tkhd_body = (
        struct.pack(">I", 0x00000007)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MP4_MATRIX
        + struct.pack(">II", width << 16, height << 16)
    )
    # sample description: 'jpeg' visual entry (layout per ISO 14496-12
    # VisualSampleEntry; codec-private fields zeroed)
    jpeg_entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_idx
        + b"\x00" * 16                                # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)          # reserved + frame_count
        + b"\x00" * 32                                # compressor name
        + struct.pack(">Hh", 24, -1)                  # depth, pre_defined
    )
    stsd = _mp4_box(
        b"stsd", struct.pack(">II", 0, 1) + _mp4_box(b"jpeg", jpeg_entry)
    )
    stts = _mp4_box(
        b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", n_frames, 40 * timescale // 1000)
    )
    stsc = _mp4_box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 1, 1))
    stsz = _mp4_box(
        b"stsz",
        struct.pack(">III", 0, 0, n_frames)
        + b"".join(struct.pack(">I", len(fr)) for fr in frames),
    )
    # stco needs absolute mdat payload offsets: mdat follows ftyp+moov,
    # so build moov with a placeholder, measure, then rebuild
    def build_moov(offsets):
        stco = _mp4_box(
            b"stco",
            struct.pack(">II", 0, len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", minf)
        trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd_body) + mdia)
        return _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd_body) + trak)

    placeholder = build_moov([0] * n_frames)
    base = len(ftyp) + len(placeholder) + 8  # + mdat header
    offsets = []
    pos = base
    for fr in frames:
        offsets.append(pos)
        pos += len(fr)
    moov = build_moov(offsets)
    assert len(moov) == len(placeholder)
    mdat = _mp4_box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat


def decode_mjpeg_frames(payload: bytes):
    """FULL video decode: walk moov -> trak -> mdia -> minf -> stbl,
    read the sample table (stsz per-sample sizes + stco chunk offsets,
    requiring the one-sample-per-chunk layout the builder and common
    MJPEG muxers emit), slice each sample and baseline-JPEG-decode it.
    Returns a list of (width, height, pixels) per frame, or None for
    non-MP4 / unsupported table shapes / any undecodable frame."""
    try:
        if len(payload) < 12 or payload[4:8] != b"ftyp":
            return None
        sizes = offsets = None
        for typ, bs, be in _walk_boxes(payload, 0, len(payload)):
            if typ != b"moov":
                continue
            for ctyp, cs, ce in _walk_boxes(payload, bs, be):
                if ctyp != b"trak":
                    continue
                for t2, s2, e2 in _walk_boxes(payload, cs, ce):
                    if t2 != b"mdia":
                        continue
                    for t3, s3, e3 in _walk_boxes(payload, s2, e2):
                        if t3 != b"minf":
                            continue
                        for t4, s4, e4 in _walk_boxes(payload, s3, e3):
                            if t4 != b"stbl":
                                continue
                            for t5, s5, e5 in _walk_boxes(payload, s4, e4):
                                if t5 == b"stsz" and e5 - s5 >= 12:
                                    fixed, n = struct.unpack(
                                        ">II", payload[s5 + 4 : s5 + 12]
                                    )
                                    if fixed:
                                        sizes = [fixed] * n
                                    else:
                                        sizes = list(
                                            struct.unpack(
                                                f">{n}I",
                                                payload[s5 + 12 : s5 + 12 + 4 * n],
                                            )
                                        )
                                elif t5 == b"stco" and e5 - s5 >= 8:
                                    (n,) = struct.unpack(
                                        ">I", payload[s5 + 4 : s5 + 8]
                                    )
                                    offsets = list(
                                        struct.unpack(
                                            f">{n}I",
                                            payload[s5 + 8 : s5 + 8 + 4 * n],
                                        )
                                    )
        if not sizes or not offsets or len(sizes) != len(offsets):
            return None
        frames = []
        for off, sz in zip(offsets, sizes):
            decoded = decode_jpeg_gray(payload[off : off + sz])
            if decoded is None:
                return None
            frames.append(decoded)
        return frames
    except (struct.error, IndexError, ValueError):
        return None


def video_pattern_media_from_documents(docs: DataFrame) -> DataFrame:
    """Patterned MJPEG videos (16x8 frames, 2 + doc_id % 4 frames):
    the corpus for the full-decode video feature path."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_mjpeg_mp4(
                            seed=int(d), n_frames=2 + int(d) % 4, width=16, height=8
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "video",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_video_frame_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """FULL-decode video tier: sample-table walk -> per-frame baseline
    JPEG decode -> per-video statistics with integer-exact
    accumulation: pixel sum/min/max across all frames, and MOTION
    energy = the summed |pixel difference| between consecutive frames
    (the temporal signal a frame-sampling pipeline thresholds on).
    Means are single 6dp-rounded divisions of exact integer sums.
    Malformed containers or any undecodable frame yield NULL features
    rather than failing the scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            frames = decode_mjpeg_frames(payload)
            if not frames:
                return None
            n_px = sum(len(px) for _, _, px in frames)
            if n_px == 0:
                return None
            total = sum(sum(px) for _, _, px in frames)
            mn = min(min(px) for _, _, px in frames)
            mx = max(max(px) for _, _, px in frames)
            motion = 0
            n_diff_px = 0
            for (wa, ha, pa), (wb, hb, pb) in zip(frames, frames[1:]):
                if (wa, ha) != (wb, hb):
                    return None
                motion += sum(abs(x - y) for x, y in zip(pa, pb))
                n_diff_px += len(pa)
            return (
                len(frames),
                n_px,
                round(total / n_px, 6),
                mn,
                mx,
                motion,
                round(motion / n_diff_px, 6) if n_diff_px else None,
            )

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pd.array(out.map(lambda t: t and t[0]), dtype="Int32"),
                    "n_pixels": pd.array(out.map(lambda t: t and t[1]), dtype="Int64"),
                    "mean_px": out.map(lambda t: t and t[2]).astype("Float64"),
                    "min_px": pd.array(out.map(lambda t: t and t[3]), dtype="Int64"),
                    "max_px": pd.array(out.map(lambda t: t and t[4]), dtype="Int64"),
                    "motion_energy": pd.array(
                        out.map(lambda t: t and t[5]), dtype="Int64"
                    ),
                    "mean_abs_frame_diff": out.map(
                        lambda t: t and t[6]
                    ).astype("Float64"),
                }
            )

    return df.mapInPandas(
        feats,
        schema=(
            "media_id long, n_frames int, n_pixels long, mean_px double, "
            "min_px long, max_px long, motion_energy long, "
            "mean_abs_frame_diff double"
        ),
    )


def synthetic_png_family(fam: int, jitter: int) -> bytes:
    """Planted near-duplicate PNG: pixels derive from the FAMILY (fam),
    not the document — pixel k = (k*k*(2*fam + 3) + 5*k +
    jitter*(k % 7 == 0)) % 256 on a (9 + fam % 8) x (8 + fam % 5)
    canvas (always >= the 9x8 dHash sample grid). The QUADRATIC term
    keyed by family scrambles gradient signs differently per family —
    a linear gradient makes every family's dHash near-equal because
    constant offsets cancel in comparisons. jitter=0 members
    are byte-identical within a family; jitter>0 members perturb every
    7th pixel by a small constant — perceptually near-identical, so a
    gradient hash lands within a few bits (the oracle regenerates the
    exact stream from (fam, jitter))."""
    width, height = 9 + fam % 8, 8 + fam % 5
    rows = []
    k = 0
    for _ in range(height):
        row = bytearray([0])
        for _ in range(width):
            row.append(
                (k * k * (2 * fam + 3) + 5 * k + (jitter if k % 7 == 0 else 0))
                % 256
            )
            k += 1
        rows.append(bytes(row))
    raw = b"".join(rows)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def image_family_media_from_documents(
    docs: DataFrame, n_families: int = 16, n_jitters: int = 4
) -> DataFrame:
    """The planted near-dup image corpus for the perceptual-hash dedup
    path: fam = doc_id % n_families, jitter = (doc_id / n_families) %
    n_jitters — every family contains exact duplicates (same jitter)
    and near-duplicates (different jitter)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_png_family(
                            fam=int(d) % n_families,
                            jitter=(int(d) // n_families) % n_jitters,
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "image",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def dhash_bits_from_pixels(px: list, w: int, h: int) -> int:
    """64-bit difference hash (dHash) from a row-major 8-bit grayscale
    pixel list: nearest-neighbor sample a 8-row x 9-column grid —
    sample(r, c) = px[floor(r*h/8)*w + floor(c*w/9)] — and set bit
    (r*8 + c) iff sample(r, c) < sample(r, c+1). Integer-exact (no
    interpolation, no float), so a SQL oracle replays every bit from
    the regenerated pixel stream. Shared by the decoder and tests."""
    bits = 0
    for r in range(8):
        ro = (r * h // 8) * w
        for c in range(8):
            a = px[ro + (c * w // 9)]
            b = px[ro + ((c + 1) * w // 9)]
            if a < b:
                bits |= 1 << (r * 8 + c)
    return bits


def decode_image_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """FULL-decode perceptual-hash tier (staged r12, registered r14): PNG
    chunk walk -> zlib inflate -> unfilter -> 64-bit dHash
    (:func:`dhash_bits_from_pixels`), emitted as two uint32-range longs
    (w0 = bits 0..31, w1 = bits 32..63) so both engines XOR and
    popcount without touching a sign bit. Images smaller than the 8x9
    sample grid, non-grayscale-8, or corrupt payloads yield NULL words
    (the scan never fails). Arrow-batched mapInPandas; one row out per
    image — the hash frame downstream dedup joins is media-count-sized,
    never pixel-sized."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            decoded = _png_gray8_pixels(payload)
            if decoded is None:
                return None
            w, h, px = decoded
            if w < 9 or h < 8:
                return None  # smaller than the 9x8 sample grid
            bits64 = dhash_bits_from_pixels(px, w, h)
            return (bits64 & 0xFFFFFFFF, bits64 >> 32)

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash_w0": pd.array(out.map(lambda t: t and t[0]), dtype="Int64"),
                    "dhash_w1": pd.array(out.map(lambda t: t and t[1]), dtype="Int64"),
                }
            )

    return df.mapInPandas(
        feats, schema="media_id long, dhash_w0 long, dhash_w1 long"
    )


def audio_family_media_from_documents(
    docs: DataFrame, n_families: int = 16, n_jitters: int = 4, frame: int = 64
) -> DataFrame:
    """The planted near-dup AUDIO corpus for the fingerprint dedup path
    (staged r14) — the waveform counterpart of
    :func:`image_family_media_from_documents`: fam = doc_id %
    n_families, jitter = (doc_id / n_families) % n_jitters, sample
    i = ((i*i*(2*fam+3) + 5*i + jit*(i%7==0)) % 4001) - 2000 over
    ``frame * (65 + fam % 4)`` samples (>= the 65 frames the 64-bit
    fingerprint needs). Same jitter -> byte-identical clips (exact
    dups); different jitter -> tiny per-sample perturbations (near
    dups); different family -> unrelated energy contours."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def wav(doc_id: int) -> bytes:
            fam = doc_id % n_families
            jit = (doc_id // n_families) % n_jitters
            n = frame * (65 + fam % 4)
            # vectorized, int64 throughout — identical arithmetic to
            # the documented per-sample formula (max intermediate
            # ~n^2*35 << 2^63)
            i = np.arange(n, dtype=np.int64)
            samples = (
                (i * i * (2 * fam + 3) + 5 * i + jit * (i % 7 == 0))
                % 4001
            ) - 2000
            data = samples.astype("<i2").tobytes()
            fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
            body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            body += b"data" + struct.pack("<I", len(data)) + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [wav(int(d)) for d in pdf["doc_id"]],
                    "media_type": "audio",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def fingerprint_bits_from_samples(xs, frame: int = 64) -> int:
    """64-bit energy-contour audio fingerprint from int16 samples:
    frame f's energy e_f = sum(|x|) over samples [f*frame, (f+1)*frame)
    — EXACT integer arithmetic — and bit f (0..63) is set iff
    e_{f+1} > e_f. The audio analogue of the image dHash's gradient
    signature: robust to uniform gain-ish perturbations, integer-exact
    so a SQL oracle replays every bit from the regenerated waveform.
    Requires >= 65 full frames. Shared by the decoder and tests."""
    es = [
        sum(abs(x) for x in xs[f * frame : (f + 1) * frame])
        for f in range(65)
    ]
    bits = 0
    for f in range(64):
        if es[f + 1] > es[f]:
            bits |= 1 << f
    return bits


def decode_audio_fingerprint(
    df: DataFrame, payload_col: str = "payload", frame: int = 64
) -> DataFrame:
    """FULL-decode audio fingerprint tier (staged r14): RIFF chunk walk
    -> int16 PCM -> 64-bit energy-contour fingerprint
    (:func:`fingerprint_bits_from_samples`), emitted as two
    uint32-range longs (fp_w0 = bits 0..31, fp_w1 = bits 32..63) so
    the generic banded-Hamming pair join
    (operators/dedup.dhash_neardup_pairs) XORs and popcounts without
    touching a sign bit. Clips shorter than 65 frames, non-PCM, or
    corrupt payloads yield NULL words (the scan never fails).
    Arrow-batched mapInPandas; one row out per clip."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(payload: bytes):
            meta = parse_audio_meta(payload)
            if not meta or meta[1] != 1 or meta[3] != 16 or meta[4] == 0:
                return None
            n = meta[4]
            if n < 65 * frame:
                return None
            i = wav_data_offset(payload)
            if i is None:
                return None
            raw = payload[i : i + 2 * n]
            if len(raw) < 2 * n:
                return None
            # vectorized frame energies — exact int64 sums of |int16|,
            # bit-identical to fingerprint_bits_from_samples (the
            # pure-Python reference the tests replay)
            xs = np.frombuffer(raw, dtype="<i2", count=65 * frame)
            es = (
                np.abs(xs.astype(np.int64)).reshape(65, frame).sum(axis=1)
            )
            up = es[1:] > es[:-1]
            # exact Python-int bit assembly (1 << 63 overflows int64)
            bits64 = 0
            for f in np.nonzero(up)[0]:
                bits64 |= 1 << int(f)
            return (bits64 & 0xFFFFFFFF, bits64 >> 32)

        for pdf in batches:
            out = pdf[payload_col].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fp_w0": pd.array(
                        out.map(lambda t: None if t is None else t[0]),
                        dtype="Int64",
                    ),
                    "fp_w1": pd.array(
                        out.map(lambda t: None if t is None else t[1]),
                        dtype="Int64",
                    ),
                }
            )

    return df.mapInPandas(
        feats, schema="media_id long, fp_w0 long, fp_w1 long"
    )


# --- voice-activity segmentation tier (staged r14 wave 2, register r16) -------


def synthetic_wav_vad(seed: int, n_samples: int, frame: int = 8) -> bytes:
    """Mono 16-bit PCM WAV with a deterministic GATED waveform for the
    VAD tier: per ``frame``-sample block b, the block is 'speech'
    (full-amplitude pattern sample ((seed*31 + i*17) % 4001) - 2000)
    when (seed*13 + b*7) % 3 != 0, else 'silence' (the same pattern
    squeezed to ((seed*31 + i*17) % 64) - 32, |x| <= 32). Every modulo
    operand is nonnegative, so Python, numpy, and SQL agree exactly and
    an oracle can regenerate the waveform and replay segmentation."""
    xs = []
    for i in range(n_samples):
        if (seed * 13 + (i // frame) * 7) % 3 != 0:
            xs.append(((seed * 31 + i * 17) % 4001) - 2000)
        else:
            xs.append(((seed * 31 + i * 17) % 64) - 32)
    data = struct.pack(f"<{n_samples}h", *xs)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def vad_media_from_documents(docs: DataFrame) -> DataFrame:
    """Gated-waveform WAVs (64 + (doc_id % 8) * 8 samples — always a
    whole number of 8-sample frames): the corpus for the VAD tier."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_wav_vad(
                            seed=int(d), n_samples=64 + int(d) % 8 * 8
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "audio",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_audio_frame_energy(
    df: DataFrame, payload_col: str = "payload", frame: int = 8
) -> DataFrame:
    """Frame-energy decode for the VAD tier: RIFF chunk walk -> int16
    PCM -> per-frame exact integer energy (sum x^2 over each complete
    ``frame``-sample block; a trailing partial block is DROPPED, so the
    framing is unambiguous on both engines). Energies of int16 samples
    are bounded by frame * 2^30 — exact in int64, no float anywhere.
    Arrow-batched mapInPandas; unsupported shapes (non-PCM, not 16-bit
    mono, no complete frame) contribute no rows rather than failing
    the scan."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ids: list[int] = []
        fidx: list[int] = []
        energy: list[int] = []

        def one(media_id: int, payload: bytes) -> None:
            meta = parse_audio_meta(payload)
            if not meta or meta[1] != 1 or meta[3] != 16 or meta[4] == 0:
                return
            n = meta[4]
            i = wav_data_offset(payload)
            if i is None:
                return
            raw = payload[i : i + 2 * n]
            if len(raw) < 2 * n:
                return
            xs = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            n_frames = len(xs) // frame
            if n_frames == 0:
                return
            sq = (xs[: n_frames * frame] ** 2).reshape(n_frames, frame)
            e = sq.sum(axis=1)
            ids.extend([media_id] * n_frames)
            fidx.extend(range(n_frames))
            energy.extend(int(v) for v in e)

        for pdf in batches:
            ids.clear(), fidx.clear(), energy.clear()
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                one(int(mid), payload)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(fidx, dtype="Int64"),
                    "energy": pd.array(energy, dtype="Int64"),
                }
            )

    return df.mapInPandas(
        feats, schema="media_id long, frame_idx long, energy long"
    )


def vad_segments(frames: DataFrame, threshold: int = 16384) -> DataFrame:
    """Energy-threshold voice-activity segmentation over a frame-energy
    frame (staged r14 wave 2): frames with energy > ``threshold`` are
    active; maximal runs of consecutive active frames become segments
    (the gaps-and-islands construction — frame_idx minus the active-
    only row_number is constant within a run). This is the standard
    pre-ASR segmentation pass a speech corpus pipeline runs to cut raw
    audio into utterances before transcription or dedup.

    Scale shape: the window partitions by media_id (per-clip, never
    global), the rollup is keyed by (media_id, run) — at 100 TB every
    stage is partition-local after one clip-keyed shuffle. All segment
    arithmetic is exact integers; mean_energy is the single 6dp-rounded
    division. Returns (media_id, seg_start_frame, n_frames,
    total_energy, mean_energy), one row per segment."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    act = frames.filter(F.col("energy") > threshold).select(
        "media_id",
        "frame_idx",
        "energy",
        (F.col("frame_idx") - F.row_number().over(w)).alias("_grp"),
    )
    return (
        act.groupBy("media_id", "_grp")
        .agg(
            F.min("frame_idx").alias("seg_start_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("energy").cast("long").alias("total_energy"),
        )
        .select(
            "media_id",
            "seg_start_frame",
            "n_frames",
            "total_energy",
            F.round(
                F.col("total_energy") * F.lit(1.0) / F.col("n_frames"), 6
            ).alias("mean_energy"),
        )
    )


def audio_vad_segments(media: DataFrame, frame: int = 8, threshold: int = 16384) -> DataFrame:
    """The composed VAD tier: decode -> frame energies -> segments."""
    return vad_segments(
        decode_audio_frame_energy(media, frame=frame), threshold=threshold
    )


# --- video scene-cut segmentation tier (staged r14 wave 3, register r16+) -----


def synthetic_scene_mp4(
    seed: int, n_frames: int, width: int = 16, height: int = 8,
    scene_len: int = 3,
) -> bytes:
    """Motion-JPEG MP4 with SCENE structure: frame f uses the constant-
    block pattern seed ``seed * 131 + (f // scene_len) * 37`` — frames
    inside a scene are pixel-identical (inter-frame diff 0), frames
    across a scene boundary differ (the cut signal). Same integer-exact
    JPEG round-trip as :func:`synthetic_mjpeg_mp4`, so a SQL oracle
    regenerates every decoded pixel from (seed, f//scene_len, block)."""
    frames = [
        synthetic_jpeg_pattern(
            seed * 131 + (f // scene_len) * 37, width, height
        )
        for f in range(n_frames)
    ]
    return _mp4_from_jpeg_frames(frames, width, height)


def scene_media_from_documents(docs: DataFrame) -> DataFrame:
    """Scene-structured MJPEG videos (16x8, 6 + (doc_id % 2) * 3 frames
    = 2-3 scenes of 3): the corpus for the scene-cut path."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        synthetic_scene_mp4(
                            seed=int(d), n_frames=6 + int(d) % 2 * 3
                        )
                        for d in pdf["doc_id"]
                    ],
                    "media_type": "video",
                }
            )

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary, media_type string"
    )


def decode_video_frame_diffs(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Frame-grain decode for the scene-cut tier: sample-table walk ->
    per-frame baseline JPEG decode -> one row per frame with the exact
    integer |pixel diff| against the PREVIOUS frame (NULL for frame 0).
    Arrow-batched mapInPandas; malformed containers, undecodable
    frames, or mid-stream dimension changes contribute no rows."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list[int] = []
        fidx: list[int] = []
        diffs: list[int | None] = []

        def one(media_id: int, payload: bytes) -> None:
            frames = decode_mjpeg_frames(payload)
            if not frames:
                return
            dims = {(w, h) for w, h, _ in frames}
            if len(dims) != 1:
                return
            prev = None
            for f, (_, _, px) in enumerate(frames):
                ids.append(media_id)
                fidx.append(f)
                diffs.append(
                    None
                    if prev is None
                    else sum(abs(x - y) for x, y in zip(px, prev))
                )
                prev = px

        for pdf in batches:
            ids.clear(), fidx.clear(), diffs.clear()
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                one(int(mid), payload)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(fidx, dtype="Int64"),
                    "diff_energy": pd.array(diffs, dtype="Int64"),
                }
            )

    return df.mapInPandas(
        feats, schema="media_id long, frame_idx long, diff_energy long"
    )


def video_scene_cuts(
    media: DataFrame, threshold: int = 0
) -> DataFrame:
    """Scene-cut segmentation (staged r14 wave 3): a CUT opens at frame
    0 and at every frame whose decoded |pixel diff| vs the previous
    frame exceeds ``threshold``; the shot id is the running cut count
    (one partitioned window), shots roll up by (clip, shot). This is
    the frame-sampling pass a video corpus pipeline runs before
    captioning/embedding — sample one frame per SHOT instead of per
    fixed stride.

    Scale shape mirrors audio VAD: clip-partitioned window + keyed
    rollup, the decode is the single Arrow stage. Exact integers
    throughout — no float column anywhere (frame 0's NULL diff opens
    shot 0 without entering any arithmetic). Returns (media_id,
    shot_idx, start_frame, n_frames, cut_energy) — cut_energy = the
    diff that OPENED the shot (NULL for shot 0)."""
    from pyspark.sql import Window

    frames = decode_video_frame_diffs(media)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cut = (F.col("frame_idx") == 0) | (F.col("diff_energy") > threshold)
    marked = frames.select(
        "media_id",
        "frame_idx",
        "diff_energy",
        F.sum(cut.cast("long")).over(w).alias("_shot"),
        cut.alias("_is_cut"),
    )
    return (
        marked.groupBy("media_id", "_shot")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.max(
                F.when(F.col("_is_cut"), F.col("diff_energy"))
            ).alias("cut_energy"),
        )
        .select(
            "media_id",
            (F.col("_shot") - 1).cast("long").alias("shot_idx"),
            "start_frame",
            "n_frames",
            F.col("cut_energy").cast("long").alias("cut_energy"),
        )
    )
