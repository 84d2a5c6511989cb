"""HDF5 archival source (SURVEY.md §2.1 S1).

The reference's batch inputs are per-machine/operation HDF5 archives
named like ``M01_Aug_2019_OP00_000.h5`` (machines M01/M02, operations
OP00-OP14; reference/TechSpikeDataPipeline.md:6-8,28-33,87-94), streamed
as triaxial vibration sample batches.

Spark-first mapping: HDF5 is not splittable and has no Spark datasource,
so the idiomatic shape is ``spark.read.format("binaryFile")`` (one row
per file: path, modificationTime, length, content) + an Arrow-batched
``mapInPandas`` decode that fans each archive out to record rows. File
parallelism = partition parallelism, which matches how these archives
arrive (many small per-operation files); a single giant archive would
need a driver-side manifest split instead — documented, not needed for
the reference's layout.

Decode tiers (r8, widened r10-r12): archives in the h5py formats —
classic (superblock v0, v1 headers, symbol-table groups),
``libver='latest'`` (superblock v2/v3, checksummed OHDR v2 headers,
compact link messages), gzip-compressed CHUNKED layouts (B-tree v1
chunk index + deflate/shuffle filters, libhdf5's default compressed
shape; r11), and DENSE link storage (fractal heap + v2 B-tree name
index, the past-8-links group layout; r12) — decode NATIVELY via
``sources/hdf5_native.py``, pure Python from the public HDF5
file-format spec, no h5py needed. Layouts outside that subset
(exotic filters like szip/lzf, indirect-rooted/filtered fractal heaps
and depth>0 B-trees — dense groups past ~180 links — non-hard
links, non-native datatypes; the full matrix is pinned by
tests/test_hdf5.py::test_format_matrix) route to the import-gated
h5py path, which raises with the dependency name here (h5py is absent
from this environment). Payloads without the HDF5
signature fall back to the deterministic hash-keyed fake (the synthetic
test fixtures; same contract as sources/multimodal.py). The Spark-side
plumbing — binaryFile ingestion, filename metadata parsing, Arrow
batching, the record schema ``enrich_records`` consumes — is shared by
all three tiers and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - h5py absent in this environment
    import h5py  # noqa: F401

    H5_AVAILABLE = True
except ImportError:
    H5_AVAILABLE = False

# reference file naming: M01_Aug_2019_OP00_000.h5
MACHINE_RE = r"([Mm]\d+)_"
OPERATION_RE = r"(OP\d+)"

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("machine", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("vibration_x_batch", T.ArrayType(T.DoubleType())),
        T.StructField("vibration_y_batch", T.ArrayType(T.DoubleType())),
        T.StructField("vibration_z_batch", T.ArrayType(T.DoubleType())),
        T.StructField("status_code", T.StringType()),
    ]
)


def hdf5_files(spark: SparkSession, path: str, pattern: str = "*.h5") -> DataFrame:
    """One row per archive via the binaryFile source, with machine and
    operation parsed from the reference's file naming. Metadata-only
    consumers (counts, layout audits) should select path/length and let
    Catalyst prune `content` out of the scan."""
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", pattern).load(path)
    )
    name = F.element_at(F.split("path", "/"), -1)
    return files.select(
        "path",
        "length",
        "modificationTime",
        "content",
        F.upper(F.regexp_extract(name, MACHINE_RE, 1)).alias("machine"),
        F.regexp_extract(name, OPERATION_RE, 1).alias("operation"),
    )


def _fake_decode_h5(content: bytes, samples_per_record: int) -> list[dict]:
    """Deterministic stand-in for the h5py read: a payload-hash-seeded
    batch of records shaped exactly like the real decode (x/y/z sample
    arrays per record). Replace with h5py when available."""
    h = hashlib.sha256(content).digest()
    n_records = 1 + h[0] % 4
    out = []
    for r in range(n_records):
        base = [
            ((h[(r * 7 + i) % 32] - 128) + (i % samples_per_record))
            for i in range(samples_per_record)
        ]
        out.append(
            {
                "record_idx": r,
                "vibration_x_batch": [float(v) for v in base],
                "vibration_y_batch": [float(v + 1) for v in base],
                "vibration_z_batch": [float(2 * v) for v in base],
                "status_code": "Good",
            }
        )
    return out


def _native_decode_h5(content: bytes, samples_per_record: int) -> list[dict]:
    """Pure-Python decode of classic-format archives (see
    ``sources/hdf5_native.py`` for the exact subset): the three
    ``vibration_{x,y,z}`` datasets batch into ``samples_per_record``-
    sized records, identical framing to the h5py path."""
    from datapipeline_spike_spark.sources.hdf5_native import read_h5_datasets

    ds = read_h5_datasets(content)
    try:
        axes = {a: ds[f"vibration_{a}"] for a in ("x", "y", "z")}
    except KeyError as missing:
        from datapipeline_spike_spark.sources.hdf5_native import Hdf5FormatError

        raise Hdf5FormatError(
            f"archive lacks dataset {missing} (expected vibration_x/y/z)"
        ) from None
    n = min(len(v) for v in axes.values())
    out = []
    for r, start in enumerate(range(0, n, samples_per_record)):
        end = min(start + samples_per_record, n)
        out.append(
            {
                "record_idx": r,
                "vibration_x_batch": [float(v) for v in axes["x"][start:end]],
                "vibration_y_batch": [float(v) for v in axes["y"][start:end]],
                "vibration_z_batch": [float(v) for v in axes["z"][start:end]],
                "status_code": "Good",
            }
        )
    return out


def _real_decode_h5(content: bytes, samples_per_record: int) -> list[dict]:
    """h5py decode: datasets ``vibration_x/y/z`` chunked into
    ``samples_per_record``-sized batches (the reference's 10-points ->
    1-record framing, TechSpikeDataPipeline.md:50-53)."""
    if not H5_AVAILABLE:
        raise NotImplementedError(
            "h5py is not installed in this environment; install h5py or pass "
            "use_real_decoder=False for the deterministic fake"
        )
    import io

    import h5py as _h5

    with _h5.File(io.BytesIO(content), "r") as f:  # pragma: no cover
        axes = {a: f[f"vibration_{a}"][()] for a in ("x", "y", "z")}
        n = min(len(v) for v in axes.values())
        out = []
        for r, start in enumerate(range(0, n, samples_per_record)):
            end = min(start + samples_per_record, n)
            out.append(
                {
                    "record_idx": r,
                    "vibration_x_batch": [float(v) for v in axes["x"][start:end]],
                    "vibration_y_batch": [float(v) for v in axes["y"][start:end]],
                    "vibration_z_batch": [float(v) for v in axes["z"][start:end]],
                    "status_code": "Good",
                }
            )
        return out


def read_vibration_records(
    files: DataFrame,
    samples_per_record: int = 10,
    use_real_decoder: bool | None = None,
) -> DataFrame:
    """Archive rows -> one row per vibration record (the shape
    ``pipeline.enrich_records`` consumes, minus the event-time column a
    live stream would add). 1-to-many mapInPandas: each file fans out to
    its records inside the Arrow batch; no driver involvement, no
    collect, parallelism = input file partitions.

    Tier selection (``use_real_decoder=None``, the default): a payload
    carrying the HDF5 signature decodes natively when it is in the
    classic subset, escalates to h5py when it is not and h5py exists,
    and otherwise degrades to an empty record set for that archive (a
    single odd file must never abort the scan); a payload WITHOUT the
    signature uses the deterministic fake (synthetic fixtures). Explicit
    ``use_real_decoder=True`` forces the h5py path (the gate test),
    ``False`` forces the fake."""
    from datapipeline_spike_spark.sources.hdf5_native import (
        SIGNATURE,
        Hdf5FormatError,
    )

    if use_real_decoder is None:

        def decode(content: bytes, spr: int) -> list[dict]:
            if content[: len(SIGNATURE)] != SIGNATURE:
                return _fake_decode_h5(content, spr)
            try:
                return _native_decode_h5(content, spr)
            except Hdf5FormatError:
                # out-of-subset layout or missing datasets: escalate to
                # h5py when it exists; without it, degrade to an EMPTY
                # record set for THIS archive (the multimodal NULL-row
                # convention) — one odd file must never abort the scan
                if H5_AVAILABLE:
                    return _real_decode_h5(content, spr)
                return []

    else:
        decode = _real_decode_h5 if use_real_decoder else _fake_decode_h5

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                for rec in decode(bytes(r.content), samples_per_record):
                    rows.append(
                        {
                            "path": r.path,
                            "machine": r.machine,
                            "operation": r.operation,
                            **rec,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA.fields])

    return files.mapInPandas(batches, schema=RECORD_SCHEMA)
