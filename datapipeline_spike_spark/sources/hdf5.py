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

The decode itself is import-gated: ``h5py`` is absent from this
environment, so the real path raises with the dependency name and tests
run a deterministic fake keyed on the payload hash (same contract as
sources/multimodal.py). Everything else — binaryFile ingestion, filename
metadata parsing, Arrow batching, the record schema ``enrich_records``
consumes — is real and tested end-to-end.
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
    collect, parallelism = input file partitions."""
    real = H5_AVAILABLE if use_real_decoder is None else use_real_decoder
    decode = _real_decode_h5 if real else _fake_decode_h5

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
