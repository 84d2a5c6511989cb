"""Load-boundary schema-drift tolerance (round-3 postmortem).

The driver regenerates testdata between rounds and has already shipped
``events.ts`` in two different physical encodings: TIMESTAMP(NANOS)
(reads as a long under nanosAsLong) and plain ``timestamp[us]`` with no
timezone (reads as TIMESTAMP_NTZ, which ``withWatermark`` and
``cast(long)`` reject — the round-3 breakage). ``plans.registry.load``
owns the coercion; these tests feed it deliberately drifted parquet and
assert every downstream contract still holds.
"""

from __future__ import annotations

import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_spike_spark.operators.sessions import sessionize
from datapipeline_spike_spark.plans.registry import load

ROWS = {
    "event_id": [1, 2, 3, 4],
    # 30-min session gap: events 1-2 together, 3 after a 2h gap, 4 close
    "ts": [1_700_000_000_000_000, 1_700_000_060_000_000,
           1_700_007_200_000_000, 1_700_007_260_000_000],  # micros
    "user_id": [7, 7, 7, 7],
    "event_type": ["a", "a", "b", "b"],
    "value": [1.0, 2.0, 3.0, None],
    "props": ['{"k":1}'] * 4,
}


def _write_events(ts_type: pa.DataType, ts_values) -> str:
    d = tempfile.mkdtemp(prefix="drift_")
    tbl = pa.table(
        {
            "event_id": pa.array(ROWS["event_id"], pa.int64()),
            "ts": pa.array(ts_values, ts_type),
            "user_id": pa.array(ROWS["user_id"], pa.int64()),
            "event_type": pa.array(ROWS["event_type"], pa.string()),
            "value": pa.array(ROWS["value"], pa.float64()),
            "props": pa.array(ROWS["props"], pa.string()),
        }
    )
    pq.write_table(tbl, f"{d}/events.parquet")
    return d


@pytest.fixture(
    params=["ntz_us", "ntz_ms", "nanos"],
    ids=["timestamp_ntz_us", "timestamp_ntz_ms", "timestamp_nanos"],
)
def drifted_dir(request):
    if request.param == "ntz_us":
        d = _write_events(pa.timestamp("us"), ROWS["ts"])
    elif request.param == "ntz_ms":
        d = _write_events(pa.timestamp("ms"), [v // 1000 for v in ROWS["ts"]])
    else:  # TIMESTAMP(NANOS) — reads as long under nanosAsLong
        d = _write_events(pa.timestamp("ns"), [v * 1000 for v in ROWS["ts"]])
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_load_normalizes_event_time_to_timestamp(spark, drifted_dir):
    df = load(spark, drifted_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # wall-clock values survive the coercion exactly (UTC session tz)
    got = sorted(r["ts"].strftime("%Y-%m-%d %H:%M:%S") for r in df.select("ts").collect())
    assert got[0] == "2023-11-14 22:13:20"
    assert len(got) == 4


def test_sessionize_runs_on_drifted_events(spark, drifted_dir):
    df = load(spark, drifted_dir, "events")
    out = sessionize(df, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
    seqs = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert seqs == {1: 1, 2: 1, 3: 2, 4: 2}  # the 2h gap opens session 2


def test_watermark_accepts_loaded_ts(spark, drifted_dir):
    """withWatermark raises on TIMESTAMP_NTZ — the exact round-3 failure
    mode for 7 streaming tests. After load(), it must be accepted."""
    df = load(spark, drifted_dir, "events")
    # batch frames accept withWatermark as a no-op; the call itself is
    # the NTZ type check that round 3 failed
    df.withWatermark("ts", "2 minutes").groupBy(
        F.window("ts", "1 hour")
    ).count().collect()


def test_sessionize_is_ntz_tolerant_without_load(spark):
    """Defense in depth: even a frame that BYPASSES load() (raw NTZ
    read) must sessionize — the operator casts through timestamp."""
    d = _write_events(pa.timestamp("us"), ROWS["ts"])
    try:
        raw = spark.read.parquet(f"{d}/events.parquet")
        assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)
        out = sessionize(raw, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        assert out.count() == 4
    finally:
        shutil.rmtree(d, ignore_errors=True)
