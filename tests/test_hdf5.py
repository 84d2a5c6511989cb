"""S1 HDF5 archival source: binaryFile ingestion + filename metadata +
Arrow-batched decode fan-out (fake decoder — h5py absent here; the
Spark-side plumbing is the real contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.sources.hdf5 import (
    H5_AVAILABLE,
    hdf5_files,
    read_vibration_records,
)


@pytest.fixture(scope="module")
def h5_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("h5archives")
    for name, payload in [
        ("M01_Aug_2019_OP00_000.h5", b"archive-one-payload" * 50),
        ("M01_Aug_2019_OP07_000.h5", b"archive-two-payload" * 80),
        ("M02_Aug_2019_OP14_000.h5", b"archive-three" * 120),
        ("notes.txt", b"not an archive"),
    ]:
        (d / name).write_bytes(payload)
    return str(d)


def test_binaryfile_source_parses_reference_naming(spark, h5_dir):
    files = hdf5_files(spark, h5_dir)
    rows = {r["machine"]: r for r in files.collect()}
    assert set(rows) == {"M01", "M02"}  # .txt filtered by the glob
    assert files.count() == 3
    ops = {r["operation"] for r in files.collect()}
    assert ops == {"OP00", "OP07", "OP14"}
    r = rows["M02"]
    assert r["length"] == 13 * 120 and r["content"][:7] == b"archive"


def test_decode_fans_out_records_with_batch_arrays(spark, h5_dir):
    recs = read_vibration_records(hdf5_files(spark, h5_dir), use_real_decoder=False)
    rows = recs.collect()
    assert len(rows) >= 3  # >= 1 record per archive
    per_file = {}
    for r in rows:
        per_file.setdefault(r["path"], []).append(r)
        assert len(r["vibration_x_batch"]) == 10
        # the synthesis transforms mirror the reference's triaxial shape
        assert r["vibration_y_batch"][0] == r["vibration_x_batch"][0] + 1
        assert r["vibration_z_batch"][3] == 2 * r["vibration_x_batch"][3]
        assert r["status_code"] == "Good"
    for path, rs in per_file.items():
        assert [x["record_idx"] for x in sorted(rs, key=lambda x: x["record_idx"])] == list(
            range(len(rs))
        )
    # deterministic: same payload -> same records
    again = read_vibration_records(hdf5_files(spark, h5_dir), use_real_decoder=False).collect()
    assert sorted(map(str, again)) == sorted(map(str, rows))


def test_h5_records_flow_into_the_envelope(spark, h5_dir):
    """S1 -> entry-point A: archive records enrich into the reference
    envelope with machine/operation carried through."""
    from datapipeline_spike_spark.pipeline import enrich_records

    recs = read_vibration_records(hdf5_files(spark, h5_dir), use_real_decoder=False)
    env = enrich_records(recs.withColumn("ts", F.current_timestamp()), drop_invalid=False)
    row = env.first()
    assert row["machine"].startswith("M") and row["operation"].startswith("OP")
    assert row["features"]["time_domain"]["x"]["rms"] is not None
    assert len(row["reduced_features"]["principal_components"]) == 3


def test_real_decoder_gate_names_dependency(spark, h5_dir):
    if H5_AVAILABLE:
        pytest.skip("h5py present; gate not exercisable")
    recs = read_vibration_records(hdf5_files(spark, h5_dir), use_real_decoder=True)
    with pytest.raises(Exception, match="h5py"):
        recs.collect()
