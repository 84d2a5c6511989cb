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


def test_native_decode_real_hdf5_archive_end_to_end(spark, tmp_path):
    """r8 native tier: a spec-conformant classic-format archive (written
    by our pure-Python writer — same layout default h5py emits) decodes
    through the FULL Spark path with no h5py: binaryFile -> mapInPandas
    -> 10-sample records, values exact."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import write_minimal_h5

    x = np.arange(25, dtype="<f8") * 0.5
    y = np.arange(25, dtype="<f8") - 12.0
    z = (np.arange(25, dtype="<f8") % 7) * 2.0
    blob = write_minimal_h5(
        {"vibration_x": x, "vibration_y": y, "vibration_z": z}
    )
    (tmp_path / "M01_Aug_2019_OP03_000.h5").write_bytes(blob)
    files = hdf5_files(spark, str(tmp_path))
    recs = read_vibration_records(files, samples_per_record=10).collect()
    assert [r["record_idx"] for r in sorted(recs, key=lambda r: r["record_idx"])] == [0, 1, 2]
    by_idx = {r["record_idx"]: r for r in recs}
    assert by_idx[0]["vibration_x_batch"] == [float(v) for v in x[:10]]
    assert by_idx[2]["vibration_y_batch"] == [float(v) for v in y[20:25]]  # tail record
    assert by_idx[1]["vibration_z_batch"] == [float(v) for v in z[10:20]]
    assert all(r["machine"] == "M01" and r["operation"] == "OP03" for r in recs)


def test_native_chunked_gzip_round_trip():
    """r11 (VERDICT r10 item 6): libhdf5's DEFAULT compressed layout —
    chunked storage + deflate, with and without the byte-shuffle
    pre-filter — round-trips through the pure-Python writer/reader:
    B-tree v1 chunk walk, zlib inflate, unshuffle, edge-chunk clipping,
    2-D tiling, values exact."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        read_h5_datasets,
        write_minimal_h5_chunked,
    )

    data = {
        "f64": np.linspace(-3, 3, 100).astype("<f8"),
        "f32": (np.arange(100, dtype="<f4") - 50) * 0.25,
        "i32": np.arange(100, dtype="<i4") * 3,
        "mat": np.arange(35, dtype="<i8").reshape(7, 5),
    }
    for shuffle in (False, True):
        back = read_h5_datasets(write_minimal_h5_chunked(data, shuffle=shuffle))
        assert set(back) == set(data)
        for k, v in data.items():
            assert back[k].dtype == v.dtype and back[k].shape == v.shape
            assert np.array_equal(back[k], v), (shuffle, k)
    # explicit chunk grids: exact divisor (no edge padding) and a 2-D
    # tile grid with partial edges on both axes
    back = read_h5_datasets(
        write_minimal_h5_chunked(
            data, chunk_shape={"f64": (25,), "mat": (3, 2)}
        )
    )
    for k, v in data.items():
        assert np.array_equal(back[k], v), k


def test_native_dense_link_round_trip():
    """r12 (VERDICT r11 item 8): DENSE group link storage — the fractal
    heap (direct-block root) + type-5 v2 B-tree name index libhdf5
    switches to past max_compact=8 links — round-trips through the
    pure-Python writer/reader at 9 links (just past the compact bound)
    and at 60 links (a multi-KB heap), values exact, ids recovered via
    the hash-ordered index."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        read_h5_datasets,
        write_minimal_h5_dense,
    )

    for n in (9, 60):
        data = {
            f"ds{i:03d}": np.arange(i + 3, dtype="<f8") * (i + 1)
            for i in range(n)
        }
        blob = write_minimal_h5_dense(data)
        back = read_h5_datasets(blob)
        assert set(back) == set(data)
        for k, v in data.items():
            assert back[k].dtype == v.dtype
            assert np.array_equal(back[k], v), k


def test_native_dense_gates_stay_typed():
    """The dense tier's remaining escalations raise typed errors (the
    source tier falls back to h5py, never crashes): indirect-rooted
    heaps (cur rows > 0) and deep v2 B-trees (depth > 0)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        lookup3,
        read_h5_datasets,
        write_minimal_h5_dense,
    )

    base = write_minimal_h5_dense({"a": np.arange(3, dtype="<i4")})

    def repack_frhp(blob: bytearray, cur_rows: int) -> bytes:
        i = blob.index(b"FRHP")
        blob[i + 140 : i + 142] = struct.pack("<H", cur_rows)
        blob[i + 142 : i + 146] = struct.pack(
            "<I", lookup3(bytes(blob[i : i + 142]))
        )
        return bytes(blob)

    with _pytest.raises(Hdf5FormatError, match="indirect root"):
        read_h5_datasets(repack_frhp(bytearray(base), cur_rows=1))

    blob = bytearray(base)
    j = blob.index(b"BTHD")
    blob[j + 12 : j + 14] = struct.pack("<H", 1)  # depth -> 1
    blob[j + 34 : j + 38] = struct.pack("<I", lookup3(bytes(blob[j : j + 34])))
    with _pytest.raises(Hdf5FormatError, match="depth > 0"):
        read_h5_datasets(bytes(blob))


def test_native_unwritten_datasets_read_as_fill_value():
    """ADVICE r11: libhdf5 legally leaves the chunk B-tree address (and
    a contiguous dataset's data address) UNDEF for a dataset that was
    created but never written — both now decode as the zero fill-value
    array instead of raising/failing reshape, so an archive containing
    one isn't silently dropped by the h5py-absent tier."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        read_h5_datasets,
        write_minimal_h5_chunked,
    )

    data = {
        "written": np.arange(20, dtype="<f8"),
        "empty": np.arange(12, dtype="<i4").reshape(3, 4),
    }
    back = read_h5_datasets(
        write_minimal_h5_chunked(data, unwritten=("empty",))
    )
    assert np.array_equal(back["written"], data["written"])
    assert back["empty"].shape == (3, 4) and back["empty"].dtype == np.dtype("<i4")
    assert not back["empty"].any()  # fill value = 0


def test_native_truncated_contiguous_dataset_raises_not_zerofills():
    """Review r12: only the UNDEF (never-written) case zero-fills; a
    SHORT non-empty contiguous read is truncation/corruption and must
    raise a typed error instead of silently reading a zero tail."""
    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5,
    )

    import struct

    arr = np.arange(64, dtype="<f8")
    blob = bytearray(write_minimal_h5({"d": arr}))
    # shrink the contiguous layout message's stored size (version 3,
    # class 1, address(8), size(8)) below the dataspace's n*itemsize —
    # the read now comes back short and must raise, not zero-fill
    pat = struct.pack("<Q", arr.nbytes)
    i = blob.index(b"\x03\x01")
    assert blob[i + 10 : i + 18] == pat  # the layout size field
    blob[i + 10 : i + 18] = struct.pack("<Q", 100)
    with _pytest.raises(Hdf5FormatError, match="truncated"):
        read_h5_datasets(bytes(blob))


def test_native_defined_address_size_zero_raises_not_zerofills():
    """ADVICE r12: a DEFINED data address whose size field is a corrupt
    0 used to alias the UNDEF never-written case (both produced
    raw == b'') and zero-filled silently. UNDEF is now tracked with an
    explicit sentinel, so the 0-byte read at a real address escalates
    as truncation/corruption like any other short read."""
    import struct

    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5,
    )

    arr = np.arange(64, dtype="<f8")
    blob = bytearray(write_minimal_h5({"d": arr}))
    pat = struct.pack("<Q", arr.nbytes)
    i = blob.index(b"\x03\x01")
    assert blob[i + 10 : i + 18] == pat  # the layout size field
    assert blob[i + 2 : i + 10] != b"\xff" * 8  # address is DEFINED
    blob[i + 10 : i + 18] = struct.pack("<Q", 0)
    with _pytest.raises(Hdf5FormatError, match="truncated"):
        read_h5_datasets(bytes(blob))


def test_native_chunked_archive_end_to_end_spark(spark, tmp_path):
    """A chunked+gzip+shuffle archive decodes through the FULL Spark
    path with no h5py: binaryFile -> mapInPandas -> 10-sample records —
    the layout real vibration archives actually ship in
    (reference/TechSpikeDataPipeline.md:6,28-33)."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        write_minimal_h5_chunked,
    )

    x = np.arange(25, dtype="<f8") * 0.5
    y = np.arange(25, dtype="<f8") - 12.0
    z = (np.arange(25, dtype="<f8") % 7) * 2.0
    blob = write_minimal_h5_chunked(
        {"vibration_x": x, "vibration_y": y, "vibration_z": z}, shuffle=True
    )
    (tmp_path / "M02_Aug_2019_OP07_000.h5").write_bytes(blob)
    files = hdf5_files(spark, str(tmp_path))
    recs = read_vibration_records(files, samples_per_record=10).collect()
    by_idx = {r["record_idx"]: r for r in recs}
    assert sorted(by_idx) == [0, 1, 2]
    assert by_idx[0]["vibration_x_batch"] == [float(v) for v in x[:10]]
    assert by_idx[2]["vibration_y_batch"] == [float(v) for v in y[20:25]]
    assert by_idx[1]["vibration_z_batch"] == [float(v) for v in z[10:20]]
    assert all(r["machine"] == "M02" and r["operation"] == "OP07" for r in recs)


def test_native_dense_archive_end_to_end_spark(spark, tmp_path):
    """A dense-link archive (9 datasets — past the compact bound, so
    the root group stores links in the fractal heap) decodes through
    the FULL Spark path with no h5py; the three vibration_* datasets
    fan out to records, the extra channels are simply unused."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        write_minimal_h5_dense,
    )

    x = np.arange(20, dtype="<f8") * 0.25
    data = {
        "vibration_x": x,
        "vibration_y": x + 1.0,
        "vibration_z": x * -1.0,
    }
    data.update({f"aux{i}": np.arange(5, dtype="<i4") for i in range(6)})
    (tmp_path / "M03_Sep_2019_OP01_000.h5").write_bytes(
        write_minimal_h5_dense(data)
    )
    files = hdf5_files(spark, str(tmp_path))
    recs = read_vibration_records(files, samples_per_record=10).collect()
    by_idx = {r["record_idx"]: r for r in recs}
    assert sorted(by_idx) == [0, 1]
    assert by_idx[0]["vibration_x_batch"] == [float(v) for v in x[:10]]
    assert by_idx[1]["vibration_y_batch"] == [float(v) + 1.0 for v in x[10:]]
    assert all(r["machine"] == "M03" and r["operation"] == "OP01" for r in recs)


def test_native_reader_round_trips_all_supported_dtypes():
    """Writer->reader round trip across the documented numeric subset,
    including 2-D shapes, plus clean rejection of out-of-subset and
    non-HDF5 payloads (the tier contract: Hdf5FormatError, never a
    crash)."""
    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5,
    )

    data = {
        "f64": np.linspace(-3, 3, 17).astype("<f8"),
        "f32": np.arange(9, dtype="<f4").reshape(3, 3),
        "i64": np.array([-5, 0, 2**40], dtype="<i8"),
        "i32": np.arange(-4, 4, dtype="<i4"),
        "i16": np.array([1, -1, 32000], dtype="<i2"),
    }
    blob = write_minimal_h5(data)
    # spec conformance the in-repo reader does not exercise: base
    # address (offset 24) must stay 0 and the end-of-file address
    # (offset 40) must equal the file length — libhdf5 resolves every
    # object address relative to the base, so swapping these two fields
    # (the r8 review catch) breaks real-h5py interop silently
    assert int.from_bytes(blob[24:32], "little") == 0
    assert int.from_bytes(blob[40:48], "little") == len(blob)
    back = read_h5_datasets(blob)
    assert set(back) == set(data)
    for k, v in data.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape
        assert np.array_equal(back[k], v), k
    with _pytest.raises(Hdf5FormatError, match="signature"):
        read_h5_datasets(b"parquet-or-something" * 4)
    # superblock v1 is NATIVE as of r11 (v0 + istore_k/reserved insert)
    v1 = write_minimal_h5(data, sb_version=1)
    assert v1[8] == 1
    back1 = read_h5_datasets(v1)
    for k, v in data.items():
        assert np.array_equal(back1[k], v), ("v1", k)
    # a still-unsupported version number (4) names the gate
    fake_v4 = b"\x89HDF\r\n\x1a\n" + bytes([4]) + b"\x00" * 64
    with _pytest.raises(Hdf5FormatError, match="superblock version 4"):
        read_h5_datasets(fake_v4)
    # a v3 superblock whose checksum does not match its bytes is
    # rejected BEFORE any object parse (corruption gate)
    fake_v3 = b"\x89HDF\r\n\x1a\n" + bytes([3, 8, 8, 0]) + b"\x00" * 36
    with _pytest.raises(Hdf5FormatError, match="checksum"):
        read_h5_datasets(fake_v3)


def test_lookup3_public_vectors():
    """The checksum primitive behind superblock v2/v3 and OHDR blocks,
    pinned to the test vectors published in Bob Jenkins' lookup3.c
    driver (and the zero-length identity) — if these hold, our
    checksums agree with libhdf5's."""
    from datapipeline_spike_spark.sources.hdf5_native import lookup3

    assert lookup3(b"", 0) == 0xDEADBEEF
    assert lookup3(b"Four score and seven years ago", 0) == 0x17770551
    assert lookup3(b"Four score and seven years ago", 1) == 0xCD628161


def test_native_v2_reader_round_trips_latest_format():
    """r10 (VERDICT r9 item 7): superblock v3 + OHDR v2 + compact link
    messages — the ``libver='latest'`` layout — round-trips through the
    native tier, checksum-verified, including 2-D shapes; corrupting
    one byte inside an object header is caught by the OHDR checksum."""
    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5_v2,
    )

    data = {
        "f64": np.linspace(-3, 3, 17).astype("<f8"),
        "f32": np.arange(9, dtype="<f4").reshape(3, 3),
        "i64": np.array([-5, 0, 2**40], dtype="<i8"),
        "i16": np.array([1, -1, 32000], dtype="<i2"),
    }
    blob = write_minimal_h5_v2(data)
    assert blob[8] == 3  # superblock version
    assert int.from_bytes(blob[28:36], "little") == len(blob)  # eof addr
    back = read_h5_datasets(blob)
    assert set(back) == set(data)
    for k, v in data.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape
        assert np.array_equal(back[k], v), k
    bad = bytearray(blob)
    bad[-10] ^= 0xFF  # inside the root group OHDR
    with _pytest.raises(Hdf5FormatError, match="checksum"):
        read_h5_datasets(bytes(bad))


def test_native_v2_decode_end_to_end_spark(spark, tmp_path):
    """A latest-format archive decodes through the FULL Spark path
    (binaryFile -> mapInPandas -> records) with no h5py, exactly like
    the classic-format path."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import write_minimal_h5_v2

    x = np.arange(25, dtype="<f8") * 0.5
    blob = write_minimal_h5_v2(
        {
            "vibration_x": x,
            "vibration_y": x + 1.0,
            "vibration_z": x * 2.0,
        }
    )
    (tmp_path / "M02_Aug_2019_OP05_000.h5").write_bytes(blob)
    recs = read_vibration_records(hdf5_files(spark, str(tmp_path))).collect()
    assert [r["record_idx"] for r in sorted(recs, key=lambda r: r["record_idx"])] == [0, 1, 2]
    by_idx = {r["record_idx"]: r for r in recs}
    assert by_idx[1]["vibration_x_batch"] == [float(v) for v in x[10:20]]
    assert all(r["machine"] == "M02" and r["operation"] == "OP05" for r in recs)


def test_format_matrix():
    """The HDF5 format matrix (VERDICT r8 item 6 / r9 item 7): exactly
    which layouts decode NATIVELY vs GATE to h5py. Native: superblock
    v0/v1 (classic) and v2/v3 (latest), object headers v1 and v2,
    symbol-table, compact-link AND dense (fractal heap + v2 B-tree,
    r12) groups, contiguous/compact layout, chunked layout with
    deflate(+shuffle) filters (r11 — libhdf5's default compressed
    shape), LE numeric dtypes. Gated: superblock v4+, indirect-rooted /
    filtered fractal heaps and depth>0 v2 B-trees (dense groups past
    ~180 links), exotic filters (szip/lzf), non-hard links, big-endian
    and non-numeric datatypes — each rejection is a typed
    Hdf5FormatError naming the gate, so the source tier escalates
    instead of crashing."""
    import struct

    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        UNDEF,
        Hdf5FormatError,
        lookup3,
        read_h5_datasets,
        write_minimal_h5,
        write_minimal_h5_v2,
    )

    ds = {"d": np.arange(4, dtype="<f8")}
    # --- native set ---
    assert read_h5_datasets(write_minimal_h5(ds))["d"].tolist() == [0, 1, 2, 3]
    assert read_h5_datasets(write_minimal_h5_v2(ds))["d"].tolist() == [0, 1, 2, 3]

    # --- gated set, each named ---
    def v3_with_root(root_msgs: bytes) -> bytes:
        """Minimal v3 file whose root OHDR carries `root_msgs`."""
        head = b"OHDR" + struct.pack("<BBI", 2, 0x02, len(root_msgs))
        oh = head + root_msgs
        oh += struct.pack("<I", lookup3(oh))
        sb = b"\x89HDF\r\n\x1a\n" + struct.pack("<BBBB", 3, 8, 8, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, 48 + len(oh), 48)
        sb += struct.pack("<I", lookup3(sb))
        return sb + oh

    def msg(mtype: int, body: bytes) -> bytes:
        return struct.pack("<BHB", mtype, len(body), 0) + body

    # dense link storage decodes NATIVELY as of r12 (fractal heap +
    # v2 B-tree walk; full round-trip in test_native_dense_link_round_
    # trip, residual gates in test_native_dense_gates_stay_typed); a
    # dense group MISSING its name index is still a typed rejection
    from datapipeline_spike_spark.sources.hdf5_native import (
        write_minimal_h5_dense,
    )

    dense9 = {f"d{i}": np.arange(4, dtype="<f8") + i for i in range(9)}
    assert read_h5_datasets(write_minimal_h5_dense(dense9))["d0"].tolist() == [
        0, 1, 2, 3,
    ]
    broken = v3_with_root(msg(0x02, struct.pack("<BBQQ", 0, 0, 0x1000, UNDEF)))
    with _pytest.raises(Hdf5FormatError, match="without a name index"):
        read_h5_datasets(broken)
    # soft link (type 1): native tier follows hard links only
    soft = v3_with_root(
        msg(0x06, struct.pack("<BBB", 1, 0x08, 1) + bytes([1]) + b"x" + b"\x00\x00")
    )
    with _pytest.raises(Hdf5FormatError, match="hard links only"):
        read_h5_datasets(soft)
    # chunked + gzip is NATIVE as of r11 (B-tree v1 walk + zlib inflate
    # + optional byte-unshuffle) — the full round-trip matrix lives in
    # test_native_chunked_gzip_round_trip; here the matrix row is the
    # plain decode
    from datapipeline_spike_spark.sources.hdf5_native import (
        write_minimal_h5_chunked,
    )

    assert read_h5_datasets(write_minimal_h5_chunked(ds))["d"].tolist() == [
        0, 1, 2, 3,
    ]
    # ...but an exotic FILTER id still gates (szip = 4): patch the
    # deflate id inside the chunked file's filter pipeline message
    blob = bytearray(write_minimal_h5_chunked(ds))
    i = blob.index(struct.pack("<HHHH", 1, 0, 0, 1))  # deflate, 1 cval
    blob[i] = 4  # -> szip
    with _pytest.raises(Hdf5FormatError, match="deflate\\+shuffle only"):
        read_h5_datasets(bytes(blob))
    # big-endian datatype
    blob = bytearray(write_minimal_h5(ds))
    j = blob.index(struct.pack("<BBBxI", (1 << 4) | 1, 0x20, 63, 8))
    blob[j + 1] |= 0x01  # order bit -> BE
    with _pytest.raises(Hdf5FormatError, match="big-endian"):
        read_h5_datasets(bytes(blob))
    # non-numeric (string) datatype class
    blob = bytearray(write_minimal_h5(ds))
    blob[j] = (1 << 4) | 3  # class 3 = string
    with _pytest.raises(Hdf5FormatError, match="numeric only"):
        read_h5_datasets(bytes(blob))


def test_mixed_archive_dir_uses_right_tier_per_file(spark, tmp_path):
    """A directory mixing a real classic archive and a legacy synthetic
    payload decodes both — native tier for the signed file, the
    deterministic fake for the unsigned one — in ONE mapInPandas pass."""
    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import write_minimal_h5

    blob = write_minimal_h5(
        {
            "vibration_x": np.ones(10, dtype="<f8"),
            "vibration_y": np.zeros(10, dtype="<f8"),
            "vibration_z": np.full(10, 7.0, dtype="<f8"),
        }
    )
    (tmp_path / "M01_Aug_2019_OP00_000.h5").write_bytes(blob)
    (tmp_path / "M02_Aug_2019_OP01_000.h5").write_bytes(b"legacy-fake" * 30)
    recs = read_vibration_records(hdf5_files(spark, str(tmp_path))).collect()
    m1 = [r for r in recs if r["machine"] == "M01"]
    m2 = [r for r in recs if r["machine"] == "M02"]
    assert len(m1) == 1 and m1[0]["vibration_z_batch"] == [7.0] * 10
    assert m2  # fake tier still fans out records


def test_native_group_btree_cycle_is_typed():
    """r12 review: a crafted group B-tree whose child points back at
    itself must raise Hdf5FormatError, not escape as RecursionError
    (the chunk-index walk's guard, applied to the group walk)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5,
    )

    blob = bytearray(write_minimal_h5({"d": np.arange(4, dtype="<f8")}))
    i = blob.index(b"TREE\x00")  # the (type 0) group node
    blob[i + 5] = 1  # level -> internal node
    struct.pack_into("<Q", blob, i + 24 + 8, i)  # child0 -> itself
    with _pytest.raises(Hdf5FormatError, match="cycle"):
        read_h5_datasets(bytes(blob))


def test_native_chunk_deflate_bomb_is_bounded():
    """r12 review: a chunk whose deflate stream inflates past the
    chunk's exact decoded size must raise the typed error WITHOUT
    materializing the inflated bytes (the MAX_DATASET_BYTES cap's
    per-chunk sibling)."""
    import zlib

    import numpy as np
    import pytest as _pytest

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5_chunked,
    )

    import struct as _s

    data = {"d": np.arange(16, dtype="<f8")}
    blob = bytearray(write_minimal_h5_chunked(data, chunk_shape={"d": (16,)}))
    good = zlib.compress(data["d"].tobytes(), 6)
    # append a 64 MiB-of-zeros bomb and repoint the single chunk's
    # B-tree key (nbytes @ key, child address @ key+24 for a 1-D
    # dataset: key = nbytes(4) mask(4) offsets(8*2)) at it
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)
    bomb_addr = len(blob)
    blob += bomb
    j = blob.index(_s.pack("<II", len(good), 0))
    _s.pack_into("<I", blob, j, len(bomb))
    _s.pack_into("<Q", blob, j + 24, bomb_addr)
    with _pytest.raises(Hdf5FormatError, match="inflates past"):
        read_h5_datasets(bytes(blob))

    # wave 3: the chunk SHAPE is attacker-controlled too — a tiny
    # dataspace with a gigantic declared chunk must not set the inflate
    # bound to gigabytes (cap the chunk's own byte claim)
    blob2 = bytearray(write_minimal_h5_chunked(data, chunk_shape={"d": (16,)}))
    # layout body: version(1) class(1) ndim(1) btree(8) cdims(4*ndim);
    # the first chunk dim (16) sits at body+11
    k = blob2.index(_s.pack("<BBB", 3, 2, 2))  # v3, chunked, ndim=2
    _s.pack_into("<I", blob2, k + 11, 1 << 30)  # chunk dim -> 2^30 elems
    with _pytest.raises(Hdf5FormatError, match="chunk claims"):
        read_h5_datasets(bytes(blob2))


def test_native_reader_fuzz_contract():
    """r12 fuzz contract (lake payloads are untrusted input): mutating
    ANY bytes of a valid archive — across all four writer layouts —
    must either decode or raise Hdf5FormatError; no stray IndexError/
    struct.error/zlib.error/OverflowError may escape the boundary and
    abort a scan stage. Deterministic PRNG, several hundred mutants."""
    import random

    import numpy as np

    from datapipeline_spike_spark.sources.hdf5_native import (
        Hdf5FormatError,
        read_h5_datasets,
        write_minimal_h5,
        write_minimal_h5_chunked,
        write_minimal_h5_dense,
        write_minimal_h5_v2,
    )

    data = {"a": np.arange(30, dtype="<f8"), "b": np.arange(12, dtype="<i4")}
    dense = {f"d{i}": np.arange(6, dtype="<f8") for i in range(10)}
    blobs = [
        write_minimal_h5(data),
        write_minimal_h5(data, sb_version=1),
        write_minimal_h5_v2(data),
        write_minimal_h5_chunked(data, shuffle=True),
        write_minimal_h5_dense(dense),
    ]
    rng = random.Random(12)
    for blob in blobs:
        for trial in range(120):
            mut = bytearray(blob)
            for _ in range(rng.randint(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                read_h5_datasets(bytes(mut))
            except Hdf5FormatError:
                pass  # the one allowed failure mode
    # truncations at every granularity too
    for blob in blobs:
        for cut in range(8, len(blob), max(1, len(blob) // 60)):
            try:
                read_h5_datasets(blob[:cut])
            except Hdf5FormatError:
                pass
