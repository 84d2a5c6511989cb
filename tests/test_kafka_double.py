"""S3/S4 run UNGATED against the file-backed Kafka wire double (r11 —
VERDICT r10 item 7): the SAME parse/produce topology that would run
against the real connector (sources/kafka.parse_kafka_records /
kafka_payload) is exercised over a log with Kafka's exact wire schema
and broker semantics (keyed partitioning, per-partition monotonic
offsets, earliest/offset replay), batch AND readStream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipeline_spike_spark.sources.kafka import (
    TOPIC_DLQ,
    TOPIC_PROCESSED,
    TOPIC_RAW,
    kafka_payload,
    parse_kafka_records,
)
from datapipeline_spike_spark.sources.kafka_double import (
    WIRE_SCHEMA,
    FileTopicLog,
)

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("machine", T.StringType()),
        T.StructField("vib", T.DoubleType()),
    ]
)


def _records(spark, ids):
    return spark.createDataFrame(
        [(i, f"M{i % 2 + 1:02d}", i * 0.5) for i in ids],
        "id long, machine string, vib double",
    )


def test_produce_consume_round_trip_batch(spark, tmp_path):
    """kafka_payload -> log -> parse_kafka_records is the identity on
    the typed record (S4 then S3, the full wire cycle)."""
    log = FileTopicLog(str(tmp_path), n_partitions=4)
    recs = _records(spark, range(20))
    log.produce(kafka_payload(recs, key_col="id"), TOPIC_RAW)
    wire = log.read_batch(spark, TOPIC_RAW)
    assert [f.name for f in wire.schema.fields] == [
        f.name for f in WIRE_SCHEMA.fields
    ]
    back = parse_kafka_records(wire, VALUE_SCHEMA)
    got = {r["id"]: r for r in back.collect()}
    assert len(got) == 20
    for r in recs.collect():
        g = got[r["id"]]
        assert g["machine"] == r["machine"] and g["vib"] == r["vib"]
        assert g["key"] == str(r["id"])
        assert g["kafka_ts"] is not None


def test_keyed_partitioning_and_monotonic_offsets(spark, tmp_path):
    """Broker contracts the topology depends on: same key -> same
    partition across separate appends; each partition's offsets are
    dense, start at 0, and CONTINUE across appends (high-water mark),
    never repeating."""
    log = FileTopicLog(str(tmp_path), n_partitions=4)
    log.produce(kafka_payload(_records(spark, range(10)), "id"), TOPIC_PROCESSED)
    log.produce(
        kafka_payload(_records(spark, range(5, 15)), "id"), TOPIC_PROCESSED
    )
    rows = log.read_batch(spark, TOPIC_PROCESSED).collect()
    assert len(rows) == 20
    # keyed contract: one partition per key, even across appends
    part_of = {}
    for r in rows:
        k = bytes(r["key"]).decode()
        assert part_of.setdefault(k, r["partition"]) == r["partition"], k
    # offsets dense per partition, no dupes
    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), (p, sorted(offs))


def test_starting_offsets_replay(spark, tmp_path):
    """The startingOffsets surface: an explicit per-partition offset
    map replays from that offset (inclusive); unlisted partitions
    replay from earliest."""
    log = FileTopicLog(str(tmp_path), n_partitions=2)
    log.produce(kafka_payload(_records(spark, range(12)), "id"), TOPIC_RAW)
    full = log.read_batch(spark, TOPIC_RAW).collect()
    p0 = sorted(r["offset"] for r in full if r["partition"] == 0)
    cut = p0[len(p0) // 2]
    partial = log.read_batch(spark, TOPIC_RAW, starting_offsets={0: cut})
    got = partial.collect()
    assert all(
        r["offset"] >= cut for r in got if r["partition"] == 0
    )
    # partition 1 untouched
    assert sum(r["partition"] == 1 for r in got) == sum(
        r["partition"] == 1 for r in full
    )


def test_streaming_consume_same_topology(spark, tmp_path):
    """S3 as a STREAM: readStream over the wire double -> the SAME
    parse_kafka_records -> memory sink; appends arrive as micro-batches
    and the typed output matches the batch read exactly."""
    from datapipeline_spike_spark.streaming.pipeline import run_to_memory

    log = FileTopicLog(str(tmp_path), n_partitions=4)
    log.produce(kafka_payload(_records(spark, range(8)), "id"), TOPIC_RAW)
    stream = parse_kafka_records(log.read_stream(spark, TOPIC_RAW), VALUE_SCHEMA)
    assert stream.isStreaming
    q = run_to_memory(stream, "kafka_double_stream")
    try:
        first = {
            r["id"] for r in spark.sql("SELECT id FROM kafka_double_stream").collect()
        }
        assert first == set(range(8))
        # a second append is picked up as a new micro-batch
        log.produce(kafka_payload(_records(spark, range(8, 12)), "id"), TOPIC_RAW)
        q.processAllAvailable()
        both = {
            r["id"] for r in spark.sql("SELECT id FROM kafka_double_stream").collect()
        }
        assert both == set(range(12))
    finally:
        q.stop()


def test_dlq_topic_round_trip(spark, tmp_path):
    """S6 wire shape: failed records published to the DLQ topic carry
    the error envelope and replay cleanly (the reprocessing path)."""
    log = FileTopicLog(str(tmp_path), n_partitions=2)
    failed = _records(spark, range(3)).select(
        "*", F.lit("decode_error").alias("error"), F.lit(5).alias("attempts")
    )
    log.produce(kafka_payload(failed, "id"), TOPIC_DLQ)
    schema = VALUE_SCHEMA.add("error", T.StringType()).add(
        "attempts", T.IntegerType()
    )
    back = parse_kafka_records(log.read_batch(spark, TOPIC_DLQ), schema)
    rows = back.collect()
    assert len(rows) == 3
    assert all(r["error"] == "decode_error" and r["attempts"] == 5 for r in rows)


def test_fresh_topic_and_bad_offsets(spark, tmp_path):
    log = FileTopicLog(str(tmp_path), n_partitions=2)
    log.produce(kafka_payload(_records(spark, [1]), "id"), TOPIC_RAW)
    with pytest.raises(ValueError, match="starting_offsets"):
        log.read_batch(spark, TOPIC_RAW, starting_offsets="latest-ish")


def _log_digest(spark, log, topic):
    """Order-insensitive digest of the full wire log: every column of
    every record, hashed — byte-level replay identity."""
    rows = sorted(
        (
            bytes(r["key"] or b""),
            bytes(r["value"] or b""),
            r["topic"],
            r["partition"],
            r["offset"],
            str(r["timestamp"]),
            r["timestampType"],
        )
        for r in log.read_batch(spark, topic).collect()
    )
    import hashlib

    return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows)


def test_produce_epoch_replay_is_idempotent(spark, tmp_path):
    """ST3 on the wire path (VERDICT r11 item 6): re-producing the SAME
    epoch — the foreachBatch re-delivery a crash between produce and
    checkpoint commit causes — leaves the log byte-identical (records,
    partitions, offsets, timestamps), while the plain at-least-once
    produce() duplicates under the same replay."""
    log = FileTopicLog(str(tmp_path / "eo"), n_partitions=4)
    log.produce_epoch(kafka_payload(_records(spark, range(8)), "id"),
                      TOPIC_PROCESSED, epoch_id=0)
    log.produce_epoch(kafka_payload(_records(spark, range(8, 12)), "id"),
                      TOPIC_PROCESSED, epoch_id=1)
    before, n_before = _log_digest(spark, log, TOPIC_PROCESSED)
    assert n_before == 12
    # the kill-replay: epoch 1 is delivered again
    log.produce_epoch(kafka_payload(_records(spark, range(8, 12)), "id"),
                      TOPIC_PROCESSED, epoch_id=1)
    after, n_after = _log_digest(spark, log, TOPIC_PROCESSED)
    assert (after, n_after) == (before, n_before)
    # offsets still dense per partition across the epoch boundary
    by_part: dict[int, list[int]] = {}
    for r in log.read_batch(spark, TOPIC_PROCESSED).collect():
        by_part.setdefault(r["partition"], []).append(r["offset"])
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), (p, sorted(offs))
    # contrast: the at-least-once path DOES duplicate on replay
    al = FileTopicLog(str(tmp_path / "alo"), n_partitions=4)
    al.produce(kafka_payload(_records(spark, range(4)), "id"), TOPIC_RAW)
    al.produce(kafka_payload(_records(spark, range(4)), "id"), TOPIC_RAW)
    assert len(al.read_batch(spark, TOPIC_RAW).collect()) == 8


def test_stream_sink_exactly_once_kill_replay(spark, tmp_path):
    """The streaming form: stream_sink_exactly_once writes each
    micro-batch as its epoch; after a kill, restarting from the SAME
    checkpoint replays the uncommitted micro-batch into the SAME epoch
    and the topic log ends byte-identical to a clean run — then new
    data appends as new epochs and a consumer sees no duplicates."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    log = FileTopicLog(str(tmp_path / "log"), n_partitions=2)
    ckpt = str(tmp_path / "ckpt")

    def write_src(ids, name):
        # one file = one micro-batch = one epoch (maxFilesPerTrigger=1),
        # so the replay below targets a whole, known epoch
        _records(spark, ids).coalesce(1).write.mode("overwrite").parquet(
            str(src_dir / name)
        )

    write_src(range(6), "b0")
    stream = spark.readStream.schema(
        "id long, machine string, vib double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir) + "/*")
    q = log.stream_sink_exactly_once(
        kafka_payload(stream, key_col="id"), TOPIC_PROCESSED, ckpt
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # the 'kill'
    clean, n_clean = _log_digest(spark, log, TOPIC_PROCESSED)
    assert n_clean == 6
    # simulate the re-delivered last micro-batch: the driver died after
    # produce but before the checkpoint commit, so epoch 0 re-fires
    log.produce_epoch(
        kafka_payload(_records(spark, range(6)), "id"),
        TOPIC_PROCESSED,
        epoch_id=0,
    )
    assert _log_digest(spark, log, TOPIC_PROCESSED) == (clean, n_clean)
    # restart from the same checkpoint with new data: new epoch, no dupes
    write_src(range(6, 9), "b1")
    stream2 = spark.readStream.schema(
        "id long, machine string, vib double"
    ).option("maxFilesPerTrigger", "1").parquet(str(src_dir) + "/*")
    q2 = log.stream_sink_exactly_once(
        kafka_payload(stream2, key_col="id"), TOPIC_PROCESSED, ckpt
    ).start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    back = parse_kafka_records(
        log.read_batch(spark, TOPIC_PROCESSED), VALUE_SCHEMA
    ).collect()
    ids = sorted(r["id"] for r in back)
    assert ids == list(range(9))  # every record exactly once


def test_log_compaction_keeps_latest_per_key_with_original_offsets(spark, tmp_path):
    """Kafka log-compaction semantics on the double: folded segments
    keep only each key's HIGHEST-offset record at its ORIGINAL offset
    (gaps remain); the ACTIVE (max-id) epoch is never cleaned — so the
    last micro-batch's replay stays idempotent across compaction, a
    folded epoch's replay fails LOUDLY, and post-compaction produce
    continues the high-water mark (offsets never regress or repeat)."""
    log = FileTopicLog(str(tmp_path), n_partitions=2)
    # flat ids 0..9; epoch 0 updates ids 0..5; epoch 1 (ACTIVE) ids 8..11
    log.produce(kafka_payload(_records(spark, range(10)), "id"), TOPIC_PROCESSED)
    updated = _records(spark, range(6)).withColumn("vib", F.col("vib") + 100.0)
    log.produce_epoch(kafka_payload(updated, "id"), TOPIC_PROCESSED, epoch_id=0)
    act = _records(spark, range(8, 12)).withColumn("vib", F.col("vib") + 200.0)
    log.produce_epoch(kafka_payload(act, "id"), TOPIC_PROCESSED, epoch_id=1)
    before = log.read_batch(spark, TOPIC_PROCESSED).collect()
    assert len(before) == 20
    log.compact(spark, TOPIC_PROCESSED)
    after = log.read_batch(spark, TOPIC_PROCESSED).collect()
    # 10 folded-latest (keys 0..9) + 4 untouched active records
    assert len(after) == 14
    back = parse_kafka_records(
        log.read_batch(spark, TOPIC_PROCESSED), VALUE_SCHEMA
    ).collect()
    by_id: dict[int, list[float]] = {}
    for r in back:
        by_id.setdefault(r["id"], []).append(r["vib"])
    for i in range(6):   # epoch-0 updates won the fold
        assert by_id[i] == [pytest.approx(i * 0.5 + 100.0)]
    for i in (6, 7):     # untouched flat records survive
        assert by_id[i] == [pytest.approx(i * 0.5)]
    for i in (8, 9):     # folded flat copy + active-epoch copy coexist
        assert sorted(by_id[i]) == [
            pytest.approx(i * 0.5), pytest.approx(i * 0.5 + 200.0)
        ]
    for i in (10, 11):   # active-epoch-only keys
        assert by_id[i] == [pytest.approx(i * 0.5 + 200.0)]
    # offsets unique across the whole compacted log
    seen = set()
    for r in after:
        key = (r["partition"], r["offset"])
        assert key not in seen, key
        seen.add(key)
    # the ACTIVE epoch replays idempotently across compaction
    digest_before = sorted((r["partition"], r["offset"]) for r in after)
    log.produce_epoch(kafka_payload(act, "id"), TOPIC_PROCESSED, epoch_id=1)
    replayed = log.read_batch(spark, TOPIC_PROCESSED).collect()
    assert sorted((r["partition"], r["offset"]) for r in replayed) == digest_before
    # a FOLDED epoch's replay is refused loudly (silent dupes forbidden)
    with pytest.raises(ValueError, match="folded by compaction"):
        log.produce_epoch(kafka_payload(updated, "id"), TOPIC_PROCESSED,
                          epoch_id=0)
    # post-compaction produce continues the HWM: offsets stay unique
    log.produce(kafka_payload(_records(spark, range(12, 14)), "id"),
                TOPIC_PROCESSED)
    rows = log.read_batch(spark, TOPIC_PROCESSED).collect()
    seen = set()
    for r in rows:
        key = (r["partition"], r["offset"])
        assert key not in seen, key
        seen.add(key)


def test_compact_fresh_topic_is_noop(spark, tmp_path):
    """ADVICE r12: compact() on a never-produced topic escaped as a
    bare FileNotFoundError from os.listdir; every other method treats
    the fresh topic gracefully — now compact does too (no-op, no dir
    created, subsequent produce/read unaffected)."""
    import os

    log = FileTopicLog(str(tmp_path), n_partitions=2)
    log.compact(spark, "never-produced")  # must not raise
    assert not os.path.isdir(os.path.join(str(tmp_path), "never-produced"))
    log.produce(kafka_payload(_records(spark, range(4)), "id"), "never-produced")
    assert log.read_batch(spark, "never-produced").count() == 4


def test_log_compaction_crash_recovery(spark, tmp_path):
    """A compact() that died between its two renames leaves the whole
    pre-compact log at .old; the next access restores it untouched."""
    import os

    log = FileTopicLog(str(tmp_path), n_partitions=2)
    log.produce(kafka_payload(_records(spark, range(6)), "id"), TOPIC_RAW)
    before = sorted(
        (r["partition"], r["offset"], bytes(r["key"]).decode())
        for r in log.read_batch(spark, TOPIC_RAW).collect()
    )
    d = os.path.join(str(tmp_path), TOPIC_RAW)
    os.rename(d, d + ".old")  # the mid-swap crash state
    after = sorted(
        (r["partition"], r["offset"], bytes(r["key"]).decode())
        for r in log.read_batch(spark, TOPIC_RAW).collect()
    )
    assert after == before  # healed on first access

    # wave-3 window: crash between the renames WITH an active epoch —
    # compact copies (never moves) the active epoch into the staging
    # dir, so the heal restores the COMPLETE log including the last
    # micro-batch, and the next compact still succeeds
    import shutil

    log.produce_epoch(kafka_payload(_records(spark, range(6, 9)), "id"),
                      TOPIC_RAW, epoch_id=0)
    full = sorted(
        (r["partition"], r["offset"], bytes(r["key"]).decode())
        for r in log.read_batch(spark, TOPIC_RAW).collect()
    )
    tmp = d + ".compacting"
    os.makedirs(tmp)
    shutil.copytree(os.path.join(d, "epoch-0"), os.path.join(tmp, "epoch-0"))
    os.rename(d, d + ".old")  # crash before the final rename
    healed = sorted(
        (r["partition"], r["offset"], bytes(r["key"]).decode())
        for r in log.read_batch(spark, TOPIC_RAW).collect()
    )
    assert healed == full  # nothing lost, active epoch included
    log.compact(spark, TOPIC_RAW)  # stale .compacting is swept
    assert sorted(
        bytes(r["key"]).decode()
        for r in log.read_batch(spark, TOPIC_RAW).collect()
    ) == sorted(str(i) for i in range(9))


def test_stream_consumer_reads_epoch_produced_topic(spark, tmp_path):
    """A FRESH readStream consumer over a topic written by
    produce_epoch sees every record exactly once (the stream source
    walks the epoch subdirs via recursive lookup). A consumer already
    RUNNING across a replay is the documented isolation gap (see
    stream_sink_exactly_once's caveat): file sources track part-file
    paths, so rewritten files can re-deliver — the read_committed
    semantics a file double cannot model."""
    from datapipeline_spike_spark.streaming.pipeline import run_to_memory

    log = FileTopicLog(str(tmp_path / "log"), n_partitions=2)
    log.produce_epoch(kafka_payload(_records(spark, range(5)), "id"),
                      TOPIC_RAW, epoch_id=0)
    log.produce_epoch(kafka_payload(_records(spark, range(5, 9)), "id"),
                      TOPIC_RAW, epoch_id=1)
    stream = parse_kafka_records(log.read_stream(spark, TOPIC_RAW), VALUE_SCHEMA)
    q = run_to_memory(stream, "kafka_epoch_stream")
    try:
        got = {
            r["id"]
            for r in spark.sql("SELECT id FROM kafka_epoch_stream").collect()
        }
        assert got == set(range(9))
    finally:
        q.stop()


def test_end_to_end_record_path_raw_to_processed(spark, tmp_path):
    """The reference's full record path, ungated (README.md:196-270):
    consume cnc.raw -> typed parse -> per-machine tumbling-window
    aggregate -> keyed produce to cnc.processed -> an independent
    consumer reads the processed topic back typed. Both hops run the
    REAL kafka projections over the wire double; the middle is the
    engine's own streaming-compatible aggregation shape."""
    log = FileTopicLog(str(tmp_path / "log"), n_partitions=4)
    raw = _records(spark, range(12)).select(
        "*", F.lit("2026-08-15 10:00:03").cast("timestamp").alias("ts")
    )
    log.produce(kafka_payload(raw, "id"), TOPIC_RAW)

    schema = VALUE_SCHEMA.add("ts", T.TimestampType())
    stream = parse_kafka_records(log.read_stream(spark, TOPIC_RAW), schema)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("w"), "machine")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("vib"), 6).alias("avg_vib"),
        )
        .select(
            F.concat("machine", F.lit("@"), F.col("w.start").cast("string")).alias("id"),
            "machine",
            "n",
            "avg_vib",
        )
    )
    q = (
        log.stream_sink(
            kafka_payload(agg, key_col="id"),
            TOPIC_PROCESSED,
            str(tmp_path / "ckpt"),
        )
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("machine", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("avg_vib", T.DoubleType()),
        ]
    )
    processed = parse_kafka_records(
        log.read_batch(spark, TOPIC_PROCESSED), out_schema
    ).collect()
    by_machine = {r["machine"]: r for r in processed}
    assert set(by_machine) == {"M01", "M02"}
    assert by_machine["M01"]["n"] == 6 and by_machine["M02"]["n"] == 6
    # M01 holds the even ids (0,2,..,10)*0.5 -> 2.5; M02 the odd -> 3.0
    assert by_machine["M01"]["avg_vib"] == pytest.approx(2.5)
    assert by_machine["M02"]["avg_vib"] == pytest.approx(3.0)
    # keyed produce: the processed record key is the aggregate id
    wire = {
        bytes(r["key"]).decode(): r
        for r in log.read_batch(spark, TOPIC_PROCESSED).collect()
    }
    assert all(k.startswith(("M01@", "M02@")) for k in wire)
