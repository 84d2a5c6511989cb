"""File-backed Kafka wire double (r11 — VERDICT r10 item 7).

The real connector jar cannot exist in this sandbox (no network; see
COVERAGE.md S3'), which left S3/S4 topology-tested only: the
``from_json`` parse and ``to_json`` produce projections ran over
hand-built frames, never over anything with Kafka's actual WIRE SHAPE.
This module closes that gap with a parquet-backed topic log whose
schema is byte-for-byte the kafka source's output schema
(key/value BINARY, topic, partition, offset, timestamp,
timestampType — see the Structured Streaming + Kafka integration
guide), with the broker semantics the engine's topology depends on
reproduced faithfully:

- **keyed partitioning**: a record's partition is a pure function of
  its key (Kafka's default partitioner contract — what makes keyed
  compaction and per-key ordering work). The hash is crc32 mod
  n_partitions rather than Kafka's murmur2 — a documented deviation;
  the CONTRACT (same key -> same partition, stable across appends) is
  what downstream correctness needs, not the specific hash.
- **per-partition monotonic offsets**: each append continues every
  partition's offset sequence from its high-water mark, exactly like a
  broker log; offsets never repeat or regress.
- **append-only log + earliest/offset replay**: consumers can read
  from earliest or from an explicit per-partition offset map (the
  startingOffsets surface).

Both the batch reader and a ``readStream`` file-source reader return
the wire schema, so the SAME ``parse_kafka_records`` /
``kafka_payload`` topology that would run against the real connector
runs ungated here — swapping this double for the broker is a
format-string + options change, no topology change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the kafka source's exact output schema (integration guide, "Each row
# in the source has the following schema")
WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


class FileTopicLog:
    """A directory of per-topic parquet logs with broker-faithful
    partition/offset assignment. One instance = one 'cluster'."""

    def __init__(self, root: str, n_partitions: int = 4) -> None:
        self.root = root
        self.n_partitions = n_partitions

    def _topic_dir(self, topic: str) -> str:
        # topic names contain dots; keep them verbatim as a directory
        d = os.path.join(self.root, topic)
        old = d + ".old"
        if not os.path.isdir(d) and os.path.isdir(old):
            # crash recovery: a compact() that died between its two
            # renames left the whole pre-compact log at .old — restore
            # it (the .compacting staging dir holds only copies and is
            # re-derivable). Two concurrent readers can both see the
            # crash state; the rename is the atomic arbiter, and the
            # loser just proceeds with the healed dir.
            try:
                os.rename(old, d)
            except OSError:
                if not os.path.isdir(d):
                    raise
        return d

    def _wire_rows(
        self, payload: DataFrame, topic: str, base: DataFrame, ts
    ) -> DataFrame:
        """The shared produce projection: wire columns with keyed
        partitions and offsets continuing ``base``'s high-water marks.

        The per-partition row_number is a bounded window: one append
        batch's rows per partition (a micro-batch, not the corpus) —
        the same per-partition sequencing a broker serializes anyway.
        """
        part = (
            F.crc32(F.coalesce(F.col("key"), F.lit("")).cast("binary"))
            % self.n_partitions
        ).cast("int")
        w = Window.partitionBy("partition").orderBy("key", "value")
        return (
            payload.select(
                F.col("key").cast("binary").alias("key"),
                F.col("value").cast("binary").alias("value"),
                F.lit(topic).alias("topic"),
                part.alias("partition"),
                ts.cast("timestamp").alias("timestamp"),
            )
            .withColumn("_seq", F.row_number().over(w).cast("long"))
            .join(F.broadcast(base), "partition", "left")
            .select(
                "key",
                "value",
                "topic",
                "partition",
                (F.coalesce(F.col("_hwm"), F.lit(0)) + F.col("_seq") - 1).alias(
                    "offset"
                ),
                "timestamp",
                F.lit(0).alias("timestampType"),  # 0 = CreateTime
            )
        )

    def produce(
        self,
        payload: DataFrame,
        topic: str,
        event_time=None,
    ) -> None:
        """Append (key string, value string) rows — the
        :func:`sources.kafka.kafka_payload` projection — to the topic
        log with broker semantics: partition = crc32(key) mod
        n_partitions (keyed contract: same key -> same partition),
        offsets continuing each partition's high-water mark, CreateTime
        timestamps (``event_time`` column or current_timestamp).
        At-least-once on retry (the real producer's default contract);
        :meth:`produce_epoch` is the idempotent variant."""
        spark = payload.sparkSession
        ts = event_time if event_time is not None else F.current_timestamp()
        out = self._wire_rows(
            payload, topic, self._high_water_marks(spark, topic), ts
        )
        out.write.mode("append").parquet(self._topic_dir(topic))

    def produce_epoch(
        self,
        payload: DataFrame,
        topic: str,
        epoch_id: int,
        event_time=None,
    ) -> None:
        """IDEMPOTENT produce — the S7 epoch-overwrite pattern applied
        to the topic log (VERDICT r11 item 6): epoch ``epoch_id``'s
        records live in their own ``epoch-<id>`` subdirectory, written
        with OVERWRITE, and their offsets continue the high-water marks
        of the log EXCLUDING this epoch — so a replayed micro-batch
        (foreachBatch re-delivery after a crash) rewrites exactly the
        same records at exactly the same offsets instead of appending
        duplicates. Kafka's own transactional/idempotent producer gives
        the broker-side equivalent; downstream consumers need no dedup.

        Determinism: partition = crc32(key); per-partition sequence
        ordered by (key, value); default timestamp =
        ``timestamp_seconds(epoch_id)`` (stream time, NOT wall clock —
        a wall-clock default would break replay byte-identity; pass
        ``event_time`` to use a data-derived time instead)."""
        if int(epoch_id) in self._folded_epochs(topic):
            raise ValueError(
                f"epoch {epoch_id} of '{topic}' was folded by compaction; "
                "replaying it would append duplicates at shifted offsets "
                "(compact() preserves only the ACTIVE epoch's replayability)"
            )
        ts = (
            event_time
            if event_time is not None
            else F.timestamp_seconds(F.lit(int(epoch_id)))
        )
        spark = payload.sparkSession
        base = self._high_water_marks(
            spark, topic, exclude_epoch=int(epoch_id)
        )
        out = self._wire_rows(payload, topic, base, ts)
        out.write.mode("overwrite").parquet(
            os.path.join(self._topic_dir(topic), f"epoch-{epoch_id}")
        )

    def _log_paths(
        self, topic: str, exclude_epoch: int | None = None
    ) -> list[str]:
        """Every readable piece of the topic log: the flat top-level
        parquet files (plain appends) plus each ``epoch-<id>`` subdir,
        minus ``exclude_epoch`` (so an epoch's rewrite never counts its
        own previous attempt into the offset base)."""
        d = self._topic_dir(topic)
        if not os.path.isdir(d):
            return []
        paths: list[str] = []
        # flat files listed individually (listing the directory would
        # also sweep in the epoch subdirs, double-counting them)
        paths.extend(
            os.path.join(d, e)
            for e in sorted(os.listdir(d))
            if e.endswith(".parquet") and not e.startswith(("_", "."))
        )
        for e in sorted(os.listdir(d)):
            if e.startswith("epoch-") and os.path.isdir(os.path.join(d, e)):
                if exclude_epoch is not None and e == f"epoch-{exclude_epoch}":
                    continue
                paths.append(os.path.join(d, e))
        return paths

    def _read_log(
        self,
        spark: SparkSession,
        topic: str,
        exclude_epoch: int | None = None,
    ) -> DataFrame:
        paths = self._log_paths(topic, exclude_epoch)
        if not paths:
            return spark.createDataFrame([], WIRE_SCHEMA)
        return spark.read.schema(WIRE_SCHEMA).parquet(*paths)

    def _high_water_marks(
        self,
        spark: SparkSession,
        topic: str,
        exclude_epoch: int | None = None,
    ) -> DataFrame:
        """(partition, _hwm) — next offset per partition; empty frame
        for a fresh topic. Bounded: n_partitions rows."""
        try:
            return (
                self._read_log(spark, topic, exclude_epoch)
                .groupBy("partition")
                .agg((F.max("offset") + 1).alias("_hwm"))
            )
        except Exception:  # noqa: BLE001  (dir exists but no files yet)
            return spark.createDataFrame([], "partition int, _hwm long")

    def read_batch(
        self,
        spark: SparkSession,
        topic: str,
        starting_offsets: dict[int, int] | str = "earliest",
    ) -> DataFrame:
        """Wire-schema batch read (flat appends + epoch subdirs).
        ``starting_offsets`` is 'earliest' or a {partition: first
        offset} map (the startingOffsets JSON surface, inclusive
        semantics like the connector's)."""
        df = self._read_log(spark, topic)
        if starting_offsets == "earliest":
            return df
        if isinstance(starting_offsets, dict):
            start = spark.createDataFrame(
                [(int(p), int(o)) for p, o in starting_offsets.items()],
                "partition int, _start long",
            )
            return (
                df.join(F.broadcast(start), "partition", "left")
                .filter(
                    F.col("_start").isNull() | (F.col("offset") >= F.col("_start"))
                )
                .drop("_start")
            )
        raise ValueError(f"starting_offsets: {starting_offsets!r}")

    _MANIFEST = "_compacted.json"  # leading _ : invisible to Spark reads

    def _folded_epochs(self, topic: str) -> set[int]:
        path = os.path.join(self._topic_dir(topic), self._MANIFEST)
        if not os.path.isfile(path):
            return set()
        import json

        with open(path) as fh:
            return set(json.load(fh))

    def compact(self, spark: SparkSession, topic: str) -> None:
        """Model Kafka LOG COMPACTION for a keyed topic: keep only each
        key's record with the highest offset per partition, PRESERVING
        original offsets (gaps remain, exactly as on a real broker —
        consumers must never assume dense offsets on a compacted
        topic). This is the broker-side mechanism the reference's
        latest-state semantics lean on (cleanup.policy=compact); the
        engine-side equivalent is dedup_latest_state/SCD2. NULL-key
        records are kept untouched (a real broker refuses them on
        compacted topics; the double preserves rather than drops).

        The ACTIVE segment — the highest-id epoch subdir — is never
        cleaned, exactly like the broker's log cleaner: the only
        micro-batch a checkpointed stream can ever replay is its last
        epoch, so preserving it keeps produce_epoch's replay
        idempotency intact across compaction. Older epochs fold into
        the compacted flat log and are recorded in a manifest;
        produce_epoch REFUSES a folded epoch id (a stale replay would
        otherwise append duplicates at shifted offsets — loud beats
        silent).

        Crash/concurrency posture (a maintenance op, single-writer like
        the broker's cleaner): the staging dir gets a COPY of the
        active epoch (never a move — the ``.old`` heal source must stay
        complete through every crash window), then two renames swap it
        in; a crash between them is healed on the next access by
        restoring the full pre-compact log from ``.old``, which is then
        kept until the NEXT compact for post-mortem value. Run it in a
        maintenance window: a reader racing the swap can observe a
        momentarily-empty topic or a dead pre-swap file path, and a
        LIVE checkpointed ``read_stream`` consumer will RE-RECEIVE the
        folded records after compaction (the file source tracks
        part-file paths; the rewrite lands under fresh names — the same
        isolation gap as the exactly-once caveat; real consumers track
        offsets, which compaction preserves)."""
        import json
        import shutil

        d = self._topic_dir(topic)
        if not os.path.isdir(d):
            # never-produced topic: compacting nothing is a no-op, the
            # same fresh-topic posture as read()/offsets() (ADVICE r12
            # — this used to escape as a bare FileNotFoundError from
            # os.listdir)
            return
        tmp, old = d + ".compacting", d + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)  # deferred from last compact
        epochs = sorted(
            (int(e.split("-", 1)[1]), e)
            for e in os.listdir(d)
            if e.startswith("epoch-")
            and os.path.isdir(os.path.join(d, e))
            and e.split("-", 1)[1].isdigit()
        )
        active = epochs[-1][1] if epochs else None
        folded = self._folded_epochs(topic) | {i for i, _ in epochs[:-1]}
        fold_paths = [
            p
            for p in self._log_paths(topic)
            if active is None or p != os.path.join(d, active)
        ]
        os.makedirs(tmp)
        if fold_paths:
            df = spark.read.schema(WIRE_SCHEMA).parquet(*fold_paths)
            w = Window.partitionBy("partition", "key").orderBy(
                F.col("offset").desc()
            )
            keyed = (
                df.filter(F.col("key").isNotNull())
                .withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1)
                .drop("_r")
            )
            compacted = keyed.unionByName(df.filter(F.col("key").isNull()))
            compacted.select(*[f.name for f in WIRE_SCHEMA.fields]).write.mode(
                "overwrite"
            ).parquet(tmp)
        with open(os.path.join(tmp, self._MANIFEST), "w") as fh:
            json.dump(sorted(folded), fh)
        if active is not None:
            # COPY, never move: until the final rename lands, the only
            # complete log must remain at d/.old — a move would strand
            # the active epoch's sole copy in the re-derivable staging
            # dir, where the next compact's rmtree destroys it
            shutil.copytree(
                os.path.join(d, active), os.path.join(tmp, active)
            )
        os.rename(d, old)
        os.rename(tmp, d)
        # .old intentionally kept until the next compact (see docstring)

    def read_stream(self, spark: SparkSession, topic: str) -> DataFrame:
        """Wire-schema ``readStream`` over the topic log (file source:
        each appended parquet file becomes a micro-batch) — the shape
        that lets the SAME streaming topology (parse -> watermark ->
        window/state -> sink) run ungated in this sandbox."""
        return (
            spark.readStream.schema(WIRE_SCHEMA)
            .option("maxFilesPerTrigger", "8")
            # epoch-<id> subdirs (produce_epoch) are part of the log
            .option("recursiveFileLookup", "true")
            .parquet(self._topic_dir(topic))
        )

    def stream_sink(self, payload_stream: DataFrame, topic: str, checkpoint: str):
        """S4 as a STREAM: write a streaming (key, value) payload frame
        — the :func:`sources.kafka.kafka_payload` projection — to the
        topic log via ``foreachBatch`` + :meth:`produce`. Each
        micro-batch appends with broker semantics (keyed partitions,
        high-water-mark offsets), so a downstream consumer of the same
        topic sees exactly what the real kafka sink would publish.
        Exactly-once note: foreachBatch is at-least-once on retry, the
        same contract as the real kafka sink with a plain producer —
        downstream keyed dedup (ST9) is the idempotence layer. For the
        transactional-producer equivalent use
        :meth:`stream_sink_exactly_once`."""

        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.produce(batch_df, topic)

        return (
            payload_stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
        )

    def stream_sink_exactly_once(
        self, payload_stream: DataFrame, topic: str, checkpoint: str
    ):
        """S4/ST3 as an EXACTLY-ONCE stream (VERDICT r11 item 6): each
        micro-batch produces via :meth:`produce_epoch` keyed on the
        foreachBatch ``epoch_id``, so a re-delivered micro-batch (crash
        between produce and checkpoint commit) OVERWRITES its own epoch
        with byte-identical records at identical offsets instead of
        appending duplicates — the epoch-idempotent S7 lake pattern
        applied to the topic log, modeling Kafka's transactional
        producer. The LOG STATE is duplicate-free, so batch reads and
        fresh streaming consumers need no dedup layer. Caveat (the
        isolation gap a file double cannot close): a LIVE
        ``read_stream`` consumer tracks part-FILE paths, and a replay
        rewrites identical records under fresh file names — such a
        consumer can re-see the replayed epoch, exactly where real
        Kafka needs ``isolation.level=read_committed``; keyed dedup
        (ST9) remains the belt-and-braces layer for that window."""

        def handle(batch_df: DataFrame, epoch_id: int) -> None:
            self.produce_epoch(batch_df, topic, epoch_id)

        return (
            payload_stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
        )
