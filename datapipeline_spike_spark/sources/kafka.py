"""Kafka-shaped source/sink builders (SURVEY.md §2.1 S3-S6, S8-S9).

The reference's record path is Kafka end-to-end: consume ``cnc.raw``
(group preprocessing-service, latest offsets, JSON values,
reference/README.md:196-204), produce processed records keyed by id to
``cnc.processed`` (reference/README.md:264-270), retry topic
``cnc.raw.retry`` and DLQ ``cnc.raw.dlq`` (reference/README.md:342-388).

Spark mapping: Structured Streaming's kafka source/sink; offsets live
in the checkpoint (replacing manual commit), delivery is
at-least-once + keyed dedup downstream (ST9) for effective
exactly-once. The kafka connector jar is not on this environment's
classpath, so builders raise a clear error when exercised without it;
the topology (options, projections) is still unit-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPIC_RAW = "cnc.raw"
TOPIC_PROCESSED = "cnc.processed"
TOPIC_RETRY = "cnc.raw.retry"
TOPIC_DLQ = "cnc.raw.dlq"
MAX_RETRIES = 5  # reference/README.md:98-100


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def read_raw_stream(
    spark: SparkSession,
    bootstrap: str,
    value_schema: T.StructType,
    topic: str = TOPIC_RAW,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100,
) -> DataFrame:
    """S3 consumer: kafka -> typed columns via from_json. Batch sizing
    (reference BATCH_SIZE=100) maps to maxOffsetsPerTrigger (ST6)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("rec"),
        "timestamp",
    ).select("key", "rec.*", F.col("timestamp").alias("kafka_ts"))


def to_kafka_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str = TOPIC_PROCESSED,
    key_col: str = "id",
    checkpoint: str | None = None,
):
    """S4 producer: JSON-serialize the row, key by record id
    (reference keyed produce, README.md:264-270)."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
