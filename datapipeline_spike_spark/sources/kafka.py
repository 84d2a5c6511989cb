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
classpath, so builders raise a clear error when exercised without it.
The parse/produce topology itself runs UNGATED against
``sources/kafka_double.FileTopicLog`` (r11): a parquet log with the
connector's exact wire schema and broker semantics (keyed
partitioning, per-partition monotonic offsets, offset replay), batch
and readStream — tests/test_kafka_double.py drives the full cycle.
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


KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:{spark_version}"


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def require_kafka(spark: SparkSession) -> None:
    """Jar gate: the sandbox has no network (vendoring the connector was
    attempted and is impossible — see COVERAGE.md S3'), so builders fail
    fast with the exact deployment invocation instead of an opaque
    ClassNotFoundException from deep inside the source resolution."""
    if not kafka_available(spark):
        pkg = KAFKA_PACKAGE.format(spark_version=spark.version)
        raise RuntimeError(
            "kafka connector not on the classpath; launch with "
            f"spark-submit --packages {pkg} (or add the jar to spark.jars)"
        )


def parse_kafka_records(raw: DataFrame, value_schema: T.StructType) -> DataFrame:
    """The S3/S9 wire projection, separated from the source so it is
    batch-testable without the connector: kafka's (key, value, timestamp)
    binary columns -> typed record columns via from_json."""
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("rec"),
        "timestamp",
    ).select("key", "rec.*", F.col("timestamp").alias("kafka_ts"))


def kafka_payload(df: DataFrame, key_col: str = "id") -> DataFrame:
    """The S4/S9 produce projection (inverse of parse_kafka_records):
    JSON-serialize the row, key by record id (reference keyed produce,
    README.md:264-270). Batch-testable without the connector."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )


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
    require_kafka(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_kafka_records(reader.load(), value_schema)


def to_kafka_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str = TOPIC_PROCESSED,
    key_col: str = "id",
    checkpoint: str | None = None,
):
    """S4 producer sink over :func:`kafka_payload`."""
    require_kafka(df.sparkSession)
    writer = (
        kafka_payload(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
