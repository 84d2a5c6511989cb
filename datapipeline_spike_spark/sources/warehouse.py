"""OLAP warehouse sink (SURVEY.md §2.1 S8).

The reference lands features in a StarRocks table
(reference/FeatureEngineeringApproaches.md:93-110): ``DUPLICATE
KEY(SourceTimestamp)`` (sort-key ordering, append semantics) and
``DISTRIBUTED BY HASH(SourceTimestamp) BUCKETS 8``, fed continuously by
a Routine Load job (ibid:113-153). Spark-native mapping:

- table         -> managed parquet table via ``saveAsTable``
- DUPLICATE KEY -> plain append + ``sortBy`` within buckets
- HASH BUCKETS  -> ``bucketBy(8, key)`` — co-locates future joins/aggs
                   on the key without a shuffle (Spark reads bucket
                   files as pre-shuffled input)
- Routine Load  -> a Structured Streaming kafka->table query
                   (sources/kafka.py + streaming/pipeline.py); batch
                   backfill uses this module directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark SQL rendering of the reference DDL
# (reference/FeatureEngineeringApproaches.md:93-110) — columns 1:1, types
# mapped DATETIME->TIMESTAMP, VARCHAR(16)->STRING, DOUBLE NULL->DOUBLE.
FEATURE_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS {name} (
    SourceTimestamp   TIMESTAMP NOT NULL,
    machine           STRING,
    operation         STRING,
    vibration_x_rms   DOUBLE,
    vibration_y_rms   DOUBLE,
    vibration_z_rms   DOUBLE,
    vibration_x_peak  DOUBLE,
    vibration_y_peak  DOUBLE,
    vibration_z_peak  DOUBLE,
    vibration_x_kurtosis DOUBLE,
    vibration_y_kurtosis DOUBLE,
    vibration_z_kurtosis DOUBLE
)
USING PARQUET
CLUSTERED BY (SourceTimestamp) INTO {buckets} BUCKETS
{location}
"""


def create_feature_table(
    spark: SparkSession,
    name: str = "bosch_vibration_features",
    path: str | None = None,
    buckets: int = 8,
) -> None:
    location = f"LOCATION '{path}'" if path else ""
    spark.sql(FEATURE_TABLE_DDL.format(name=name, buckets=buckets, location=location))


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str = "SourceTimestamp",
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Append/overwrite a hash-bucketed, sort-keyed managed table — the
    engine's equivalent of StarRocks' DISTRIBUTED BY HASH + DUPLICATE
    KEY. Downstream equi-joins and aggregations on ``bucket_col`` read
    the buckets as pre-shuffled partitions (no exchange)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(name)
    )


# Wire shape of one merged-topic record (the Routine Load input,
# reference/FeatureEngineeringApproaches.md:155-194): per-axis sample
# batch arrays + source timestamp + machine/operation labels.
RECORD_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("SourceTimestamp", T.TimestampType()),
        T.StructField("machine", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("VibrationXBatch", T.ArrayType(T.DoubleType())),
        T.StructField("VibrationYBatch", T.ArrayType(T.DoubleType())),
        T.StructField("VibrationZBatch", T.ArrayType(T.DoubleType())),
    ]
)


def routine_load_features(parsed: DataFrame) -> DataFrame:
    """The Routine Load COLUMNS clause as a Spark projection
    (reference/FeatureEngineeringApproaches.md:229-238): the 9 features
    are computed DURING load from the batch arrays — StarRocks'
    ``sqrt(array_avg(array_map(x -> x*x, arr)))`` family maps 1:1 onto
    the engine's HOF feature expressions (functions.features), so the
    load-transform and the query path share one implementation. Input
    is the parsed wire record (RECORD_WIRE_SCHEMA columns)."""
    from datapipeline_spike_spark.functions import features as feat

    axes = {"x": "VibrationXBatch", "y": "VibrationYBatch", "z": "VibrationZBatch"}
    cols = [F.col("SourceTimestamp"), F.col("machine"), F.col("operation")]
    cols += [feat.arr_rms(c).alias(f"vibration_{a}_rms") for a, c in axes.items()]
    cols += [feat.arr_peak(c).alias(f"vibration_{a}_peak") for a, c in axes.items()]
    cols += [feat.arr_kurtosis(c).alias(f"vibration_{a}_kurtosis") for a, c in axes.items()]
    return parsed.select(*cols)


def start_routine_load(
    feature_stream: DataFrame,
    name: str,
    path: str,
    checkpoint: str,
    bucket_col: str = "SourceTimestamp",
    n_buckets: int = 8,
):
    """S8's continuous-load analogue: a Structured Streaming query that
    appends each micro-batch into the hash-bucketed feature table —
    StarRocks' Routine Load loop (consume -> transform -> distributed
    write, reference/FeatureEngineeringApproaches.md:113-153) becomes
    checkpointed micro-batches. ``foreachBatch`` is the mechanism
    because a bucketed ``saveAsTable`` append is a batch-writer feature;
    each batch lands bucket-aligned, so downstream joins/aggs on the
    bucket key stay exchange-free. Returns the started query handle."""

    def append_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", path)
            .saveAsTable(name)
        )

    return (
        feature_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(append_batch)
        .start()
    )
