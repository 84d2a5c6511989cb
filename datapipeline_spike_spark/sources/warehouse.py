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
