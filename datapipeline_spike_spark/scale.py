"""Scale-posture helpers shared by operators and catalog queries.

At 100 TB a parquet scan arrives in thousands of splits and Spark's
task scheduling saturates every core. At test scale a table can be a
single small file = a single input split, which serializes CPU-heavy
expression work (notably interpreted higher-order-function lambdas like
shingling) onto one core. ``fan_out`` repartitions ONLY in that
degenerate case, so the big-data path never pays an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan has fewer splits
    than cores; no-op otherwise. Use ahead of per-row CPU-heavy work
    (shingling, hashing, vector math) — the shuffle it may introduce
    moves only the tiny under-split input."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
