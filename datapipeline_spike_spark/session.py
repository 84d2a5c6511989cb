"""SparkSession factory with configs pinned for the engine.

Design notes (100 TB posture, SURVEY.md §4):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  broadcast demotion replace hand-tuned plans at scale.
- ``spark.sql.session.timeZone = UTC``: the reference loads with
  ``Asia/Singapore`` (reference/FeatureEngineeringApproaches.md:133); the
  engine standardizes on UTC so DuckDB oracle comparisons (UTC-naive
  timestamps) agree. Documented deviation.
- Shuffle partitions default to the local core count, not 200 — on a real
  cluster this is overridden to ~2-3x total executor cores; AQE coalesces
  downward either way.
- Arrow enabled: pandas_udf paths (FFT, PCA, embedding math) move data in
  columnar Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "datapipeline_spike_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode testing uses ``local[cpus]``; on a cluster the master and
    memory settings come from spark-submit and everything here still
    applies unchanged.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # guide §3.1: let the planner pick shuffled-hash over sort-merge
        # when its size conditions hold — skips both sort passes on
        # mid-size equi-joins (dedup assignment maps, verify joins).
        # Physical-plan-only: results and the DuckDB oracle unchanged;
        # AQE can still demote to SMJ, and a cluster deployment can
        # override via extra_conf like every other setting here.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type — read as long, converted in plans.registry.load
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
