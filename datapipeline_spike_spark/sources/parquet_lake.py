"""Partitioned parquet data lake (SURVEY.md §2.1 S7, S10).

Reference layout (reference/README.md:541-573): hive-style
``{zone}/machine_MXX/YYYY/MM/*.parquet`` with raw + processed zones,
quality-routed writes (raw zone keeps everything regardless of quality,
reference/README.md:623-626) and JSON metadata sidecars.

Spark-native: ``partitionBy`` columns derive year/month from the event
time; readers get static + dynamic partition pruning for free. At
100 TB the partition grain (machine x month) keeps file counts sane;
per-day would be the first tuning knob.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ("machine", "year", "month")


def with_partition_cols(df: DataFrame, ts_col: str, machine_col: str = "machine") -> DataFrame:
    out = df
    if machine_col != "machine":
        out = out.withColumn("machine", F.col(machine_col))
    return out.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))


def write_zone(
    df: DataFrame,
    lake_root: str,
    zone: str,
    ts_col: str = "ts",
    machine_col: str = "machine",
    mode: str = "append",
) -> str:
    """Write one zone partitioned by machine/year/month + JSON sidecar
    (reference metadata files, README.md:566-571)."""
    path = os.path.join(lake_root, zone)
    part = with_partition_cols(df, ts_col, machine_col)
    part.write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path)
    sidecar = {
        "zone": zone,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "partitioning": list(PARTITION_COLS),
        "schema": part.schema.jsonValue(),
    }
    with open(os.path.join(path, "_zone_metadata.json"), "w") as f:
        json.dump(sidecar, f)
    return path


def quality_routed_write(
    df: DataFrame,
    lake_root: str,
    quality_col: str,
    threshold: float,
    ts_col: str = "ts",
    machine_col: str = "machine",
) -> dict[str, str]:
    """S10 routing: raw zone stores EVERYTHING; processed zone only
    rows passing the quality gate (reference/README.md:623-626)."""
    raw = write_zone(df, lake_root, "raw", ts_col, machine_col)
    processed = write_zone(
        df.filter(F.col(quality_col) >= threshold), lake_root, "processed", ts_col, machine_col
    )
    return {"raw": raw, "processed": processed}


def read_zone(spark: SparkSession, lake_root: str, zone: str) -> DataFrame:
    """Partition-pruned read: filters on machine/year/month never touch
    non-matching directories."""
    return spark.read.parquet(os.path.join(lake_root, zone))


def compact_zone(
    spark: SparkSession,
    lake_root: str,
    zone: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict[str, dict[str, int]]:
    """Small-file compaction — the lake maintenance job every streaming
    ingest needs: micro-batch appends leave each partition with many
    KB-sized files, and at 100 TB the resulting open/seek/footer costs
    dominate scans long before data volume does.

    Per hive partition directory: if it holds >= ``min_files_to_compact``
    data files, rewrite it as ``ceil(bytes / target_file_bytes)`` files.
    The rewrite goes to a temp directory first and swaps in with two
    renames (local/HDFS semantics; an object-store deployment would
    commit via manifest instead — same topology, different commit
    primitive). Readers of OTHER partitions are never touched: this is
    a per-partition operation, safe to run partition-parallel and
    incremental.

    Returns {partition_rel_path: {"files_before": n, "files_after": m}}.
    """
    import math
    import shutil

    zone_root = os.path.join(lake_root, zone)
    report: dict[str, dict[str, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(zone_root):
        data_files = [f for f in filenames if f.endswith(".parquet")]
        if len(data_files) < min_files_to_compact:
            continue
        total = sum(os.path.getsize(os.path.join(dirpath, f)) for f in data_files)
        n_out = max(1, math.ceil(total / target_file_bytes))
        if n_out >= len(data_files):
            continue  # already at or below target granularity
        rel = os.path.relpath(dirpath, zone_root)
        tmp = dirpath + "._compacting"
        # partition columns are encoded in the directory name, not the
        # files — read/write the directory alone, no partition discovery
        spark.read.parquet(dirpath).coalesce(n_out).write.mode("overwrite").parquet(tmp)
        old = dirpath + "._old"
        os.rename(dirpath, old)
        os.rename(tmp, dirpath)
        shutil.rmtree(old)
        n_after = len(
            [f for f in os.listdir(dirpath) if f.endswith(".parquet")]
        )
        report[rel] = {"files_before": len(data_files), "files_after": n_after}
    return report
