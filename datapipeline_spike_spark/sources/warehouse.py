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


def upsert_latest(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> int:
    """MERGE-style latest-state upsert for a plain-parquet state table
    (the reference's StarRocks PRIMARY KEY / Redis latest-state
    semantics without a transactional format): read current, union the
    update batch, keep the newest row per key (row_number over
    (ts, tiebreak) desc), commit the rewrite as a NEW VERSION DIRECTORY
    under the table root plus an atomic pointer-file update.

    Layout: ``{table_path}/v{N:06d}/`` parquet snapshots and a
    ``_CURRENT`` pointer file naming the live one. Commit = write
    v{N+1}, ``os.replace`` the pointer (atomic on POSIX), then prune
    versions older than the one just superseded — the superseded
    snapshot survives until the NEXT upsert, so a reader that resolved
    the pointer a moment before the swap still finds every file of its
    snapshot on disk. Readers resolve via :func:`read_state_table`;
    this replaces the old delete+rename-of-the-live-path swap whose
    mid-swap window could 404 a concurrent reader (test-proven by a
    polling reader under repeated upserts).

    Semantics: idempotent (re-applying a batch changes nothing — the
    same winners win) and out-of-order-safe (a LATE update older than
    the stored row loses the window and is discarded, exactly the
    PRIMARY-KEY-table replace-if-newer rule). Returns the table's row
    count after the merge.

    Scale notes: the rewrite is table-sized — the classic copy-on-write
    merge. Production bounds it by PARTITIONING the state table on a
    key prefix and rewriting only partitions the batch touches (the
    compact_zone pattern); a format with deletion vectors (Delta/
    Iceberg) turns this into a metadata operation. Single-writer
    assumption, like every non-transactional parquet rewrite."""
    from pyspark.sql import Window

    current = read_state_table(spark, table_path)
    merged = current.unionByName(updates) if current is not None else updates
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    commit_version(latest, table_path)
    out = read_state_table(spark, table_path)
    assert out is not None
    return out.count()


def commit_version(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the table's next version directory and commit it
    with an atomic ``_CURRENT`` pointer replace; prune versions older
    than the one just superseded (kept one commit interval for
    in-flight readers). Returns the committed version number. The
    commit primitive behind :func:`upsert_latest` and
    :func:`scd2_upsert`."""
    import os
    import shutil

    gen = _current_version(table_path) + 1
    vdir = os.path.join(table_path, f"v{gen:06d}")
    df.write.mode("overwrite").parquet(vdir)
    ptmp = os.path.join(table_path, "_CURRENT.tmp")
    with open(ptmp, "w") as f:
        f.write(f"v{gen:06d}")
    os.replace(ptmp, os.path.join(table_path, "_CURRENT"))
    for d in os.listdir(table_path):
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < gen - 1:
            shutil.rmtree(os.path.join(table_path, d), ignore_errors=True)
    return gen


def _current_version(table_path: str) -> int:
    """The committed version number (0 = table absent/uninitialized)."""
    import os

    p = os.path.join(table_path, "_CURRENT")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip().lstrip("v"))


def read_state_table(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Resolve the ``_CURRENT`` pointer and read the live snapshot.
    Returns None for an uninitialized table. A plain-parquet directory
    without a pointer (pre-versioning layout) reads directly."""
    import os

    from pyspark.sql.utils import AnalysisException

    gen = _current_version(table_path)
    if gen:
        return spark.read.parquet(os.path.join(table_path, f"v{gen:06d}"))
    try:
        return spark.read.parquet(table_path)
    except AnalysisException:  # absent table; anything else propagates
        return None


def scd2_upsert(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    keys: list[str],
    state_col: str,
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> int:
    """Incremental SCD2 MERGE: fold a micro-batch of change events into
    a stored type-2 history table (the streaming deployment of
    ``operators.sessions.scd2_history`` — what a warehouse MERGE with
    update-old-close-new-open does, per batch).

    Incremental by KEY, not by table: untouched keys' intervals are
    carried over verbatim; for keys present in the batch, the stored
    intervals are replayed as change points (each version contributes
    its ``valid_from`` AND its ``last_event_ts`` — the run's boundary
    timestamps, which are exactly the information an interval table
    retains), unioned with the batch, and rebuilt through the SAME
    ``scd2_history``. Re-applying a batch is a no-op (duplicate change
    points collapse into their runs).

    Exactness contract (differential-tested): for PER-KEY IN-ORDER
    batches (every new event at or after the key's stored
    ``last_event_ts`` — the standard warehouse MERGE assumption) the
    incremental result is identical to recomputing from the full event
    log. A LATE event that lands BETWEEN stored versions also splices
    exactly. The one approximate case is a late event strictly inside a
    multi-event run: the run's interior events were collapsed away at
    admission (that is what an interval table is), so the rebuild
    splits the run at the late event and at the run's preserved
    boundaries rather than at the unrecorded interior event — exact
    reconstruction there requires replaying the raw event log, which
    production keeps in the lake anyway. Per-batch cost: batch-keyed
    joins + a rebuild of ONLY the affected keys' intervals — at 100 TB
    the carried-over side is a file-level copy of interval rows, never
    a re-derivation from raw events.

    Commits via :func:`commit_version` (atomic pointer swap, no reader
    404 window). Returns the committed version number. Replayed change
    points use tiebreaks below -2^39, ordering them before any
    same-timestamp batch event (batch tiebreaks are assumed
    non-negative ids)."""
    hist_cols = [
        *keys, state_col, "valid_from", "valid_to", "last_event_ts",
        "version", "is_current",
    ]
    from datapipeline_spike_spark.operators.sessions import scd2_history

    ev = changes.select(*keys, state_col, F.col(ts_col), F.col(tiebreak))
    current = read_state_table(spark, table_path)
    if current is None:
        new_table = scd2_history(ev, keys, state_col, ts_col, tiebreak)
    else:
        batch_keys = ev.select(*keys).distinct()
        untouched = current.join(F.broadcast(batch_keys), keys, "left_anti")
        affected = current.join(F.broadcast(batch_keys), keys, "left_semi")
        replay_open = affected.select(
            *keys,
            F.col(state_col),
            F.col("valid_from").alias(ts_col),
            (F.col("version").cast("long") * 2 - F.lit(1 << 40)).alias(tiebreak),
        )
        replay_last = affected.select(
            *keys,
            F.col(state_col),
            F.col("last_event_ts").alias(ts_col),
            (F.col("version").cast("long") * 2 + 1 - F.lit(1 << 40)).alias(tiebreak),
        )
        rebuilt = scd2_history(
            replay_open.unionByName(replay_last).unionByName(ev),
            keys, state_col, ts_col, tiebreak,
        )
        new_table = untouched.select(*hist_cols).unionByName(
            rebuilt.select(*hist_cols)
        )
    return commit_version(new_table.select(*hist_cols), table_path)


DASHBOARD_VIEWS = {
    # canned Grafana-style panels over the serving views (reference
    # README.md:36,188: StarRocks + Grafana dashboarding): each is plain
    # Spark SQL over `serving_features`, so any JDBC/Thrift client (the
    # actual Grafana connection path for Spark) can SELECT them.
    "dash_feature_trend": """
        SELECT date_trunc('hour', SourceTimestamp) AS hour,
               event_type,
               round(avg(value), 6)  AS avg_value,
               round(max(value), 6)  AS max_value,
               count(*)              AS n_records
        FROM serving_features
        GROUP BY 1, 2
    """,
    "dash_latest_status": """
        SELECT event_type,
               max(SourceTimestamp) AS last_seen,
               count(*)             AS n_total
        FROM serving_features
        GROUP BY 1
    """,
}


def create_serving_views(
    spark: SparkSession, features: DataFrame, prefix: str = ""
) -> list[str]:
    """S11 serving layer: register the feature frame as the
    ``serving_features`` view plus the canned dashboard views over it —
    the SQL surface a Grafana/JDBC client queries (dashboard rendering
    itself is out of scope by contract; the QUERIES behind the panels
    are the engine's job). Views are lazy (no materialization): each
    dashboard refresh plans against current data, with Catalyst pruning
    and pushdown applying as for any query. Returns the registered view
    names."""
    base = f"{prefix}serving_features"
    features.createOrReplaceTempView(base)
    names = [base]
    for name, sql in DASHBOARD_VIEWS.items():
        vname = f"{prefix}{name}"
        spark.sql(
            f"CREATE OR REPLACE TEMP VIEW {vname} AS "
            + sql.replace("serving_features", base)
        )
        names.append(vname)
    return names
