"""The query catalog — one registered entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle (or an explicit rows-only
marker for non-SQL-expressible operators).

Domain mapping (FIXTURES.md §B): the driver's ``events`` table stands in
for the reference's 1 Hz vibration record stream — ``ts`` is
SourceTimestamp, ``user_id`` the machine id, ``event_type`` the
StatusCode, ``value`` the vibration sample. TPC-H-ish tables exercise
the general relational surface; ``documents``/``embeddings`` back the
north-star extension operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import features as feat
from datapipeline_spike_spark.plans.registry import load, register

R = 6  # rounding decimals applied on BOTH engine and oracle sides


# ---------------------------------------------------------------------------
# Pipeline-semantics queries (events ≙ vibration stream)
# ---------------------------------------------------------------------------


@register(
    "vibration_features",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)     AS window_start,
           event_type                                   AS status_code,
           count(*)                                     AS n_samples,
           round(sqrt(avg(value * value)), {R})         AS rms,
           round(max(abs(value)), {R})                  AS peak,
           round(max(value) - min(value), {R})          AS peak_to_peak,
           round(max(abs(value)) / sqrt(avg(value * value)), {R}) AS crest_factor,
           round(kurtosis_pop(value), {R})              AS kurtosis
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    HAVING count(*) >= 4
    """,
    doc="""FLAGSHIP (SURVEY §2.4 A1-A5, A8/A9 + §7.2 slice 0): the
    reference's 1-minute feature-extraction window — collect samples per
    machine window, emit rms/peak/peak-to-peak/crest/kurtosis
    (reference/TechSpikeDataPipeline.md:55-65, FeatureEngineeringApproaches.md:20-38).
    Tumbling window sized to the testdata's time density (1 day); the
    streaming twin in streaming/pipeline.py uses the same aggregate
    expressions over F.window(). Kurtosis = population excess (m4/m2^2-3),
    hence kurtosis_pop in the oracle.""",
    tags=("aggregate", "window", "flagship"),
)
def q_vibration_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(feat.rms_agg("value"), R).alias("rms"),
            F.round(feat.peak_agg("value"), R).alias("peak"),
            F.round(feat.peak_to_peak_agg("value"), R).alias("peak_to_peak"),
            F.round(feat.crest_factor_agg("value"), R).alias("crest_factor"),
            F.round(feat.kurtosis_agg("value"), R).alias("kurtosis"),
        )
        .filter(F.col("n_samples") >= 4)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type").alias("status_code"),
            "n_samples",
            "rms",
            "peak",
            "peak_to_peak",
            "crest_factor",
            "kurtosis",
        )
    )


@register(
    "downsample_1h",
    oracle=f"""
    SELECT date_trunc('hour', ts)               AS bucket,
           count(*)                             AS n,
           round(sqrt(avg(value * value)), {R}) AS rms,
           round(avg(value), {R})               AS mean_value
    FROM events
    GROUP BY 1
    """,
    doc="""A8 temporal downsample (reference/TechSpikeDataPipeline.md:50-53:
    10 raw points -> 1 RMS record). Batch twin of the streaming 1-s window,
    scaled to testdata density (hourly).""",
    tags=("aggregate", "window"),
)
def q_downsample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(feat.rms_agg("value"), R).alias("rms"),
            F.round(F.avg("value"), R).alias("mean_value"),
        )
    )


@register(
    "record_envelope_flat",
    oracle=f"""
    SELECT date_trunc('hour', ts)                         AS SourceTimestamp,
           'M' || CAST(user_id % 2 AS VARCHAR)            AS machine,
           round(sqrt(avg(value * value)), {R})           AS vibration_x_rms,
           round(max(abs(value)), {R})                    AS vibration_x_peak,
           round(kurtosis_pop(value), 4)                  AS vibration_x_kurtosis,
           round(sqrt(avg((value + 1) * (value + 1))), {R}) AS vibration_y_rms,
           round(max(abs(value + 1)), {R})                AS vibration_y_peak,
           round(kurtosis_pop(value + 1), 4)              AS vibration_y_kurtosis,
           round(sqrt(avg(4 * value * value)), {R})       AS vibration_z_rms,
           round(max(abs(2 * value)), {R})                AS vibration_z_peak,
           round(kurtosis_pop(2 * value), 4)              AS vibration_z_kurtosis
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="""Entry-point A + B end-to-end under the driver's gate: record
    synthesis (per machine-hour triaxial batches) -> the full nested
    enrichment envelope (pipeline.enrich_records, gate disabled so all
    groups surface) -> warehouse flattening to the 9-feature OLAP row
    (reference/FeatureEngineeringApproaches.md:93-110). The oracle
    recomputes every per-axis statistic directly from the scalar events
    (y = x+1, z = 2x synthesis transforms are replayed in SQL), so the
    whole array-HOF feature path is hash-verified, not just counted.""",
    tags=("pipeline", "envelope", "flagship"),
)
def q_record_envelope_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.pipeline import (
        enrich_records,
        flatten_envelope,
        records_from_events,
    )

    recs = records_from_events(load(spark, sf_dir, "events"))
    flat = flatten_envelope(enrich_records(recs, drop_invalid=False))
    feature_cols = [c for c in flat.columns if c.startswith("vibration_")]
    # kurtosis rounds to 4dp: the two-pass HOF moments and DuckDB's
    # streaming kurtosis_pop differ by ~1e-6 on tiny groups, which flips
    # 6dp rounding boundaries at sf0.001
    return flat.select(
        "SourceTimestamp",
        "machine",
        *[
            F.round(F.col(c), 4 if c.endswith("kurtosis") else R).alias(c)
            for c in feature_cols
        ],
    )


@register(
    "status_route_counts",
    oracle="""
    SELECT event_type AS status_code,
           count(*)   AS n,
           CAST(sum(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY 1
    """,
    doc="""S10 quality-based routing + P2 validity gate as a batch
    profile: per-status counts and high-value counts
    (reference/README.md:623-626).""",
    tags=("filter", "routing"),
)
def q_status_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("status_code")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).alias("n_high"),
    )
