"""Entry-point A — the reference's main record path, assembled
(SURVEY.md §3.1): triaxial sample-batch records -> validity gate ->
time-domain + frequency-domain features -> quality metrics -> the
nested enrichment envelope of reference/README.md:501-539.

One Column-expression chain shared by batch and streaming (the twin
rule, SURVEY §7.4.5): ``enrich_records`` works identically on a static
DataFrame and a streaming one, because every stage is a stateless
projection/filter. All per-record math runs on the embedded sample
arrays with higher-order functions — no explode, no shuffle; the only
Python is the FFT pandas UDF for the frequency features.

Engine-defined formulas (reference leaves the bodies unspecified,
SURVEY §7.4.1): validity = per-record crest-factor sanity (an impulsive
spike makes peak >> rms) plus non-empty batches; outlier_score =
min(max_axis_crest / 10, 1); quality = 0.5*completeness +
0.3*(1-outlier_score) + 0.2*consistency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import features as feat
from datapipeline_spike_spark.functions.spectral import dominant_frequency_bin

AXES = ("x", "y", "z")
PROCESSING_VERSION = "1.0"
CREST_VALID_MAX = 6.0  # |crest| above this flags an impulsive outlier record


def _axis_time_domain(batch_col: str) -> Column:
    return F.struct(
        feat.arr_rms(batch_col).alias("rms"),
        feat.arr_peak(batch_col).alias("peak"),
        feat.arr_peak_to_peak(batch_col).alias("peak_to_peak"),
        feat.arr_crest_factor(batch_col).alias("crest_factor"),
        feat.arr_kurtosis(batch_col).alias("kurtosis"),
    )


def _axis_freq_domain(batch_col: str) -> Column:
    return F.struct(
        dominant_frequency_bin(F.col(batch_col).cast("array<double>")).alias("dominant_bin"),
        feat.arr_energy(batch_col).alias("spectral_energy"),
    )


def enrich_records(records: DataFrame, drop_invalid: bool = True) -> DataFrame:
    """records: one row per machine-second with ``vibration_{x,y,z}_batch``
    array columns, ``ts``, ``machine``, ``status_code``. Returns the
    nested envelope (reference/README.md:501-539): raw_data,
    outlier_check, features.{time_domain,frequency_domain},
    quality_metrics, metadata. Invalid records are dropped when
    ``drop_invalid`` (the reference stops them at the gate,
    README.md:74-79)."""
    batches = {a: f"vibration_{a}_batch" for a in AXES}

    crest = {a: feat.arr_crest_factor(c) for a, c in batches.items()}
    max_crest = F.greatest(*[F.coalesce(c, F.lit(0.0)) for c in crest.values()])
    nonempty = [F.size(F.coalesce(F.col(c), F.array())) > 0 for c in batches.values()]
    is_valid = nonempty[0] & nonempty[1] & nonempty[2] & (max_crest <= CREST_VALID_MAX)
    outlier_score = F.least(max_crest / 10.0, F.lit(1.0))

    completeness = (
        sum(F.col(c).isNotNull().cast("int") for c in batches.values()).cast("double") / 3.0
    )
    consistency = (
        (F.size(F.coalesce(F.col(batches["x"]), F.array()))
         == F.size(F.coalesce(F.col(batches["y"]), F.array())))
        & (F.size(F.coalesce(F.col(batches["y"]), F.array()))
           == F.size(F.coalesce(F.col(batches["z"]), F.array())))
    )
    quality = (
        0.5 * completeness
        + 0.3 * (1.0 - outlier_score)
        + 0.2 * consistency.cast("double")
    )

    out = records.select(
        "ts",
        "machine",
        F.struct(
            *[F.col(c).alias(c) for c in batches.values()],
            F.col("status_code").alias("status_code"),
        ).alias("raw_data"),
        F.struct(
            is_valid.alias("is_valid"),
            F.round(outlier_score, 6).alias("outlier_score"),
        ).alias("outlier_check"),
        F.struct(
            F.struct(*[_axis_time_domain(batches[a]).alias(a) for a in AXES]).alias(
                "time_domain"
            ),
            F.struct(*[_axis_freq_domain(batches[a]).alias(a) for a in AXES]).alias(
                "frequency_domain"
            ),
        ).alias("features"),
        F.struct(
            F.round(completeness, 6).alias("completeness"),
            consistency.alias("consistency"),
            F.round(quality, 6).alias("data_quality_score"),
        ).alias("quality_metrics"),
        F.struct(
            F.current_timestamp().alias("processed_at"),
            F.lit(PROCESSING_VERSION).alias("processing_version"),
        ).alias("metadata"),
    )
    if drop_invalid:
        out = out.filter(F.col("outlier_check.is_valid"))
    return out


def records_from_events(events: DataFrame) -> DataFrame:
    """Synthesize reference-shaped triaxial records from the driver's
    scalar ``events`` stream: per (machine, second) the values collect
    into a batch array replicated across axes with deterministic
    per-axis offsets (testdata has one channel; the reference has
    three). Sorting keys the arrays deterministically."""
    ev = events.filter(F.col("value").isNotNull()).withColumn(
        "machine", F.concat(F.lit("M"), (F.col("user_id") % 2).cast("string"))
    )
    grouped = ev.groupBy(
        F.date_trunc("hour", "ts").alias("ts"), "machine"
    ).agg(
        F.array_sort(F.collect_list(F.struct("event_id", "value"))).alias("vs"),
        F.max("event_type").alias("status_code"),
    )
    vals = F.transform("vs", lambda s: s["value"])
    return grouped.select(
        "ts",
        "machine",
        vals.alias("vibration_x_batch"),
        F.transform(vals, lambda v: v + 1.0).alias("vibration_y_batch"),
        F.transform(vals, lambda v: v * 2.0).alias("vibration_z_batch"),
        "status_code",
    )


def flatten_envelope(enriched: DataFrame) -> DataFrame:
    """The warehouse projection (entry-point B shape): nested envelope ->
    the flat 9-feature row of the OLAP table
    (reference/FeatureEngineeringApproaches.md:93-110)."""
    cols = [F.col("ts").alias("SourceTimestamp"), "machine"]
    for a in AXES:
        for stat in ("rms", "peak", "kurtosis"):
            cols.append(
                F.col(f"features.time_domain.{a}.{stat}").alias(f"vibration_{a}_{stat}")
            )
    return enriched.select(*cols)
