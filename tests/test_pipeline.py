"""Entry-point A assembly (SURVEY §3.1): record synthesis -> envelope
enrichment -> warehouse flattening, in batch and streaming (twin rule)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import features as feat
from datapipeline_spike_spark.pipeline import (
    enrich_records,
    flatten_envelope,
    records_from_events,
)
from datapipeline_spike_spark.plans.registry import load


def _fields(struct_type):
    return [f.name for f in struct_type.fields]


def test_envelope_matches_reference_shape_and_math(spark, sf_dir):
    records = records_from_events(load(spark, sf_dir, "events"))
    enriched = enrich_records(records, drop_invalid=False)

    # reference/README.md:501-539 envelope, field-for-field in order
    schema = enriched.schema
    names = schema.names
    assert names[-5:] == [
        "raw_data", "outlier_check", "features", "reduced_features", "quality_metrics"
    ]
    assert _fields(schema["outlier_check"].dataType) == ["is_valid", "outlier_score"]
    assert _fields(schema["features"].dataType) == ["time_domain", "frequency_domain"]
    assert _fields(schema["reduced_features"].dataType) == ["principal_components"]
    # processing metadata lives INSIDE quality_metrics (README.md:535-537)
    assert _fields(schema["quality_metrics"].dataType) == [
        "data_quality_score", "completeness", "consistency",
        "processing_version", "processing_timestamp",
    ]

    row = enriched.filter(F.col("outlier_check.is_valid")).first()
    assert row["quality_metrics"]["processing_version"] == "1.0"
    assert row["quality_metrics"]["processing_timestamp"] is not None
    # 3 principal components (README.md:529)
    assert len(row["reduced_features"]["principal_components"]) == 3
    assert set(row["features"]["time_domain"].asDict()) == {"x", "y", "z"}

    # nested math equals the flat feature library on the same arrays
    xs = row["raw_data"]["vibration_x_batch"]
    rms = math.sqrt(sum(v * v for v in xs) / len(xs))
    assert abs(row["features"]["time_domain"]["x"]["rms"] - rms) < 1e-9
    assert row["features"]["frequency_domain"]["x"]["spectral_energy"] is not None
    assert 0.0 <= row["quality_metrics"]["data_quality_score"] <= 1.0
    # y = x + 1 shifts nothing for peak_to_peak
    assert (
        abs(
            row["features"]["time_domain"]["y"]["peak_to_peak"]
            - row["features"]["time_domain"]["x"]["peak_to_peak"]
        )
        < 1e-9
    )


def test_envelope_pca_loadings_are_orthonormal():
    """The fixed 'pretrained' projection axes must be an orthonormal set
    (a genuine rotation/projection, not arbitrary weights) and stable
    across imports (the oracle inlines them as literals)."""
    import numpy as np

    from datapipeline_spike_spark.pipeline import PCA_DIM, PCA_K, PCA_LOADINGS, _pca_loadings

    m = np.array(PCA_LOADINGS)
    assert m.shape == (PCA_K, PCA_DIM)
    assert np.allclose(m @ m.T, np.eye(PCA_K), atol=1e-12)
    assert _pca_loadings() == PCA_LOADINGS  # deterministic regeneration


def test_invalid_records_dropped_at_gate(spark):
    rows = [
        ("2024-01-01 00:00:00", "M0", [1.0, -1.0, 1.0, -1.0], [1.0] * 4, [2.0] * 4, "Good"),
        # impulsive spike -> crest factor >> 6 -> gated out
        ("2024-01-01 00:01:00", "M0", [0.01] * 63 + [9000.0], [1.0] * 64, [1.0] * 64, "Good"),
        # empty batch -> invalid
        ("2024-01-01 00:02:00", "M0", [], [1.0], [1.0], "Bad"),
    ]
    df = spark.createDataFrame(
        rows,
        "ts string, machine string, vibration_x_batch array<double>, "
        "vibration_y_batch array<double>, vibration_z_batch array<double>, status_code string",
    ).withColumn("ts", F.to_timestamp("ts"))
    kept = enrich_records(df).collect()
    assert len(kept) == 1 and kept[0]["ts"].minute == 0
    gated = enrich_records(df, drop_invalid=False).collect()
    assert [r["outlier_check"]["is_valid"] for r in gated].count(False) == 2


def test_flatten_envelope_is_warehouse_row(spark, sf_dir):
    records = records_from_events(load(spark, sf_dir, "events"))
    flat = flatten_envelope(enrich_records(records))
    cols = flat.columns
    # warehouse grain is per machine/operation window
    # (reference/FeatureEngineeringApproaches.md:93-110)
    assert cols[:3] == ["SourceTimestamp", "machine", "operation"]
    assert len([c for c in cols if c.startswith("vibration_")]) == 9  # x/y/z x rms/peak/kurtosis
    assert flat.count() > 0


def test_streaming_twin_produces_same_envelope(spark, sf_dir):
    """The SAME enrich_records chain runs on a streaming frame — stage
    parity between entry points A(streaming) and C(batch)."""
    import shutil
    import tempfile

    records = records_from_events(load(spark, sf_dir, "events"))
    d = tempfile.mkdtemp(prefix="pipe_records_")
    try:
        records.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(spark.read.parquet(d).schema).parquet(d)
        q = (
            enrich_records(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("envelope_stream")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql(
                "SELECT count(*) AS n FROM envelope_stream"
            ).collect()[0]["n"]
            want = enrich_records(spark.read.parquet(d)).count()
            assert got == want > 0
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)
