"""Feature library vs. the reference's published golden vectors
(FIXTURES.md §C; reference/FeatureEngineeringApproaches.md:80-86,
reference/TechSpikeDataPipeline.md:13-19) and scipy's population
kurtosis."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import features as feat

X = [9, 19, -68, -29, 27, 74, -35, -11, 23, 3]
Y = [130, 0, -11, 134, 122, -35, -95, 107, 66, 5]
Z = [-991, -1032, -1065, -1046, -1136, -1116, -917, -864, -985, -1057]

GOLDEN = {
    "rms": {"x": 37.41122826104484, "y": 87.14413348011443, "z": 1024.0242672905754},
    "peak": {"x": 74.0, "y": 134.0, "z": 1136.0},
}


def _pop_kurtosis(v):
    n = len(v)
    m = sum(v) / n
    m2 = sum((x - m) ** 2 for x in v) / n
    m4 = sum((x - m) ** 4 for x in v) / n
    return m4 / m2**2 - 3


@pytest.fixture(scope="module")
def arrays_df(spark):
    return spark.createDataFrame(
        [(X, "x"), (Y, "y"), (Z, "z"), ([], "empty"), (None, "null")],
        "arr array<int>, axis string",
    )


def _features_row(arrays_df):
    rows = arrays_df.select(
        "axis",
        feat.arr_rms("arr").alias("rms"),
        feat.arr_peak("arr").alias("peak"),
        feat.arr_peak_to_peak("arr").alias("p2p"),
        feat.arr_crest_factor("arr").alias("crest"),
        feat.arr_kurtosis("arr").alias("kurt"),
        feat.arr_mean("arr").alias("mean"),
        feat.arr_energy("arr").alias("energy"),
    ).collect()
    return {r["axis"]: r for r in rows}


def test_golden_vectors(arrays_df):
    by_axis = _features_row(arrays_df)
    for axis, vec in (("x", X), ("y", Y), ("z", Z)):
        r = by_axis[axis]
        assert r["rms"] == pytest.approx(GOLDEN["rms"][axis], abs=1e-9)
        assert r["peak"] == pytest.approx(GOLDEN["peak"][axis], abs=1e-12)
        assert r["p2p"] == pytest.approx(max(vec) - min(vec))
        assert r["crest"] == pytest.approx(GOLDEN["peak"][axis] / GOLDEN["rms"][axis])
        assert r["kurt"] == pytest.approx(_pop_kurtosis(vec), abs=1e-9)
        assert r["mean"] == pytest.approx(sum(vec) / len(vec))
        assert r["energy"] == pytest.approx(sum(v * v for v in vec))


def test_null_semantics(arrays_df):
    """rms/peak/kurtosis of [] and NULL are NULL
    (reference/FeatureEngineeringApproaches.md:21,27,32)."""
    by_axis = _features_row(arrays_df)
    for axis in ("empty", "null"):
        r = by_axis[axis]
        for c in ("rms", "peak", "p2p", "crest", "kurt", "mean", "energy"):
            assert r[c] is None, f"{c}({axis}) should be NULL"


def test_scipy_cross_check():
    scipy = pytest.importorskip("scipy")
    from scipy import stats

    for vec in (X, Y, Z):
        assert _pop_kurtosis(vec) == pytest.approx(
            stats.kurtosis(vec, fisher=True, bias=True), abs=1e-12
        )


def test_agg_forms_match_array_forms(spark):
    """rms_agg/peak_agg/kurtosis_agg over exploded samples equal the
    array-form results (the batch/streaming twin property, SURVEY §7.4.5)."""
    df = spark.createDataFrame([(x,) for x in X], "v int")
    row = df.agg(
        feat.rms_agg("v").alias("rms"),
        feat.peak_agg("v").alias("peak"),
        feat.kurtosis_agg("v").alias("kurt"),
        feat.peak_to_peak_agg("v").alias("p2p"),
    ).collect()[0]
    assert row["rms"] == pytest.approx(GOLDEN["rms"]["x"])
    assert row["peak"] == pytest.approx(74.0)
    assert row["kurt"] == pytest.approx(_pop_kurtosis(X), abs=1e-9)
    assert row["p2p"] == pytest.approx(max(X) - min(X))


def test_crest_zero_rms_is_null(spark):
    df = spark.createDataFrame([([0, 0, 0],)], "arr array<int>")
    r = df.select(feat.arr_crest_factor("arr").alias("c")).collect()[0]
    assert r["c"] is None
