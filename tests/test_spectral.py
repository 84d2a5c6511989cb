"""Frequency-domain features, PCA reduction, and LSH-ANN semantics.

The FFT conventions (rfft, DC-excluded argmax, Parseval energy) are
pinned in functions/spectral.py; these tests verify them against numpy
ground truth and prove ANN recall that the driver's rows-only check
can't see.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.features import arr_energy
from datapipeline_spike_spark.functions.spectral import (
    dominant_frequency_bin,
    pca_reduce_groups,
    spectral_energy_fft,
)
from datapipeline_spike_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)


def test_parseval_fft_energy_equals_time_domain(spark):
    """sum|FFT|^2 / n == sum v^2 — the documented A7 convention."""
    arrays = [
        [float(v) for v in (9, 19, -68, -29, 27, 74, -35, -11, 23, 3)],
        [1.0, -1.0, 1.0, -1.0],
        [5.0],
    ]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrays)], "id long, v array<double>")
    rows = df.select(
        "id",
        spectral_energy_fft("v").alias("fft_energy"),
        arr_energy("v").alias("time_energy"),
    ).collect()
    for r in rows:
        assert r["fft_energy"] == pytest.approx(r["time_energy"], rel=1e-9)


def test_dominant_frequency_finds_planted_sine(spark):
    n, bin_true = 64, 5
    t = np.arange(n)
    sine = np.sin(2 * math.pi * bin_true * t / n)
    noise = 0.01 * np.cos(2 * math.pi * 11 * t / n)
    df = spark.createDataFrame(
        [(0, [float(x) for x in sine + noise]), (1, [1.0]), (2, None)],
        "id long, v array<double>",
    )
    got = {r["id"]: r["b"] for r in df.select("id", dominant_frequency_bin("v").alias("b")).collect()}
    assert got[0] == float(bin_true)
    assert got[1] is None  # too short for a non-DC bin
    assert got[2] is None


def test_windowed_samples_cap_bounds_group_payload(spark, tmp_path):
    """An oversized (day, status) group must be truncated to
    SPECTRAL_MAX_SAMPLES before collect_list (the 100 TB memory-bomb
    guard): n_samples == cap, n_raw_samples == true size, and the FFT
    consumed exactly the first cap rows in (ts, value) order."""
    import pandas as pd

    from datapipeline_spike_spark.plans.catalog_ml import (
        SPECTRAL_MAX_SAMPLES,
        q_spectral_energy,
    )

    n = SPECTRAL_MAX_SAMPLES + 904
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-03-01") + pd.to_timedelta(range(n), unit="s"),
            "event_type": "status_a",
            "value": [float((i * 37) % 100 - 50) for i in range(n)],
            "user_id": 1,
            "event_id": range(n),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = q_spectral_energy(spark, str(tmp_path)).collect()[0]
    assert row["n_samples"] == SPECTRAL_MAX_SAMPLES
    assert row["n_raw_samples"] == n  # truncation is flagged, not silent
    head = pdf.sort_values(["ts", "value"]).head(SPECTRAL_MAX_SAMPLES)["value"]
    assert row["mean_power"] == pytest.approx((head**2).mean(), abs=0.01)


def test_pca_projects_onto_dominant_axis(spark):
    # points on a line y = 2x (+ tiny z noise): pc1 captures ~all variance
    rows = [("g", float(x), 2.0 * x, 0.001 * (x % 3)) for x in range(-5, 6)]
    df = spark.createDataFrame(rows, "grp string, f1 double, f2 double, f3 double")
    out = pca_reduce_groups(df, ["grp"], ["f1", "f2", "f3"], k=2).toPandas()
    assert len(out) == 11
    var1, var2 = out["pc1"].var(), out["pc2"].var()
    assert var1 > 100 * var2
    # projection of the centered line onto pc1 keeps spacing sqrt(5)*dx
    spread = sorted(out["pc1"])
    diffs = np.diff(spread)
    assert np.allclose(diffs, diffs[0], atol=1e-3)


def test_pca_carry_cols_pass_through(spark):
    rows = [("g", i, float(i), float(2 * i)) for i in range(4)]
    df = spark.createDataFrame(rows, "grp string, tag long, f1 double, f2 double")
    out = pca_reduce_groups(df, ["grp"], ["f1", "f2"], k=1, carry_cols=["tag"]).toPandas()
    assert sorted(out["tag"]) == [0, 1, 2, 3]
    assert list(out.columns) == ["grp", "tag", "f1", "f2", "pc1"]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16)).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant: vec 40 = exact copy of vec 0; vec 41 = tiny perturbation of vec 1
    rows.append((40, [float(x) for x in base[0]]))
    rows.append((41, [float(x) for x in base[1] + 0.001 * rng.normal(size=16).astype("float32")]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact_neighbors(vectors):
    out = brute_force_topk(vectors, vectors.filter(F.col("vec_id") < 2), k=3)
    top = {r["query_id"]: r["neighbor_id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert top[0] == 40  # exact copy is rank 1
    assert top[1] == 41  # near-copy is rank 1


def test_lsh_bucket_recalls_identical_and_near_vectors(vectors):
    out = lsh_bucket_topk(
        vectors, vectors.filter(F.col("vec_id") < 2), dim=16, k=3, n_planes=4
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    # an identical vector lands in the identical bucket — guaranteed recall
    assert (0, 40) in got
    # near-duplicate straddles at most one hyperplane w.h.p.; multiprobe
    # (Hamming-1) recovers it
    assert (1, 41) in got
    # ranks are 1..k per query with no self-pairs
    for r in out.collect():
        assert 1 <= r["rank"] <= 3 and r["neighbor_id"] != r["query_id"]


def test_cosine_neardup_finds_planted_pairs(vectors):
    from datapipeline_spike_spark.operators.similarity import cosine_neardup_pairs

    out = cosine_neardup_pairs(vectors, dim=16, threshold=0.99)
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    assert got[(0, 40)] == 1.0  # identical vectors share a bucket by construction
    assert (1, 41) in got and got[(1, 41)] > 0.99
    # threshold filters unrelated random pairs out
    assert all(k in {(0, 40), (1, 41)} for k in got)


def test_ivf_topk_recalls_identical_vector(vectors):
    from datapipeline_spike_spark.operators.similarity import ivf_topk

    out = ivf_topk(vectors, vectors.filter(F.col("vec_id") < 2), k=3, n_centroids=8, n_probe=2)
    rows = out.collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    # identical vector shares the query's centroid assignment exactly
    assert (0, 40) in got
    top = {r["query_id"]: r["neighbor_id"] for r in rows if r["rank"] == 1}
    assert top[0] == 40
    for r in rows:
        assert 1 <= r["rank"] <= 3 and r["neighbor_id"] != r["query_id"]


def test_dft_bin_magnitudes_planted_tone(spark):
    """dft_bin_magnitudes: a pure tone at bin k concentrates magnitude
    N*amp/2 at index k-1 of the bin slice; the slice adapts to the
    window — min(32, (N-1)//2) bins, all strictly sub-Nyquist — and only
    degenerate arrays (N <= 2: no non-DC sub-Nyquist bin) are NULL."""
    import math

    from datapipeline_spike_spark.functions.spectral import dft_bin_magnitudes

    n, k, amp = 256, 7, 3.0
    tone = [amp * math.sin(2 * math.pi * k * i / n) for i in range(n)]
    df = spark.createDataFrame(
        [(1, tone), (2, [1.0] * 10), (3, [1.0, 2.0])], "id long, vals array<double>"
    )
    rows = {r["id"]: r["m"] for r in df.select("id", dft_bin_magnitudes("vals").alias("m")).collect()}
    mags = rows[1]
    assert len(mags) == 32  # long window keeps the full 32-bin slice
    assert max(range(32), key=lambda i: mags[i]) == k - 1
    assert abs(mags[k - 1] - n * amp / 2) < 1e-6
    assert len(rows[2]) == 4  # N=10 -> bins 1..4 (< Nyquist bin 5)
    assert rows[3] is None  # N=2: no sub-Nyquist non-DC bin exists


def test_semdedup_drops_planted_semantic_dups(vectors):
    from datapipeline_spike_spark.operators.similarity import semdedup

    out = semdedup(vectors, k=8, iters=2, threshold=0.99)
    rows = {r["vec_id"]: r for r in out.collect()}
    # every corpus vector gets a verdict row
    assert len(rows) == 42
    # planted copies: an identical (40<-0) and a near-identical (41<-1)
    # vector land in the lower-id twin's cluster and are dropped with
    # the twin recorded as dup_of; the twin itself survives
    assert not rows[40]["kept"] and rows[40]["dup_of"] == 0
    assert not rows[41]["kept"] and rows[41]["dup_of"] == 1
    assert rows[0]["kept"] and rows[0]["dup_of"] is None
    assert rows[1]["kept"] and rows[1]["dup_of"] is None
    # at threshold 0.99 the 40 random base vectors are all kept
    assert sum(1 for r in rows.values() if r["kept"]) == 40
    # dup pairs share a cluster (the within-cluster sweep found them)
    assert rows[40]["cent_id"] == rows[0]["cent_id"]
    assert rows[41]["cent_id"] == rows[1]["cent_id"]


def test_semdedup_empty_corpus_is_typed_empty(spark):
    from datapipeline_spike_spark.operators.similarity import semdedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = semdedup(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cent_id", "dup_of", "kept"]


def test_pca_reduce_top3_beats_fixed_axes_variance(spark):
    """PCA optimality pins the rows-only SVD to the oracle-checked
    profile twin: per group, the variance captured by pca_reduce's
    top-3 principal components must be >= the variance captured by the
    fixed orthonormal axis triple of pca_variance_profile (the top-k
    PCA subspace maximizes captured variance over every orthonormal
    k-set). A broken SVD/sign/centering bug would violate this."""
    from pyspark.sql import functions as F

    from datapipeline_spike_spark.plans.catalog_ml import (
        q_pca_reduce,
        q_pca_variance_profile,
    )

    sf = "/root/testdata/sf0.01"
    pcs = (
        q_pca_reduce(spark, sf)
        .groupBy("status_code")
        .agg(
            *[
                F.avg(F.col(f"pc{i}") * F.col(f"pc{i}")).alias(f"v{i}")
                for i in (1, 2, 3)
            ]
        )
        .collect()
    )
    pca_var = {r["status_code"]: r["v1"] + r["v2"] + r["v3"] for r in pcs}
    prof = {
        r["status_code"]: r["ve_axis1"] + r["ve_axis2"] + r["ve_axis3"]
        for r in q_pca_variance_profile(spark, sf).collect()
    }
    assert set(pca_var) == set(prof) and pca_var
    for status, fixed in prof.items():
        assert pca_var[status] >= fixed - 1e-4, (status, pca_var[status], fixed)
