"""Frequency-domain features A6/A7 (reference/README.md:464-465:
calculateDominantFrequency, calculateSpectralEnergy) and per-group PCA
(reference/README.md:472-483 reduced_features).

These are the engine's only non-SQL-expressible operators: FFT and SVD
have no Column-expression form, so they run as Arrow-vectorized pandas
UDFs (SURVEY.md §2.10 preference order). Conventions pinned here once:

- rfft over the sample batch; dominant frequency = argmax|rfft| over
  bins 1.. (DC excluded) x fs/n  [Hz].
- spectral_energy = sum(v^2) in the time domain == (1/n)*sum(|FFT_full|^2)
  by Parseval — numerically identical to functions.features.arr_energy,
  which IS the SQL-checkable twin; test_spectral.py asserts the
  equivalence.
- PCA: numpy SVD per group with deterministic sign normalization
  (largest-|loading| component forced positive) — output is stable
  across partitionings, which raw SVD sign is not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def dominant_frequency_bin(batch: pd.Series) -> pd.Series:
    """Index (bin) of the dominant non-DC frequency of each sample
    array; multiply by fs/n for Hz. NULL on arrays shorter than 2."""

    def one(arr):
        if arr is None or len(arr) < 2:
            return None
        mag = np.abs(np.fft.rfft(np.asarray(arr, dtype=np.float64)))
        if mag.shape[0] < 2:
            return None
        return float(np.argmax(mag[1:]) + 1)

    return batch.map(one)


@F.pandas_udf(T.DoubleType())
def spectral_energy_fft(batch: pd.Series) -> pd.Series:
    """sum(|FFT|^2)/n over the full FFT == time-domain sum(v^2)
    (Parseval). Kept for A7 parity verification; production plans use
    the HOF twin arr_energy."""

    def one(arr):
        if arr is None or len(arr) == 0:
            return None
        spec = np.fft.fft(np.asarray(arr, dtype=np.float64))
        return float(np.sum(np.abs(spec) ** 2) / len(arr))

    return batch.map(one)


def pca_reduce_groups(df, group_cols, feature_cols, k=2, carry_cols=()):
    """Per-group PCA via applyInPandas (reference 'reduced_features'):
    projects each row onto the group's top-k principal components.
    Deterministic: components' dominant loading forced positive, and the
    principal axes derive from X^T X, which is invariant to the
    (nondeterministic) row order Spark hands each group in.

    ``carry_cols`` pass through untouched (e.g. a window timestamp that
    identifies rows but must not enter the feature matrix).

    Scale note: each group must fit in one executor's memory (the
    reference's groups are per-machine-minute — tiny); global PCA at
    100 TB would use a distributed Gram-matrix accumulation instead.
    """
    carry_cols = list(carry_cols)
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [df.schema[c] for c in carry_cols]
        + [df.schema[c] for c in feature_cols]
        + [T.StructField(f"pc{i+1}", T.DoubleType()) for i in range(k)]
    )

    def fit_project(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[feature_cols].to_numpy(dtype=np.float64)
        mu = x.mean(axis=0)
        xc = x - mu
        # economy SVD; right singular vectors = principal axes
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        comps = vt[:k]
        for i in range(comps.shape[0]):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        proj = xc @ comps.T
        res = pdf[list(group_cols) + carry_cols + list(feature_cols)].copy()
        for i in range(k):
            res[f"pc{i+1}"] = proj[:, i] if i < comps.shape[0] else np.nan
        return res

    return df.groupBy(*group_cols).applyInPandas(fit_project, schema=out_schema)


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def dft_bin_magnitudes(batch: pd.Series) -> pd.Series:
    """|rfft| magnitudes at bins 1..min(32, ceil(N/2)-1) (DC excluded,
    strictly below Nyquist) of each sample array — the bounded-bin slice
    of the full FFT that a SQL oracle can replay with direct DFT
    trigonometric sums (sqrt((sum v*cos)^2 + (sum v*sin)^2) per bin).
    The bin range ADAPTS to the window size: long windows keep the full
    32-bin differential, short windows (driver smoke at sf0.001 has 2-15
    samples per day-window) still emit their sub-Nyquist bins instead of
    vanishing. NULL only when no sub-Nyquist non-DC bin exists (N <= 2)."""

    def one(arr):
        if arr is None or len(arr) <= 2:
            return None
        hi = min(32, (len(arr) - 1) // 2)  # bins k with k < N/2
        if hi < 1:
            return None
        mag = np.abs(np.fft.rfft(np.asarray(arr, dtype=np.float64)))
        return [float(x) for x in mag[1 : hi + 1]]

    return batch.map(one)
