"""Signal-feature expressions (SURVEY.md §2.4 A1-A7, A10-A13).

The reference specifies these twice — as Node-RED JS reducers
(reference/FeatureEngineeringApproaches.md:20-38) and as StarRocks
load-time SQL array transforms (reference/FeatureEngineeringApproaches.md:
229-238). Both operate on per-record sample-batch arrays. The Spark-first
re-expression has two forms:

1. **Array form** (``arr_*``): higher-order functions over an
   ``array<numeric>`` column — ``transform`` / ``aggregate`` /
   ``array_max`` — computed per-row with NO shuffle and no row blowup
   (an ``explode`` would multiply rows 10x for the reference's
   10-sample batches; at 100 TB that is the difference between a map
   stage and a disaster).
2. **Aggregate form** (``*_agg``): the same statistic as a grouped
   aggregation over scalar samples, for ``groupBy(window(...))`` paths
   (SURVEY.md A8/A9). These get Catalyst's automatic partial+final
   (map-side combine) aggregation.

Null semantics follow the reference exactly: empty or NULL input array
-> NULL result (reference/FeatureEngineeringApproaches.md:21,27,32).

Kurtosis is the **population excess** definition m4/m2^2 - 3
(reference/FeatureEngineeringApproaches.md:31-38). Spark's built-in
``kurtosis()`` aggregate already implements g2 = m4/m2^2 - 3; the
DuckDB oracle must therefore use ``kurtosis_pop`` (its plain
``kurtosis`` is the bias-corrected sample statistic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "arr_mean",
    "arr_rms",
    "arr_peak",
    "arr_peak_to_peak",
    "arr_crest_factor",
    "arr_kurtosis",
    "arr_energy",
    "rms_agg",
    "peak_agg",
    "peak_to_peak_agg",
    "crest_factor_agg",
    "kurtosis_agg",
    "energy_agg",
]


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _guarded(c: Column | str, expr: Column) -> Column:
    """NULL on NULL/empty array input (reference null semantics, P5)."""
    c = _as_col(c)
    return F.when(c.isNotNull() & (F.size(c) > 0), expr).otherwise(F.lit(None))


def _sum_pow(c: Column, p: int) -> Column:
    """aggregate(arr, 0.0, (acc, v) -> acc + v^p) — single pass, JVM-side."""
    if p == 1:
        return F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    return F.aggregate(c, F.lit(0.0), lambda acc, v: acc + F.pow(v.cast("double"), F.lit(p)))


def arr_mean(c: Column | str) -> Column:
    c = _as_col(c)
    return _guarded(c, _sum_pow(c, 1) / F.size(c))


def arr_rms(c: Column | str) -> Column:
    """RMS = sqrt(sum(v^2)/n). JS: FeatureEngineeringApproaches.md:20-24;
    SQL: sqrt(array_avg(array_map(x->x*x, arr))) ibid:230-232."""
    c = _as_col(c)
    return _guarded(c, F.sqrt(_sum_pow(c, 2) / F.size(c)))


def arr_peak(c: Column | str) -> Column:
    """Peak = max(|v|). JS: FeatureEngineeringApproaches.md:26-29;
    SQL: array_max(array_map(x->abs(x), arr)) ibid:233-235."""
    c = _as_col(c)
    return _guarded(c, F.array_max(F.transform(c, lambda v: F.abs(v.cast("double")))))


def arr_peak_to_peak(c: Column | str) -> Column:
    """max(v) - min(v) (reference/README.md:460 calculatePeakToPeak)."""
    c = _as_col(c)
    return _guarded(c, F.array_max(c).cast("double") - F.array_min(c).cast("double"))


def arr_crest_factor(c: Column | str) -> Column:
    """peak / rms (reference/README.md:461 calculateCrestFactor)."""
    rms = arr_rms(c)
    return F.when(rms > 0, arr_peak(c) / rms).otherwise(F.lit(None))


def arr_kurtosis(c: Column | str) -> Column:
    """Population excess kurtosis m4/m2^2 - 3 over the array
    (reference/FeatureEngineeringApproaches.md:31-38). Two-pass HOF:
    mean, then centered moments — still per-row, no shuffle.

    NULL when the array is empty/NULL *or* variance is zero (the JS
    reference would produce NaN via 0/0; NULL is the SQL-friendly
    choice and what the DuckDB oracle's kurtosis_pop returns)."""
    c = _as_col(c)
    n = F.size(c)

    def _kurt(mean: Column) -> Column:
        # mean is a bound lambda variable: referencing the raw aggregate
        # expression inside the m2/m4 lambdas would re-evaluate it per
        # element (interpreted HOFs inline outer expressions), turning
        # the two-pass moment computation O(n^2).
        m2 = F.aggregate(c, F.lit(0.0), lambda a, v: a + F.pow(v.cast("double") - mean, F.lit(2))) / n
        m4 = F.aggregate(c, F.lit(0.0), lambda a, v: a + F.pow(v.cast("double") - mean, F.lit(4))) / n
        return F.when(m2 > 0, m4 / F.pow(m2, F.lit(2)) - 3).otherwise(F.lit(None))

    return _guarded(c, F.element_at(F.transform(F.array(_sum_pow(c, 1) / n), _kurt), 1))


def arr_energy(c: Column | str) -> Column:
    """Signal energy sum(v^2). Equals (1/n)*sum(|FFT|^2) by Parseval —
    the engine's documented convention for A7 ``calculateSpectralEnergy``
    (reference/README.md:465); frequency-domain verification lives in
    :mod:`datapipeline_spike_spark.functions.spectral`."""
    c = _as_col(c)
    return _guarded(c, _sum_pow(c, 2))


# ---------------------------------------------------------------------------
# Aggregate forms: same statistics over scalar samples under groupBy().
# Catalyst splits each into partial (map-side) + final automatically.
# ---------------------------------------------------------------------------


def rms_agg(c: Column | str) -> Column:
    c = _as_col(c)
    return F.sqrt(F.avg(c * c))


def peak_agg(c: Column | str) -> Column:
    c = _as_col(c)
    return F.max(F.abs(c))


def peak_to_peak_agg(c: Column | str) -> Column:
    c = _as_col(c)
    return F.max(c) - F.min(c)


def crest_factor_agg(c: Column | str) -> Column:
    return peak_agg(c) / rms_agg(c)


def kurtosis_agg(c: Column | str) -> Column:
    """Spark's kurtosis() is already population excess (m4/m2^2 - 3);
    matches DuckDB ``kurtosis_pop``."""
    return F.kurtosis(_as_col(c))


def energy_agg(c: Column | str) -> Column:
    c = _as_col(c)
    return F.sum(c * c)
