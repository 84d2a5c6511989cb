"""Approximate per-group ranking — the 100 TB path for percent_rank /
ntile over corpus-scale groups.

An exact ``Window.partitionBy(segment).orderBy(value)`` percent_rank is
an inherent per-group GLOBAL sort: every row of a group flows through
one task, and a low-cardinality group key (market segment, language)
turns that into a handful of reducers carrying the whole corpus — the
same funnel class the salted bottom-k removes for top-k, except rank
needs EVERY row's position, so no bottom-k trick applies. The scale
answer BI engines use is banding against approximate quantiles:

1. one pass computes per-group ``approx_percentile`` threshold arrays
   (Greenwald-Khanna sketch inside Spark's aggregate — mergeable, so it
   partial-aggregates map-side like any sum);
2. the |groups| x (n_bands-1) threshold table broadcast-joins back;
3. each row's band is a map-only count of thresholds <= value.

Error is the sketch's rank error (``accuracy`` parameter: eps ~
1/accuracy), NOT a value error: a row lands at most
ceil(eps * group_size / band_size) bands from its exact band. No
shuffle of the data itself beyond the grouped aggregate's partial pass.

Reference scope: the reference spike has no ranking surface (its §2
inventory stops at aggregations); this operator is part of the §2.11
LLM-pipeline extension surface (quantile-bucketing quality scores /
spend / document lengths at corpus scale). The exact small-data twin is
``customer_value_ranks`` (plans/catalog_relational.py), whose docstring
points here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_percentile_bands(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_bands: int = 10,
    accuracy: int = 10_000,
    band_col: str = "band",
) -> DataFrame:
    """Assign each row its approximate ``n_bands``-quantile band within
    its group (1-based: band b means value > thresholds[b-1] of the
    (b-1)/n_bands .. quantile ladder) — the scale substitute for
    ``ntile(n_bands)``/percent_rank banding. Adds ``band_col`` (int; NULL
    for NULL values) and keeps every input column.

    The thresholds are the group's approx_percentile at
    [1/n, 2/n, ..., (n-1)/n]; a row's band = 1 + #(thresholds <=
    value). Ties at a threshold fall to the HIGHER band, matching the
    ``value <= t`` convention of percentile ladders. Deterministic for
    a fixed input (the sketch is data-order-insensitive at these
    accuracies in practice; exactness is NOT the contract — rank error
    eps ~ 1/accuracy is)."""
    if n_bands < 2:
        raise ValueError(f"n_bands={n_bands}: need at least 2 bands")
    qs = [i / n_bands for i in range(1, n_bands)]
    thresholds = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(q) for q in qs]), F.lit(accuracy)
        ).alias("_band_thresholds")
    )
    v = F.col(value_col)
    # a NULL value must band as NULL, not silently as band 1: the HOF
    # filter drops NULL comparisons, which would otherwise read as
    # "below every threshold"
    band = F.when(
        v.isNotNull(),
        (F.size(F.filter("_band_thresholds", lambda t: t <= v)) + F.lit(1)).cast(
            "int"
        ),
    )
    return (
        df.join(F.broadcast(thresholds), group_cols)
        .withColumn(band_col, band)
        .drop("_band_thresholds")
    )
