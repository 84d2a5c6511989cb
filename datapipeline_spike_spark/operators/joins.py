"""Join operators Spark lacks as single primitives (SURVEY.md §2.3):
as-of join and range/band join, composed from built-ins.

Scale notes (100 TB posture):
- The as-of join uses the union + last-non-null-window trick, NOT a
  theta join: a theta join ``r.ts <= l.ts`` is quadratic per key, while
  the union trick is one shuffle on the key + one sort per partition —
  the same cost class as a sort-merge join. This is the form that
  survives 1000 executors.
- The band join broadcasts the (small) band table: Catalyst turns it
  into BroadcastNestedLoopJoin; never use it for two large sides —
  bucketize the range key instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` keys.

    Reference need: "latest calibration before reading ts" /
    Redis latest-state-per-id lookups (reference/README.md:280-289).

    Implementation: union both sides with a side marker, sort within
    each key by (ts, side, tiebreak) — right rows sort BEFORE left rows
    at equal ts so `<=` semantics hold — then propagate the last
    non-null right value with ``F.last(..., ignorenulls=True)`` over an
    unbounded-preceding window, and keep only left rows.
    """
    on = list(on)
    value_cols = list(value_cols) or [c for c in right.columns if c not in (*on, right_ts)]

    lsel = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rsel = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lsel.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    order = [F.col("_ts"), F.col("_side")]
    if tiebreak:
        order.append(F.coalesce(F.col("_lrow." + tiebreak), F.lit(None)))
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    unioned = lsel.unionByName(rsel)
    filled = unioned.select(
        *on,
        "_side",
        "_lrow",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"), *[F.col(f"asof_{c}") for c in value_cols], "asof_ts"
    )
    return out


def band_join(
    left: DataFrame, bands: DataFrame, value_col: str, lo_col: str = "lo", hi_col: str = "hi"
) -> DataFrame:
    """Range/band join: attach the band whose [lo, hi] interval contains
    ``value_col``. ``bands`` must be small (broadcast)."""
    cond = (F.col(value_col) >= bands[lo_col]) & (F.col(value_col) <= bands[hi_col])
    return left.join(F.broadcast(bands), cond, "left")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_seconds: int | None = 86_400,
    how: str = "inner",
    auto_percentile: float = 0.95,
) -> DataFrame:
    """LARGE x LARGE interval-overlap join — the range-join case
    ``band_join`` (broadcast-only) cannot cover, decomposed into an
    equi-join Catalyst can shuffle-partition:

    1. each interval explodes into the time-bucket ids it covers
       (``bucket_seconds`` granularity — pick it near the TYPICAL
       interval length so most intervals hit 1-2 buckets);
    2. candidates equi-join on the bucket id (hash-partitioned, AQE
       skew-splittable — never a nested-loop over the cross product);
    3. the exact closed-interval overlap predicate
       (l_start <= r_end AND r_start <= l_end) filters bucket
       neighbors that don't actually overlap;
    4. a pair sharing k buckets appears k times: it is kept ONLY in the
       pair's FIRST common bucket (max of the two first-bucket ids —
       deterministic, computable per row), so dedup costs a filter, not
       a distinct shuffle over the candidate volume.

    ``bucket_seconds=None`` (r7) derives the width IN-PLAN from the
    data: the approximate ``auto_percentile`` (default p95, quantile
    sketch — bounded memory at any scale, unlike the exact percentile
    aggregate which buffers every value) of interval lengths across
    BOTH inputs, clamped to >= 1 s — one 1-row aggregate broadcast to
    each side (the corpus_mixture_plan pattern, no collect at
    build). The p95 choice bounds the bucket fan-out: at
    most ~5% of intervals are longer than one bucket, and an interval
    spanning B buckets costs exactly B candidate rows (pathological
    long intervals stay correct — the explode is per-interval linear,
    never a cross product). The result is width-INDEPENDENT by
    construction (bucketing only generates candidates; the exact
    predicate decides), which the pathological-interval test pins.

    The two inputs must have DISJOINT column names (the join output
    carries both sides un-aliased; a shared name would be ambiguous —
    validated loudly, r6 advice), and the bucket temp column is chosen
    to not collide with any input column.

    Only ``inner`` is supported (an outer variant needs an anti-join
    leg). Timestamp columns must be TIMESTAMP; bounds are inclusive.
    At 100 TB this is the standard range-join decomposition (Spark's
    own storage-partitioned range join and Databricks' range-join hints
    use the same binning idea)."""
    if how != "inner":
        raise ValueError("interval_overlap_join supports how='inner' only")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            "interval_overlap_join requires disjoint column names; both "
            f"sides have: {sorted(overlap)} — alias one side first"
        )
    ls, le = left_bounds
    rs, re_ = right_bounds
    taken = set(left.columns) | set(right.columns)

    def tmp(base: str) -> str:
        name = base
        while name in taken:
            name = "_" + name
        taken.add(name)
        return name

    b_col = tmp("_b")
    if bucket_seconds is not None:
        width_l = width_r = F.lit(int(bucket_seconds) * 1_000_000)
        ljoin, rjoin = left, right
        drop_cols = [b_col]
    else:
        # p95 interval length across both sides, micros, >= 1 s; the
        # greatest() also absorbs the empty-input NULL percentile
        bw_l, bw_r = tmp("_bw"), tmp("_bw_r")
        lengths = left.select(
            (F.unix_micros(F.col(le)) - F.unix_micros(F.col(ls))).alias("_len_us")
        ).unionByName(
            right.select(
                (F.unix_micros(F.col(re_)) - F.unix_micros(F.col(rs))).alias("_len_us")
            )
        )
        # approx_percentile, NOT exact percentile: the exact aggregate
        # buffers every length in the final reducer — an OOM at
        # billions of intervals — while the quantile sketch is
        # bounded-memory and mergeable. Safe because results are
        # WIDTH-INDEPENDENT by construction (bucketing only generates
        # candidates; the exact predicate decides — property-tested),
        # so sketch error only nudges the candidate fan-out.
        stats = lengths.agg(
            F.greatest(
                F.lit(1_000_000),
                F.ceil(
                    F.percentile_approx(
                        "_len_us", F.lit(auto_percentile), F.lit(10_000)
                    )
                ).cast("long"),
            ).alias(bw_l)
        )
        ljoin = left.crossJoin(F.broadcast(stats))
        rjoin = right.crossJoin(F.broadcast(stats.select(F.col(bw_l).alias(bw_r))))
        width_l, width_r = F.col(bw_l), F.col(bw_r)
        drop_cols = [b_col, bw_l, bw_r]

    def bucket(c: str, width) -> "F.Column":
        return F.floor(F.unix_micros(F.col(c)) / width)

    lb = ljoin.withColumn(b_col, F.explode(F.sequence(bucket(ls, width_l), bucket(le, width_l))))
    rb = rjoin.withColumn(b_col, F.explode(F.sequence(bucket(rs, width_r), bucket(re_, width_r))))
    first_common = F.greatest(bucket(ls, width_l), bucket(rs, width_l))
    return (
        lb.join(rb, b_col)
        .filter((F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le)))
        .filter(F.col(b_col) == first_common)
        .drop(*drop_cols)
    )
