"""Distributed synopsis sketches.

HLL++ already ships with Spark (``approx_count_distinct``; asserted
within tolerance in tests/test_operators.py). This module adds the
sketches that are USEFUL PRECISELY BECAUSE they are deterministic:
a KMV (k-minimum-values) bottom-k synopsis over md5-hashed values.

Why KMV next to HLL at 100 TB:
- the synopsis is a mergeable k-row set — partial bottom-k per Arrow
  batch, union, global bottom-k — so the shuffle is k x partitions
  rows, never the data;
- it is exactly reproducible (content hash, no RNG, no engine-specific
  register layout), so a DuckDB oracle can replay the estimate to the
  last bit — HLL sketches never replay across engines;
- the same bottom-k set doubles as a deterministic uniform sample of
  the distinct values (the classic KMV/bottom-k duality).

Estimator: with u_(k) = the k-th smallest hash mapped into [0, 1),
D-hat = (k - 1) / u_(k)  (Bar-Yossef et al., the standard KMV form).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO_32 = 4294967296.0


def hash_u01_expr(col: Column | str) -> Column:
    """md5-derived uniform [0,1) draw — same portable construction as
    operators.sampling.hash_u01 (first 8 md5 hex chars / 2^32)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) / F.lit(_TWO_32)


def kmv_bottom_k(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The KMV synopsis: the k smallest DISTINCT hash draws of ``col``,
    one row each, column ``u``.

    Scale shape: a per-Arrow-batch partial bottom-k inside
    ``mapInPandas`` (the same partial-top-k trick as
    similarity.brute_force_topk_blas) cuts each partition's output to
    <= k rows per batch; only those survivors hit the single final sort
    — the wire carries O(k x batches), never the corpus. The final
    global bottom-k is a LIMIT k over a k-bounded input, not a full
    sort of the data."""
    hashed = df.select(hash_u01_expr(col).alias("u"))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({"u": pdf["u"].drop_duplicates().nsmallest(k)})

    survivors = hashed.mapInPandas(partial, schema="u double")
    # distinct before the limit: the same value appearing in two batches
    # must occupy one slot, not two (KMV is over distinct values)
    return survivors.distinct().orderBy("u").limit(k)


def heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """All values of ``col`` with frequency > n/k, with EXACT counts —
    the two-pass frequent-items scheme that keeps the sketch's bounded
    memory AND a deterministic, oracle-checkable output:

    - **Pass 1 (candidates, bounded)**: within each Arrow batch, keep
      values with batch frequency > batch_size/k. Pigeonhole soundness:
      a value with global frequency > n/k must exceed the threshold in
      at least one batch (if f_b <= n_b/k in every batch, summing gives
      f <= n/k) — so no true heavy hitter is ever missed, and each
      batch emits < k candidate rows, the Misra-Gries memory bound.
    - **Pass 2 (exact)**: semi-join the corpus to the (tiny, broadcast)
      candidate set, count exactly, filter > n/k.

    Unlike one-pass Misra-Gries, whose approximate counts depend on
    partition layout, the output here is partition-invariant: the
    candidate set may vary with layout, but it always contains every
    true heavy hitter, and the exact recount + threshold make the final
    rows a pure function of the data. Returns (value, freq) with
    ``value`` named after ``col``."""
    n = df.count()  # 1-row scalar; the threshold needs the exact total
    threshold = n / k

    def candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts = pdf[col].value_counts()
            keep = counts[counts > len(pdf) / k]
            yield pd.DataFrame({col: keep.index})

    cand = df.select(col).mapInPandas(candidates, schema=df.select(col).schema).distinct()
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > threshold)
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row frame: (k, kmv_estimate) where the estimate is
    (k-1)/u_(k) over the bottom-k synopsis — or the exact synopsis size
    when fewer than k distinct values exist (the under-full regime is
    exact by construction). Exactly reproducible across engines and
    runs — the property HLL can't offer."""
    synopsis = kmv_bottom_k(df, col, k)
    n = F.count(F.lit(1))
    return synopsis.agg(
        n.alias("k"),
        F.when(n < k, n.cast("double"))
        .otherwise((n - F.lit(1.0)) / F.max("u"))
        .alias("kmv_estimate"),
    )


def minhash_band_tuning(
    spark,
    n_hashes: int = 128,
    s_step: float = 0.05,
) -> "DataFrame":
    """MinHash-LSH banding design table (staged r14 wave 4; Leskovec/
    Rajaraman/Ullman ch.3 S-curve analysis) — the measure-don't-guess
    companion the LSH operators cite when picking (bands, rows): for
    every (b, r) factorization of ``n_hashes`` and every similarity s
    on the ``s_step`` grid,

        p_candidate     = 1 - (1 - s^r)^b
        approx_threshold = (1/b)^(1/r)   (the S-curve inflection)

    An operator owner reads this table to choose the banding whose
    threshold brackets the dedup target before trusting
    lsh_candidate_pairs at scale. Pure in-plan arithmetic over a
    generated grid (sum of divisors x grid rows — tens of rows, no
    input table); pow/exp differences between engines are ~1 ulp,
    absorbed by the house 6dp rounding.

    Returns (n_hashes, bands, rows_per_band, s, p_candidate,
    approx_threshold)."""
    bs = [b for b in range(1, int(n_hashes) + 1) if n_hashes % b == 0]
    n_steps = int(round(1.0 / s_step)) - 1
    grid = spark.range(1, n_steps + 1).select(
        (F.col("id") * F.lit(float(s_step))).alias("s")
    )
    factor = spark.createDataFrame(
        [(int(n_hashes), b, int(n_hashes) // b) for b in bs],
        "n_hashes long, bands long, rows_per_band long",
    )
    return (
        factor.crossJoin(grid)
        .select(
            "n_hashes",
            "bands",
            "rows_per_band",
            F.round("s", 6).alias("s"),
            F.round(
                F.lit(1.0)
                - F.pow(
                    F.lit(1.0) - F.pow("s", F.col("rows_per_band")),
                    F.col("bands"),
                ),
                6,
            ).alias("p_candidate"),
            F.round(
                F.pow(
                    F.lit(1.0) / F.col("bands"),
                    F.lit(1.0) / F.col("rows_per_band"),
                ),
                6,
            ).alias("approx_threshold"),
        )
    )
