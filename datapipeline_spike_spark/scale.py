"""Scale-posture helpers shared by operators and catalog queries.

At 100 TB a parquet scan arrives in thousands of splits and Spark's
task scheduling saturates every core. At test scale a table can be a
single small file = a single input split, which serializes CPU-heavy
expression work (notably interpreted higher-order-function lambdas like
shingling) onto one core. ``fan_out`` repartitions ONLY in that
degenerate case, so the big-data path never pays an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan has fewer splits
    than cores; no-op otherwise. Use ahead of per-row CPU-heavy work
    (shingling, hashing, vector math) — the shuffle it may introduce
    moves only the tiny under-split input."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt_buckets: int = 8,
    left_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant large-x-large equi-join: the left side gets a
    DETERMINISTIC salt (hash of a unique column — rand() would break
    retries and oracle replay), the right side is replicated once per
    salt value, and the join key becomes (keys + salt). A hot key's rows
    now spread over ``salt_buckets`` reducers instead of one straggler
    task holding the whole key.

    Use when AQE's skew-join splitting can't help (e.g. the hot key's
    build side also overflows); cost = right side replicated
    ``salt_buckets``x, so keep the factor small. For broadcast-able
    right sides just use ``F.broadcast`` — salting is pointless there.

    Only left-preserving join types are allowed: the right side is
    replicated once per salt bucket, so right/full (or right-semi/anti)
    joins would emit every unmatched right row ``salt_buckets`` times.
    Salt the other side instead (swap the operands) for those.
    """
    from pyspark.sql import functions as F

    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): right side is replicated per salt "
            "bucket; only left-preserving joins are valid — swap operands "
            "for right/full variants"
        )
    uniq = left_unique_col or left.columns[0]
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.col(uniq)), F.lit(salt_buckets)))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return l.join(r, [*keys, "_salt"], how).drop("_salt")
