"""Candidate-volume probe for the r15 dHash multi-probe rewrite.

The r13/r14 VERDICTs flagged the 8x8-bit banded-Hamming join behind
``dhash_neardup_pairs`` as the one registered plan with a quadratic
scale ceiling: ~256 distinct values per band means ~n^2 * 8/256 =
n^2/32 candidate pairs on a uniformly-hashed corpus. r15 replaced it
with multi-probe over four 16-bit bands (each side's band value + its
16 one-bit flips on the probe side): same complete recall at
max_hamming <= 7, candidate volume ~n^2 * 68/65536 ~= n^2/964.

This probe MEASURES both layouts' candidate counts (the band-join row
count before exact verification) on deterministic uniform hashes at
two scales, plus the end-to-end runtime of the shipped operator, and
writes DHASH_PROBE_r15.json. Expected shape: old/new candidate ratio
~30x, and the new layout's candidate count growing ~n^2/964 (so ~10^6
hashes => ~10^9 candidates spread across executors — tractable where
the old layout's ~3*10^10 was not).

Usage: python tools/dhash_probe_r15.py [n1 n2 ...]   (default 20000 100000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from datapipeline_spike_spark.operators.dedup import dhash_neardup_pairs  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402


def uniform_hashes(spark, n: int):
    """n deterministic uniform 64-bit hashes as two uint32-range words."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"), F.xxhash64("id").alias("_h")
    )
    return base.select(
        "media_id",
        F.shiftrightunsigned("_h", 32).alias("dhash_w0"),
        F.col("_h").bitwiseAND(F.lit(0xFFFFFFFF)).alias("dhash_w1"),
    )


def old_8x8_candidates(h):
    """The retired 8x8-bit band join, reconstructed verbatim for the
    comparison (candidate rows = join output with id_a < id_b)."""
    bands = h.select(
        F.col("media_id").alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(
                            F.col("dhash_w0") if i < 4 else F.col("dhash_w1"),
                            8 * (i % 4),
                        ).bitwiseAND(F.lit(0xFF)).alias("band_val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("b"),
    ).select("_id", "b.band_idx", "b.band_val")
    a = bands.select(F.col("_id").alias("id_a"), "band_idx", "band_val")
    b = bands.select(F.col("_id").alias("id_b"), "band_idx", "band_val")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
    )


def new_multiprobe_candidates(h):
    """The shipped 4x16-bit multi-probe join's candidate volume,
    reconstructed with the same band/probe expressions as
    dhash_neardup_pairs (which does not expose its internals)."""
    bands = h.select(
        F.col("media_id").alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(
                            F.col("dhash_w0") if i < 2 else F.col("dhash_w1"),
                            16 * (i % 2),
                        ).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("_id", "b.band_idx", "b.band_val")
    probes = bands.select(
        "_id",
        "band_idx",
        F.explode(
            F.concat(
                F.array(F.col("band_val")),
                F.transform(
                    F.array(*[F.lit(1 << j) for j in range(16)]),
                    lambda m: F.col("band_val").bitwiseXOR(m),
                ),
            )
        ).alias("band_val"),
    )
    a = probes.select(F.col("_id").alias("id_a"), "band_idx", "band_val")
    b = bands.select(F.col("_id").alias("id_b"), "band_idx", "band_val")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 100000]
    spark = get_session("dhash-probe-r15")
    out = {"sizes": []}
    for n in sizes:
        h = uniform_hashes(spark, n).localCheckpoint(eager=True)
        t0 = time.monotonic()
        old_c = old_8x8_candidates(h).count()
        t_old = time.monotonic() - t0
        t0 = time.monotonic()
        new_c = new_multiprobe_candidates(h).count()
        t_new = time.monotonic() - t0
        t0 = time.monotonic()
        pairs = dhash_neardup_pairs(h).count()
        t_e2e = time.monotonic() - t0
        row = {
            "n_hashes": n,
            "candidates_8x8": old_c,
            "candidates_multiprobe": new_c,
            "candidate_ratio": round(old_c / max(new_c, 1), 2),
            "sec_count_8x8": round(t_old, 3),
            "sec_count_multiprobe": round(t_new, 3),
            "verified_pairs": pairs,
            "sec_e2e_multiprobe": round(t_e2e, 3),
        }
        out["sizes"].append(row)
        print(json.dumps(row), flush=True)
    with open("/root/repo/DHASH_PROBE_r15.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
