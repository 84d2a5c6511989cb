"""Deduplication family (SURVEY.md §2.11; BASELINE.json north-star):
exact, MinHash+LSH banding, SimHash, n-gram Jaccard.

Scale design (100 TB): every variant avoids the quadratic all-pairs
comparison —

- exact: hash-groupBy on a fingerprint (one shuffle).
- MinHash/LSH: signature per doc (map-only), explode to (band, value)
  pairs, shuffle on band value, pairs only WITHIN buckets. Collision
  probability per band = J^r; tune bands x rows-per-band to the target
  Jaccard threshold.
- SimHash: 16/64-bit signature (map-only); near-dup = equal signature
  (or small Hamming distance within LSH buckets of signature chunks).
- n-gram Jaccard: exact verifier applied ONLY to LSH candidate pairs
  (here also exposed standalone over a bounded id range for the oracle).

Hashing is md5-based so the DuckDB oracle can replay it bit-for-bit:
md5 hex strings compare identically in both engines; numeric hashes are
the first 8 hex chars cast via base-16 (< 2^32, exact in BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import fingerprint_md5, shingles

N_HASHES = 8
BAND_ROWS = 2  # hashes per band -> N_HASHES/BAND_ROWS bands


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized-text fingerprint: one hash-groupBy.
    Returns (fingerprint, canonical_id, n_copies)."""
    return (
        df.withColumn("fingerprint", fingerprint_md5(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_hex(shingle_col: Column, salt: int) -> Column:
    """One MinHash value = lexicographic min of salted md5 hex over the
    shingle set. String min is engine-portable (ASCII hex compare)."""
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{salt}|"), s)))
    )


def minhash_signature(df: DataFrame, text_col: str = "text", n_hashes: int = N_HASHES) -> DataFrame:
    """Attach minhash_0..n-1 columns (map-only, no shuffle)."""
    sh = shingles(text_col, k=3)
    out = df.withColumn("_sh", sh)
    for i in range(n_hashes):
        out = out.withColumn(f"minhash_{i}", minhash_hex(F.col("_sh"), i))
    return out.drop("_sh")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """MinHash-LSH candidate generation WITHOUT a cross join:
    signature -> (band_idx, band_val) rows -> self-join within band
    buckets only. Returns distinct (doc_id_a, doc_id_b) with
    n_shared_bands. Docs with empty shingle sets can't collide."""
    sig = minhash_signature(df, text_col, n_hashes).filter(
        F.col("minhash_0").isNotNull()
    )
    n_bands = n_hashes // band_rows
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col(f"minhash_{b * band_rows + r}") for r in range(band_rows)]
                            )
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_id_a"), F.col(f"b.{id_col}").alias("doc_id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def simhash16(df: DataFrame, text_col: str = "text") -> DataFrame:
    """16-bit SimHash over the token multiset (map-only). Bit i is set
    when more token-hashes have bit i set than cleared. Hash = first 8
    md5 hex chars as uint32 (portable to the SQL oracle)."""
    from datapipeline_spike_spark.functions.text import tokens

    hashes = F.transform(
        tokens(text_col), lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    df = df.withColumn("_h", hashes)
    n = F.size("_h")
    bit_terms = []
    for i in range(16):
        ones = F.size(F.filter(F.col("_h"), lambda h: h.bitwiseAND(F.lit(1 << i)) != 0))
        bit_terms.append(F.when(ones * 2 >= n, F.lit(1 << i)).otherwise(F.lit(0)))
    sim = bit_terms[0]
    for t in bit_terms[1:]:
        sim = sim + t
    return df.withColumn(
        "simhash", F.when(n > 0, sim.cast("bigint")).otherwise(F.lit(None))
    ).drop("_h")


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "lang",
    threshold: float = 0.01,
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking group (same
    lang here). This is the VERIFIER stage: at scale it runs on LSH
    candidates, never on the full cross product; standalone use must be
    bounded by the caller (the catalog restricts the id range)."""
    sh = df.select(
        F.col(id_col), F.col(group_col) if group_col else F.lit(1).alias("g"), shingles(text_col, k).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    gcol = group_col or "g"
    joined = a.join(
        b,
        (F.col(f"a.{gcol}") == F.col(f"b.{gcol}"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("doc_id_a"),
            F.col(f"b.{id_col}").alias("doc_id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
