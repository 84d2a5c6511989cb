"""Deterministic corpus sampling / data mixing.

The sampling stage of a training-data pipeline re-weights strata
(language, source, domain) to hit a target mixture. Two properties
matter at 100 TB and neither is provided by ``df.sample()``:

- **Determinism**: reruns, backfills, and downstream audits must make
  the identical keep/drop decision per row. RNG-based sampling ties the
  outcome to partition layout and seed plumbing; a content hash ties it
  to the data alone.
- **Obliviousness**: the decision is a map-only expression — no
  shuffle, no state, trivially pushes through any scan.

``hash_u01`` maps a key column to a uniform [0, 1) double via the first
8 hex chars of md5 (exact in both Spark and the DuckDB oracle — same
technique as the leakage-safe split, operators/dedup.py). A row is kept
when ``u < rate`` where ``rate`` is any per-row expression, so callers
express per-stratum target rates declaratively.

Reference scope: the reference spike (README.md:434-490) samples and
routes records only by quality; mixture control is part of the §2.11
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO_32 = 4294967296.0  # 2^32; md5 prefix is 8 hex chars = 32 bits


def hash_u01(key: Column | str) -> Column:
    """Uniform [0, 1) double derived from md5(key) — deterministic,
    portable (identical in DuckDB: ``('0x' || substr(md5(k),1,8))::BIGINT
    / 4294967296.0``), and independent of partitioning."""
    key = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return bucket / F.lit(_TWO_32)


def stratified_sample(
    df: DataFrame, key: Column | str, rate: Column, *, keep_all: bool = False
) -> DataFrame:
    """Tag (or filter) rows by a deterministic per-stratum sampling
    decision: keep iff hash_u01(key) < rate.

    ``rate`` is a per-row Column (typically a CASE over stratum columns
    with the target mixture weights). With ``keep_all=True`` the frame
    is returned untouched with ``sample_u``/``kept`` columns appended —
    the auditable form; default drops rejected rows."""
    u = hash_u01(key)
    tagged = df.withColumn("sample_u", u).withColumn("kept", u < rate)
    return tagged if keep_all else tagged.filter("kept").drop("sample_u", "kept")
