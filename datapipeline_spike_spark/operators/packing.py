"""Token-budget sequence packing — the concat-and-chop stage that turns
variable-length chunks into fixed-budget training sequences (SURVEY
§2.11 extension; downstream of ``functions.text.token_chunks``).

Semantics: within each shard, chunks are laid end-to-end in a
deterministic order and the resulting token stream is chopped every
``budget`` tokens (GPT-style pretraining packing). A chunk belongs to
the sequence its FIRST token falls in; a chunk whose span crosses a
chop point is flagged ``straddle``. This rule is expressible as one
window cumulative sum — unlike no-split first-fit, whose bin boundaries
depend on every prior placement and therefore serialize.

Scale posture: the window partitions by ``shard_col``, so state per
task is one running sum over one shard — no global ordering, no
driver state. Shard count is the parallelism knob; at 100 TB you shard
by a hash of the document id and each executor packs its shards
independently, which is exactly how distributed pretraining packers
(per-worker concat-and-chop) behave.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    chunks: DataFrame,
    tokens_col: str = "chunk_tokens",
    order_cols: Sequence[str] = ("doc_id", "chunk_idx"),
    shard_col: str = "shard",
    budget: int = 256,
) -> DataFrame:
    """Assign each chunk a (shard, seq_id, seq_pos) under concat-and-chop.

    ``order_cols`` must be a unique key within a shard (determinism: the
    cumulative sum is over a total order, so the assignment is identical
    under any physical partitioning). Adds:

    - ``seq_id``   — floor(start_offset / budget)
    - ``seq_pos``  — start_offset % budget
    - ``straddle`` — True when the chunk's span crosses a chop point
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy(shard_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    start = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        chunks.withColumn("_start", start)
        .withColumn("seq_id", (F.col("_start") / budget).cast("long"))
        .withColumn("seq_pos", (F.col("_start") % budget).cast("long"))
        .withColumn(
            "straddle",
            F.col("_start") + F.col(tokens_col) - 1 >= (F.col("seq_id") + 1) * budget,
        )
        .drop("_start")
    )


def span_corruption_plan(
    docs: DataFrame,
    noise_density: float = 0.15,
    mean_span_len: float = 3.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5 span-corruption sizing plan (staged r14 wave 3; Raffel et al.
    2020 §3.1.4 / t5.data preprocessors.span_corruption arithmetic) —
    the table a denoising-pretraining dataloader reads to budget
    encoder/decoder sequence lengths BEFORE packing: per document,

        noise_tokens = clamp(floor(n * density + 0.5), 1, n - 1)
        n_spans      = max(1, floor(noise_tokens / mean_span + 0.5))
        input_len    = n - noise_tokens + n_spans   (+1 EOS)
        target_len   = noise_tokens + n_spans + 1   (+1 EOS)

    floor(x + 0.5) is written EXPLICITLY on both engines (Python
    round() is banker's, SQL round() is half-away — the only rounding
    rule both replay bit-identically is the spelled-out half-up).
    Everything is exact integer arithmetic from one token count; docs
    with < 2 tokens are dropped (no valid split). Map-only — composes
    with ``pack_sequences`` downstream exactly like the packing plan.

    Returns (doc_id, n_tokens, noise_tokens, n_spans, input_len,
    target_len)."""
    from datapipeline_spike_spark.functions.text import tokens

    n = F.col("_nt")
    noise = F.greatest(
        F.lit(1),
        F.least(
            F.floor(n * F.lit(float(noise_density)) + F.lit(0.5)),
            n - 1,
        ),
    ).cast("long")
    base = docs.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("_nt")
    ).filter(F.col("_nt") >= 2)
    planned = base.select(
        F.col(id_col),
        F.col("_nt").alias("n_tokens"),
        noise.alias("noise_tokens"),
    ).select(
        F.col(id_col),
        "n_tokens",
        "noise_tokens",
        F.greatest(
            F.lit(1),
            F.floor(
                F.col("noise_tokens") / F.lit(float(mean_span_len))
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("n_spans"),
    )
    return planned.select(
        F.col(id_col),
        "n_tokens",
        "noise_tokens",
        "n_spans",
        (F.col("n_tokens") - F.col("noise_tokens") + F.col("n_spans") + 1)
        .cast("long")
        .alias("input_len"),
        (F.col("noise_tokens") + F.col("n_spans") + 1)
        .cast("long")
        .alias("target_len"),
    )
