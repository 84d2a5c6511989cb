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
