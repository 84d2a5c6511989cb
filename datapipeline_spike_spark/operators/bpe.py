"""Byte-pair-encoding merge training on-engine (SURVEY §2.12 r6) —
the tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"),
re-expressed as a fully declarative Spark plan:

- the corpus collapses to a (word, freq) vocabulary — the shuffle is
  vocabulary-bounded regardless of corpus size, which is exactly why
  production BPE trainers stream word counts, not tokens;
- each merge round counts adjacent symbol pairs weighted by word freq
  (map-side combined), takes the argmax pair (deterministic count-desc,
  then lexicographic tiebreak) via TakeOrdered, and rewrites every
  word's symbol sequence with a greedy left-to-right fold — the exact
  merge procedure of the reference implementation;
- the winning pair stays IN-PLAN (broadcast 1-row cross join feeding
  the fold lambda) — no driver collect between rounds, so the driver
  harness can build the plan without firing a job.

The DuckDB oracle replays every round: same pair counting, same
argmax tiebreak, and the same greedy fold via ``list_reduce`` (with
the 1-indexed inclusive-slice semantics handled explicitly)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import tokens


def _pairs(s: Column) -> Column:
    """Adjacent symbol pairs of a symbol array — every position counts
    (overlapping occurrences included), matching the reference
    ``get_stats``."""
    n = F.size(s)
    return F.zip_with(
        F.slice(s, 1, n - 1),
        F.slice(s, 2, n - 1),
        lambda a, b: F.struct(a.alias("p1"), b.alias("p2")),
    )


def _merge_fold(s: Column, p1: Column, p2: Column) -> Column:
    """Greedy left-to-right non-overlapping merge of (p1, p2) into one
    symbol: fold the sequence, merging when the accumulator's last
    symbol is p1 and the incoming one is p2. A merged symbol is p1||p2,
    which can itself be p1 of a later position in the SAME pass only if
    p1||p2 == p1 (impossible for non-empty p2) — so no skip flag is
    needed."""
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == p1) & (x == p2),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(p1, p2)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    checkpoint_every: int = 16,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns one row
    per merge round: (step, p1, p2, pair_count, merged).

    Lineage discipline (r7): each round's ``cur`` nests the previous
    round's merge-fold lambda, so round N's unchecked plan carries N
    aggregate-fold expressions — fine at n_merges=3, but plan depth and
    analysis time explode at realistic merge counts (10^3-10^4). Every
    ``checkpoint_every`` rounds the vocabulary frame is truncated with
    an eager ``localCheckpoint`` (the same pattern
    ``connected_components`` uses), bounding plan depth at
    ``checkpoint_every`` folds regardless of n_merges — measured flat
    per-round cost at n_merges=64 in SCALE_PROBE_r07. Checkpoint
    rounds fire their prefix of the training jobs at build time
    (inherent to any iterative plan-truncation scheme); below
    ``checkpoint_every`` merges the plan stays fully lazy, so the
    registered 3-merge oracle query builds without a job."""
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    cur = vocab.select("w", "f", F.split("w", "").alias("s"))
    steps = []
    for step in range(1, n_merges + 1):
        counts = (
            cur.select("f", F.explode(_pairs(F.col("s"))).alias("p"))
            .groupBy(F.col("p.p1").alias("p1"), F.col("p.p2").alias("p2"))
            .agg(F.sum("f").alias("pair_count"))
        )
        top = counts.orderBy(
            F.col("pair_count").desc(), F.col("p1"), F.col("p2")
        ).limit(1)
        steps.append(
            top.select(
                F.lit(step).alias("step"),
                "p1",
                "p2",
                F.col("pair_count").cast("bigint").alias("pair_count"),
                F.concat("p1", "p2").alias("merged"),
            )
        )
        cur = cur.crossJoin(F.broadcast(top.select("p1", "p2"))).select(
            "w", "f", _merge_fold(F.col("s"), F.col("p1"), F.col("p2")).alias("s")
        )
        if step % checkpoint_every == 0 and step < n_merges:
            cur = cur.localCheckpoint(eager=True)
    out = steps[0]
    for st in steps[1:]:
        out = out.unionByName(st)
    return out
