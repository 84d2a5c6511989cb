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

from datapipeline_spike_spark.cache import materialize_barrier
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
    lazy_rounds: int = 4,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns one row
    per merge round: (step, p1, p2, pair_count, merged).

    Lineage discipline (r7): round N's vocabulary frame ``cur``
    references round N-1 TWICE — once through the argmax ``top`` (whose
    pair counts aggregate cur_{N-1}) and once directly through the
    merge fold — so the unchecked lazy plan does not grow linearly, it
    DOUBLES per round (2^N subtrees; the r6 verdict's "N nested folds"
    under-stated it — a 16-round lazy plan re-executes the vocabulary
    scan ~65k times and never finishes). Production shape: past
    ``lazy_rounds`` the vocabulary frame is truncated with an eager
    ``localCheckpoint`` EVERY round (the ``connected_components``
    pattern), collapsing both references onto materialized rows —
    per-round cost is then flat (~2 vocabulary-bounded aggregations:
    one inside the checkpoint, one when the final union re-reads the
    round's argmax), measured at n_merges 16/32/64 in SCALE_PROBE_r07.
    At or below ``lazy_rounds`` the plan stays fully lazy (2^4 subtrees
    of a vocabulary-bounded aggregate are cheap), so the registered
    3-merge oracle query still builds without firing a job."""
    steps, _ = _train(docs, text_col, n_merges, lazy_rounds)
    out = steps[0]
    for st in steps[1:]:
        out = out.unionByName(st)
    return out


def _train(
    docs: DataFrame, text_col: str, n_merges: int, lazy_rounds: int
) -> tuple[list[DataFrame], DataFrame]:
    """Shared training loop: returns (per-round argmax frames, final
    vocabulary frame (w, f, s) after all merges). See
    :func:`bpe_merges` for the lineage discipline."""
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
        if n_merges > lazy_rounds and step < n_merges:
            cur = cur.transform(materialize_barrier)
    return steps, cur


def bpe_vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    lazy_rounds: int = 0,
) -> DataFrame:
    """The trained subword vocabulary after ``n_merges`` merges:
    (w, f, s) where ``s`` is the word's final symbol sequence. This is
    the ENCODE side of the tokenizer: applying BPE to a corpus is a
    word-level lookup into this frame (words segment independently —
    the defining property that makes BPE encoding embarrassingly
    parallel at 100 TB).

    Default ``lazy_rounds=0`` (unlike :func:`bpe_merges`): the encode
    consumer references the FINAL vocabulary frame, so the 2^n lazy
    subtree duplication is paid in full by whoever executes it —
    measured 6.1 -> ~2 s on the fertility query at sf0.1 by
    checkpointing each round (2 plan-build jobs, the documented
    trade); bpe_merges keeps its fully-lazy default because the driver
    contract values job-free plan build for the training rows."""
    _, cur = _train(docs, text_col, n_merges, lazy_rounds)
    return cur


def bpe_encode_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 3,
    lazy_rounds: int = 0,
) -> DataFrame:
    """Apply the trained merges to the corpus (train -> ENCODE, the
    full tokenizer loop) and report per-document subword statistics:
    (id, n_words, n_units, units_per_word, chars_per_unit). The corpus
    explodes to (doc, word) rows ONCE and equi-joins the trained
    vocabulary on the word — the join build side is vocabulary-bounded,
    the probe side linear in corpus tokens; per-doc sums are map-side
    combined. Words OUTSIDE the trained vocabulary (applying the
    tokenizer to a NEW batch) take the correct BPE out-of-vocabulary
    fallback — character segmentation, i.e. |word| units — via a LEFT
    join + coalesce; for same-corpus application (the registered
    query) every word joins, so the oracle stays exact."""
    vocab_units = bpe_vocabulary(docs, text_col, n_merges, lazy_rounds).select(
        "w",
        F.size("s").alias("units_w"),
        F.length("w").alias("chars_w"),
    )
    dtoks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    return (
        dtoks.join(vocab_units, "w", "left")
        .withColumn("units_w", F.coalesce(F.col("units_w"), F.length("w")))
        .withColumn("chars_w", F.coalesce(F.col("chars_w"), F.length("w")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("units_w").cast("bigint").alias("n_units"),
            F.round(
                F.sum("units_w") * F.lit(1.0) / F.count(F.lit(1)), 6
            ).alias("units_per_word"),
            F.round(
                F.sum("chars_w") * F.lit(1.0) / F.sum("units_w"), 6
            ).alias("chars_per_unit"),
        )
    )
