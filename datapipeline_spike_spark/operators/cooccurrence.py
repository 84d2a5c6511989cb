"""Skip-gram co-occurrence statistics + PMI (SURVEY.md §2.11 extension).

The corpus-statistics stage that feeds embedding training (word2vec
skip-gram pair extraction, GloVe co-occurrence matrices — Mikolov 2013,
Pennington 2014) and collocation mining (PMI, Church & Hanks 1990). At
100 TB this is a canonical distributed workload: the pair space is
O(tokens x window) — linear in the corpus — and the whole computation
is map + one hash aggregation per statistic, no self-joins anywhere.

Design (Spark-first):

- **In-row pair generation.** Pairs (t[i], t[j]) for j in (i, i+window]
  are generated inside the row with nested ``transform`` over a bound
  token array (the ngrams() lambda-binding trick from functions/text.py
  — binding the array once keeps the regex split from re-running per
  pair). No positional self-join: the posexplode-then-join formulation
  shuffles the corpus twice and makes the planner re-discover the
  window bound; the in-row form ships straight to a single groupBy.
- **One shuffle per statistic.** Pair counts = explode + hash aggregate
  (map-side partial combine collapses the heavy stopword pairs before
  the exchange). Unigram counts likewise. Totals are 1-row aggregates.
- **No forced broadcasts on vocab-scale sides.** The unigram table
  scales with vocabulary; the PMI joins on w1/w2 are plain equi-joins —
  AQE broadcasts them while small, sort-merges when not (the same rule
  that removed the forced customer/vocab hints this round).
- **Bounded-total crosses only.** ``n_pairs``/``n_tokens`` are single
  rows crossed in via ``F.broadcast`` — the allowlisted 1-row-totals
  pattern shared by 17 sibling queries (tools/plan_audit.py).

Ordered pairs: (w1, w2) means w1 occurs BEFORE w2 within the window, so
counts are direction-sensitive ("new york" vs "york new") and the pair
multiset is deterministic. Symmetric counts are the sum of both
orders, derivable downstream; we keep the finer grain.

PMI definition (documented engine constant, rounded for oracle hashing):

    pmi = ln( (c_xy / N_pairs) / ( (c_x / N_tok) * (c_y / N_tok) ) )

with N_pairs the total ordered-pair observations (pre-threshold) and
N_tok the total token count. ``min_pair_count`` prunes the long tail
BEFORE the vocab joins — at corpus scale the threshold is what keeps
the output (and the join probe side) vocab^2-free.

Oracle path (r9 registration): every step is SQL-expressible in DuckDB
— same tokenizer regex, pair generation via two lateral ``range()``
joins over list indices, ``ln`` + ``round`` for the score. No UDFs on
either engine.

Reference scope: the reference spike (README.md:434-492) has no
embedding-training prep; this is part of the mandated §2.11
LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import tokens

__all__ = ["skipgram_pairs", "cooccurrence_counts", "pmi_scores"]

_ROUND = 6  # PMI rounding for cross-engine hash stability


def skipgram_pairs(c: Column | str, window: int = 4) -> Column:
    """array<struct<w1,w2>> of ordered skip-gram pairs within ``window``.

    For token positions i < j with j - i <= window, emits (t[i], t[j]).
    The token array is bound as a lambda variable before the nested
    transforms run (see functions/text.ngrams for why: interpreted
    higher-order functions re-evaluate outer expressions per element,
    which would re-run the tokenizer regex once per PAIR)."""
    if window < 1:
        raise ValueError(f"window={window}: need at least 1")

    def _pairs(t: Column) -> Column:
        n = F.size(t)
        anchors = F.sequence(F.lit(1), n - 1)  # 1-based; guarded by n >= 2
        return F.when(
            n >= 2,
            F.flatten(
                F.transform(
                    anchors,
                    lambda i: F.transform(
                        F.sequence(i + 1, F.least(i + window, n)),
                        lambda j: F.struct(
                            F.element_at(t, i).alias("w1"),
                            F.element_at(t, j).alias("w2"),
                        ),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return F.element_at(F.transform(F.array(tokens(c)), _pairs), 1)


def cooccurrence_counts(
    df: DataFrame,
    text_col: str = "text",
    window: int = 4,
    min_pair_count: int = 1,
) -> DataFrame:
    """(w1, w2, pair_count) — ordered skip-gram co-occurrence counts.

    explode + groupBy: one shuffle, map-side partial aggregation absorbs
    the stopword-pair skew before the exchange (any residual hot pair is
    a single aggregate key, AQE-splittable)."""
    pairs = df.select(F.explode(skipgram_pairs(text_col, window)).alias("p"))
    counts = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("pair_count"))
    if min_pair_count > 1:
        counts = counts.filter(F.col("pair_count") >= min_pair_count)
    return counts


def pmi_scores(
    df: DataFrame,
    text_col: str = "text",
    window: int = 4,
    min_pair_count: int = 2,
) -> DataFrame:
    """(w1, w2, pair_count, w1_count, w2_count, pmi) for all ordered
    pairs with pair_count >= min_pair_count, pmi rounded to 6 places.

    The corpus is scanned by three independent map+aggregate subtrees
    (pairs, unigrams, per-doc sizes for the pair total) — with column
    pruning each reads only ``text_col``, and all three parallelize
    freely; that beats persisting the exploded pair frame, which is
    window-times larger than the corpus. ``N_pairs`` uses the closed
    form sum_i min(window, n-i) per document, so the pre-threshold pair
    pipeline never runs twice. Totals are 1-row broadcasts; the w1/w2
    unigram joins are hint-free (vocabulary scales with the corpus)."""
    counts = cooccurrence_counts(df, text_col, window, min_pair_count)

    uni = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("w_count"))
    )
    n_tokens = uni.agg(F.sum("w_count").cast("double").alias("n_tokens"))

    # Total ordered pairs per doc, closed form: for n tokens each anchor
    # i in [1, n-1] pairs with min(window, n-i) successors.
    n = F.size(tokens(text_col))
    w = F.lit(window)
    per_doc = F.when(
        n > w, w * (n - w) + w * (w - 1) / 2
    ).otherwise(n * (n - 1) / 2)
    n_pairs = df.select(per_doc.cast("double").alias("np")).agg(
        F.sum("np").alias("n_pairs")
    )

    return (
        counts.join(
            uni.select(F.col("w").alias("w1"), F.col("w_count").alias("w1_count")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("w_count").alias("w2_count")),
            "w2",
        )
        .crossJoin(F.broadcast(n_pairs))  # 1 row (allowlisted totals pattern)
        .crossJoin(F.broadcast(n_tokens))  # 1 row
        .select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            "w2_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_pairs"))
                    / (
                        (F.col("w1_count") / F.col("n_tokens"))
                        * (F.col("w2_count") / F.col("n_tokens"))
                    )
                ),
                _ROUND,
            ).alias("pmi"),
        )
    )
