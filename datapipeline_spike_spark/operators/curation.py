"""End-to-end corpus curation assembly (SURVEY.md §2.11 capstone).

One call chaining the engine's pipeline stages in the order a real
pretraining data pipeline runs them — the "crawl in, training shards
out" product surface, built entirely from operators that are each
individually oracle- or test-verified:

    HTML -> text (optional)            operators/html.html_to_text
    -> paragraph boilerplate dedup     operators/dedup.paragraph_dedup
    -> quality score + floor           functions/text.quality_score
    -> near-dup dedup, BEST-copy keep  operators/dedup.dedup_corpus
                                       + select_canonical
    -> PII redaction                   operators/redaction.redact
    -> token-budget selection (opt)    operators/sampling.budget_select
    -> deterministic shard+order (opt) operators/sampling.deterministic_shuffle

Stage-order rationale (each is a real pipeline constraint):

- paragraph dedup FIRST: shared boilerplate both inflates quality
  scores and floods near-dup buckets; removing it up front is what
  keeps the LSH stage's bucket distribution sane at corpus scale.
- quality BEFORE near-dup dedup: the scores feed the keep-best-copy
  survivor policy, and the floor shrinks the LSH input.
- redaction AFTER dedup: redaction rewrites text, so running it
  earlier would perturb fingerprints and split identical docs into
  different dedup groups.
- budget/shuffle LAST: selection must see the final deduped corpus,
  and shard assignment is a property of exactly the surviving rows.

Everything except ``dedup_corpus`` is map-only or bounded-aggregate;
the near-dup stage carries the pipeline's only corpus-scale shuffles
and is the engine's guarded LSH path (hot-bucket chunked joins,
size-gated components). Determinism end to end: every stage keys off
content hashes, so reruns and backfills produce identical corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import (
    quality_score_from_tokens,
    tokens,
)
from datapipeline_spike_spark.operators.dedup import (
    dedup_corpus,
    paragraph_dedup,
    select_canonical,
)
from datapipeline_spike_spark.operators.html import html_to_text
from datapipeline_spike_spark.operators.redaction import redact
from datapipeline_spike_spark.operators.sampling import (
    budget_select,
    deterministic_shuffle,
)

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    *,
    html_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.8,
    token_budget: float | None = None,
    n_shards: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Run the full curation pipeline; see module docstring for the
    stage chain and ordering rationale.

    Returns (id_col, text_col, quality, n_tokens [, shard, shuffle_u])
    — one row per surviving document, redacted text, deterministic
    across reruns and input layouts. ``html_col`` switches the front
    door to HTML extraction; ``token_budget``/``n_shards`` enable the
    optional tail stages."""
    if html_col is not None:
        df = df.select(
            F.col(id_col), html_to_text(html_col).alias(text_col)
        )
    else:
        df = df.select(F.col(id_col), F.col(text_col))

    # corpus-wide boilerplate removal at paragraph grain; empty docs
    # (all-boilerplate or empty extraction) drop here
    df = paragraph_dedup(df, text_col=text_col, id_col=id_col, sep="\n")
    df = df.filter(F.length(F.col(text_col)) > 0)

    t = tokens(text_col)
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        F.round(quality_score_from_tokens(t, text_col), 6).alias("quality"),
        F.size(t).alias("n_tokens"),
    ).filter(F.col("quality") >= min_quality)
    # three consumers below (dedup input, survivor scoring, final join)
    # would each re-run the paragraph-dedup + scoring subtree; lazy
    # persist computes it once — dedup_corpus's own eager materialize
    # is the first action, so the cache fills there (spills to disk at
    # corpus scale rather than pinning memory). The cache outlives the
    # call on purpose: the returned plan still reads it; callers done
    # with the result free it via spark.catalog.clearCache() or by
    # writing the result out.
    scored = scored.persist()

    # near-dup collapse keeping the highest-quality copy per cluster
    # (label != survivor: crawl order is not quality order). The
    # assignment covers every scored doc, so the inner joins are total.
    assign = dedup_corpus(
        scored, text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold,
    )
    keep = select_canonical(assign, scored, score_col="quality", id_col=id_col)
    survivors = scored.join(
        keep.filter(F.col(id_col) == F.col("keep_id")).select(id_col), id_col
    )

    out = survivors.withColumn(text_col, redact(text_col))

    if token_budget is not None:
        out = budget_select(out, "quality", "n_tokens", token_budget, id_col)
    if n_shards is not None:
        out = deterministic_shuffle(out, id_col, n_shards, seed=seed)
    return out
