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

Cache lifecycle: the scoring frame is persisted once (three consumers
— dedup input, survivor scoring, final join — would each re-run the
paragraph-dedup + scoring subtree). Callers that collect/write the
result and want the memory back should use ``curate_corpus_scoped``
(a context manager that unpersists on exit) or pass ``cache_handle``
(a list the persisted frames are appended to; unpersist them when
done). The bare call keeps the cache alive for the returned lazy plan
— but freeing it no longer requires ``spark.catalog.clearCache()``,
which evicts every OTHER cache in the session too.
"""

from __future__ import annotations

from contextlib import contextmanager

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

__all__ = ["curate_corpus", "curate_corpus_scoped", "curation_profile"]


def _curation_stages(
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
    cache_handle: list[DataFrame] | None = None,
) -> list[tuple[str, DataFrame]]:
    """The shared stage chain: an ordered list of (stage_name, frame)
    pairs whose LAST element is the curated result. ``curate_corpus``
    returns that last frame; ``curation_profile`` aggregates every
    stage. Stage names are sortable so the profile reads as a funnel."""
    stages: list[tuple[str, DataFrame]] = []
    if html_col is not None:
        df = df.select(F.col(id_col), html_to_text(html_col).alias(text_col))
    else:
        df = df.select(F.col(id_col), F.col(text_col))
    stages.append(("00_input", df))

    # corpus-wide boilerplate removal at paragraph grain; empty docs
    # (all-boilerplate or empty extraction) drop here
    cleaned = paragraph_dedup(
        df, text_col=text_col, id_col=id_col, sep="\n",
        cache_handle=cache_handle,
    )
    cleaned = cleaned.filter(F.length(F.col(text_col)) > 0).select(
        id_col, text_col
    )

    t = tokens(text_col)
    # score BEFORE the floor and persist the pre-floor frame (r19):
    # the stage-10 frame and the post-floor scored frame are now both
    # views of ONE persisted computation, so the paragraph-dedup +
    # tokenize + scoring subtree runs once instead of once per stage
    # consumer (the profile's stage-10 aggregate used to re-run the
    # whole paragraph pipeline). The extra columns on the stage-10
    # frame are harmless: the profile aggregates (n_docs, n_tokens)
    # and curate_corpus only consumes the LAST stage. Lifecycle:
    # appended to ``cache_handle`` when given so the caller can
    # unpersist exactly this frame (see module docstring);
    # curate_corpus_scoped wraps that pattern as a context manager.
    prefloor = cleaned.select(
        F.col(id_col),
        F.col(text_col),
        F.round(quality_score_from_tokens(t, text_col), 6).alias("quality"),
        F.size(t).alias("n_tokens"),
    ).persist()
    if cache_handle is not None:
        cache_handle.append(prefloor)
    stages.append(("10_paragraph_dedup", prefloor))

    scored = prefloor.filter(F.col("quality") >= min_quality)
    stages.append(("20_quality_floor", scored))

    # near-dup collapse keeping the highest-quality copy per cluster
    # (label != survivor: crawl order is not quality order). The
    # assignment covers every scored doc, so the inner joins are total.
    assign = dedup_corpus(
        scored, text_col=text_col, id_col=id_col,
        jaccard_threshold=jaccard_threshold,
    )
    keep = select_canonical(assign, scored, score_col="quality", id_col=id_col)
    # the survivor id set is consumed by every downstream stage frame
    # (the profile's stage-30 aggregate AND the redaction branch) —
    # pin the tiny id frame once so the select_canonical joins don't
    # replay per consumer. persist(), not the r19 eager localCheckpoint
    # (ADVICE r19: the checkpoint's blocks were pinned OUTSIDE
    # cache_handle — DataFrame.unpersist cannot release checkpoint
    # blocks, so curate_corpus_scoped's 'nothing leaks' contract was
    # quietly false until a session-wide drain). persist registers in
    # the handle like the other two frames, shares one materialization
    # across consumers the same way, stays recomputable, and its plan
    # is shallow anyway (dedup_corpus's internals are barrier-
    # truncated), so the checkpoint's plan-size argument doesn't apply.
    keep_ids = (
        keep.filter(F.col(id_col) == F.col("keep_id"))
        .select(id_col)
        .persist()
    )
    if cache_handle is not None:
        cache_handle.append(keep_ids)
    survivors = scored.join(keep_ids, id_col)
    stages.append(("30_neardup_best_copy", survivors))

    # the redaction regex chain is the most expensive map stage in the
    # tail, and the 40-frame has up to three consumers (the profile's
    # stage-40 aggregate, the budget selection, the shard split) —
    # persist so redact runs once per document, not once per consumer
    # (r19; same lifecycle as the pre-floor frame above)
    out = survivors.withColumn(text_col, redact(text_col)).persist()
    if cache_handle is not None:
        cache_handle.append(out)
    stages.append(("40_redacted", out))

    if token_budget is not None:
        # the budget histogram + threshold pipeline would re-run for
        # each consumer (the profile's stage-50 aggregate and the shard
        # stage); the selected frame is budget-bounded — persist (r19)
        out = budget_select(out, "quality", "n_tokens", token_budget, id_col)
        if n_shards is not None:
            out = out.persist()
            if cache_handle is not None:
                cache_handle.append(out)
        stages.append(("50_budget", out))
    if n_shards is not None:
        out = deterministic_shuffle(out, id_col, n_shards, seed=seed)
        stages.append(("60_shards", out))
    return stages


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
    cache_handle: list[DataFrame] | None = None,
) -> DataFrame:
    """Run the full curation pipeline; see module docstring for the
    stage chain and ordering rationale.

    Returns (id_col, text_col, quality, n_tokens [, shard, shuffle_u])
    — one row per surviving document, redacted text, deterministic
    across reruns and input layouts. ``html_col`` switches the front
    door to HTML extraction; ``token_budget``/``n_shards`` enable the
    optional tail stages. Pass ``cache_handle`` (or use
    ``curate_corpus_scoped``) to reclaim the internal persisted frame
    without nuking the whole session cache."""
    return _curation_stages(
        df,
        html_col=html_col,
        text_col=text_col,
        id_col=id_col,
        min_quality=min_quality,
        jaccard_threshold=jaccard_threshold,
        token_budget=token_budget,
        n_shards=n_shards,
        seed=seed,
        cache_handle=cache_handle,
    )[-1][1]


@contextmanager
def curate_corpus_scoped(df: DataFrame, **kwargs):
    """``with curate_corpus_scoped(df, ...) as out:`` — consume ``out``
    (collect/write) INSIDE the block; every internal pinned frame (the
    persisted scoring/redact frames AND the survivor-id frame — ADVICE
    r19 closed: all three ride the handle now, none is a checkpoint)
    is unpersisted on exit, so nothing leaks into the session cache and
    no other cache is touched. Using the lazy ``out`` after the block
    still works but recomputes the scoring subtree."""
    if "cache_handle" in kwargs:
        # forwarding it verbatim would collide with the internal handle
        # below (duplicate keyword); callers who want to own the
        # lifecycle should call curate_corpus(cache_handle=...) directly
        raise TypeError(
            "curate_corpus_scoped manages cache_handle itself; use "
            "curate_corpus(cache_handle=...) for a manual lifecycle"
        )
    handle: list[DataFrame] = []
    try:
        yield curate_corpus(df, cache_handle=handle, **kwargs)
    finally:
        for frame in handle:
            frame.unpersist()


def curation_profile(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The curation funnel as data: one row per pipeline stage with
    surviving (n_docs, n_tokens), plus one row per training shard when
    sharding is enabled ('60_shard_<k>' — the shard histogram). This is
    the acceptance report a curation run publishes next to its shards:
    where documents and tokens were spent, stage by stage.

    n_tokens is the engine-tokenizer count of each stage's CURRENT text
    (recomputed after paragraph-dedup and redaction rewrite it), so the
    token funnel reflects what downstream actually trains on. Every
    per-stage aggregate is a count/sum over the stage frame — the
    profile adds one bounded aggregation per stage on top of the
    pipeline's own cost, nothing corpus-scale."""
    handle = kwargs.pop("cache_handle", None)
    stages = _curation_stages(
        df, text_col=text_col, id_col=id_col, cache_handle=handle, **kwargs
    )
    rows = []
    for name, frame in stages:
        if name == "60_shards":
            rows.append(
                frame.groupBy("shard")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum(F.size(tokens(text_col)).cast("bigint")).alias(
                        "n_tokens"
                    ),
                )
                .select(
                    F.concat(F.lit("60_shard_"), F.col("shard").cast("string"))
                    .alias("stage"),
                    "n_docs",
                    "n_tokens",
                )
            )
            continue
        # stages 10/20/30 carry the n_tokens column computed from the
        # SAME text the stage frame holds (paragraph-dedup output;
        # redaction only rewrites text at stage 40) — summing it is
        # bit-identical to re-tokenizing and skips a regex split per
        # row per stage (r19). Stages 00/40/50 tokenize their current
        # text: 00 has no token column, 40/50 rewrote the text.
        if name.split("_")[0] in ("10", "20", "30"):
            nt = F.col("n_tokens").cast("bigint")
        else:
            nt = F.size(tokens(text_col)).cast("bigint")
        rows.append(
            frame.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.coalesce(F.sum(nt), F.lit(0)).alias("n_tokens"),
            ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def curriculum_phase_plan(
    docs: DataFrame,
    n_phases: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Curriculum schedule (staged r14 wave 2, register r16): split
    each source's documents into ``n_phases`` difficulty phases and
    emit the per-(source, phase) training plan — the table a
    curriculum-learning run (Bengio 2009; applied to LM data ordering
    in e.g. Sequence-Level Curriculum / DataComp-LM ablations) feeds
    its dataloader: easy phases first, per-phase token budgets, and a
    deterministic global interleave position.

    Difficulty = mean token length of the document (6dp from an exact
    integer length sum over the house tokenizer) — the cheap lexical-
    complexity proxy that needs no model. Phase assignment = ntile
    over (difficulty asc, doc_id asc) WITHIN EACH SOURCE: the window
    partitions by source, so at 100 TB there is no global sort — each
    source's docs shuffle once to its partition (skew bounded by the
    largest single source, the same envelope every per-source operator
    in this engine documents). The fully-tie-broken ORDER BY makes
    ntile deterministic and engine-portable (Spark and DuckDB both
    give the first n % k tiles one extra row). The final interleave
    window orders the (source x phase)-grain plan — a bounded frame
    (sources x phases rows), not data-grain.

    Returns one row per (source, phase): n_docs, token_budget (exact
    long sum of doc token counts), mean_difficulty (6dp),
    schedule_pos (1-based position in the phase-major, source-minor
    global order)."""
    from pyspark.sql import Window

    from datapipeline_spike_spark.functions.text import tokens

    toks = tokens(text_col)
    scored = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.size(toks).alias("_nt"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("_sumlen"),
    ).filter(F.col("_nt") > 0).select(
        "source",
        "_id",
        "_nt",
        F.round(F.col("_sumlen") * F.lit(1.0) / F.col("_nt"), 6).alias(
            "_difficulty"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("_difficulty").asc(), F.col("_id").asc()
    )
    phased = scored.withColumn("phase", F.ntile(int(n_phases)).over(w))
    plan = phased.groupBy("source", "phase").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("token_budget"),
        F.round(F.avg("_difficulty"), 6).alias("mean_difficulty"),
    )
    # the interleave window runs over the (sources x phases)-grain plan
    # frame — bounded by construction, never data-grain
    sched = Window.orderBy(F.col("phase").asc(), F.col("source").asc())
    return plan.select(
        "source",
        F.col("phase").cast("long").alias("phase"),
        "n_docs",
        "token_budget",
        "mean_difficulty",
        F.row_number().over(sched).cast("long").alias("schedule_pos"),
    )


def membership_triage(
    docs: DataFrame,
    embeddings: DataFrame,
    dim: int = 64,
    k: int = 5,
    k_frac: float = 0.2,
    dup_threshold: float = 0.35,
    gap_lo: float = 0.035,
    gap_hi: float = 0.055,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Cross-signal membership/contamination triage (staged r19 wave
    11; the VERDICT r18 composite: the Min-K% Prob text signal joined
    with the kNN-graph embedding signal — the two-modality check a
    curation stack actually runs before admitting a scraped document
    near an eval set). Per document, one row with BOTH signals and a
    single routing decision:

    - ``tail_gap`` = avg_logprob - min_k_avg_logprob from
      :func:`~datapipeline_spike_spark.operators.text_stats.
      min_k_prob_profile` (Shi 2023): a MEMBER/near-copy of the
      corpus lacks low-probability outlier tokens (thin tail, small
      gap); template/boilerplate spam carries a heavy synthetic tail
      (large gap).
    - ``top_cos_sim`` / ``top_is_mutual`` = the document's rank-1
      edge from :func:`~datapipeline_spike_spark.operators.
      similarity.knn_graph_edges` over its embedding: the semantic
      near-dup signal the text-side tail cannot see (a paraphrase has
      fresh tokens but a near-identical embedding).

    Routing (first match wins — the precedence IS the semantics, so
    both engines replay it as one CASE):
      'near_dup'   top mutual edge >= dup_threshold — semantically
                   subsumed regardless of token stats;
      'member_risk' tail_gap <= gap_lo — thin outlier tail, the
                   Min-K membership symptom;
      'template'   tail_gap >= gap_hi — synthetic/boilerplate tail;
      'clean'      everything else.
    Default bands measured on the house corpora (gap quantiles q05
    ~0.033 / q95 ~0.067 at both sf0.001 and sf0.01; all four routes
    non-empty at both SFs with these defaults).

    Determinism contract: tail_gap is a difference of two already
    6dp-rounded columns re-rounded to 6dp; the thresholds compare
    against exact decimal literals; the rank-1 edge is the graph's
    deterministic (cos desc, id asc) winner — so the routing column
    hash-checks across engines. Scale shape: the two substrates are
    each one pass (document-partitioned windows / auto-plane bucket
    join); the composite adds ONE doc-grain left join (vec_id aligns
    with doc_id on the house tables) and a map-only CASE — signal
    frames stay at their own grain, nothing re-shuffles wider than
    doc_id."""
    from datapipeline_spike_spark.operators.similarity import knn_graph_edges
    from datapipeline_spike_spark.operators.text_stats import (
        min_k_prob_profile,
    )

    prof = min_k_prob_profile(docs, k_frac=k_frac, id_col=doc_id_col)
    top = (
        knn_graph_edges(embeddings, dim=dim, k=k, id_col=vec_id_col)
        .filter(F.col("rank") == 1)
        .select(
            F.col("src_id").alias("_vid"),
            F.col("cos_sim").alias("top_cos_sim"),
            F.col("is_mutual").alias("top_is_mutual"),
        )
    )
    gap = F.round(
        F.col("avg_logprob") - F.col("min_k_avg_logprob"), 6
    ).alias("tail_gap")
    joined = prof.join(top, prof[doc_id_col] == F.col("_vid"), "left")
    return joined.select(
        doc_id_col,
        "n_tokens",
        "avg_logprob",
        "min_k_avg_logprob",
        gap,
        "top_cos_sim",
        "top_is_mutual",
        F.when(
            F.col("top_is_mutual")
            & (F.col("top_cos_sim") >= float(dup_threshold)),
            F.lit("near_dup"),
        )
        .when(
            F.round(F.col("avg_logprob") - F.col("min_k_avg_logprob"), 6)
            <= float(gap_lo),
            F.lit("member_risk"),
        )
        .when(
            F.round(F.col("avg_logprob") - F.col("min_k_avg_logprob"), 6)
            >= float(gap_hi),
            F.lit("template"),
        )
        .otherwise(F.lit("clean"))
        .alias("triage"),
    )
