"""Instruction-tuning data-prep operators (staged r14 wave 7,
register r16+): chat-transcript validation and DPO preference-pair
construction — the post-pretraining data family (SFT / RLHF) next to
the pretraining curation stack.

Why these belong in the engine: an instruction-tuned model's data
pipeline runs exactly two structural passes the pretraining stack
lacks — (1) transcript VALIDATION (role alternation, turn counts,
per-role token budgets; malformed transcripts silently corrupt loss
masking) and (2) preference-PAIR construction from scored candidate
completions (the DPO/RLHF input grain is (prompt, chosen, rejected)
with a margin floor). Reference scope: the reference docs describe
quality routing and admission gating (README.md routing section);
these are the same gates at the transcript and preference grains,
Spark-first.

Engine-parity design: turns are parsed with one split + HOF battery
(no UDF); every count is an exact integer; the only float is the
margin, an exact difference of already-rounded scores. Both operators
are SQL-replayable line for line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import tokens

# transcript line prefixes, lowercase (the plant and the parser agree)
ROLE_USER = "user: "
ROLE_ASSISTANT = "assistant: "


def chat_turn_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-transcript structural validation for SFT corpora: split the
    text into lines, classify each as a user turn, an assistant turn,
    or noise (neither prefix), and emit the stats a loss-masking
    dataloader checks before admitting the transcript:

    - n_turns / n_user / n_assistant / n_noise_lines (exact counts)
    - starts_with_user, strict_alternation (every turn's role differs
      from the previous TURN's role — noise lines don't break a pair),
      ends_with_assistant: the three structural gates
    - assistant_token_share = round(assistant_tokens / turn_tokens, 6)
      — the share of supervised tokens, the number that decides
      whether the transcript is worth its sequence-length budget.
      NULL when turn_tokens = 0 (every turn's content tokenizes
      empty, e.g. punctuation-only turns): there is no share to
      report, and the explicit guard pins the semantics rather than
      leaning on division-by-zero behavior (ADVICE r14)
    - is_valid = starts_with_user AND strict_alternation AND
      ends_with_assistant AND n_turns >= 2 AND turn_tokens >= 1 —
      the last conjunct means a NULL share can never ride on a
      transcript marked valid (a transcript with zero supervisable
      tokens is structurally worthless regardless of turn shape)

    Scale shape: map-only until a doc-grain aggregate over the
    exploded turn frame (one shuffle keyed by transcript id); the
    alternation check uses a transcript-partitioned lag window on the
    TURN grain. Docs with zero turns are dropped (nothing to
    validate). Returns one row per transcript."""
    lines = docs.select(
        F.col(id_col).alias("_cid"),
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), "\n"), lambda l0: F.trim(l0)
                ),
                lambda l: l != "",
            )
        ).alias("_pos", "_line"),
    )
    low = F.lower(F.col("_line"))
    role = (
        F.when(low.startswith(ROLE_USER), F.lit("user"))
        .when(low.startswith(ROLE_ASSISTANT), F.lit("assistant"))
        .otherwise(F.lit("noise"))
    )
    # token counts are CONTENT-only (the role prefix is template, not
    # supervised text): strip 'user: ' / 'assistant: ' before counting
    content = (
        F.when(low.startswith(ROLE_USER), F.col("_line").substr(F.lit(len(ROLE_USER) + 1), F.length("_line")))
        .when(
            low.startswith(ROLE_ASSISTANT),
            F.col("_line").substr(F.lit(len(ROLE_ASSISTANT) + 1), F.length("_line")),
        )
        .otherwise(F.col("_line"))
    )
    classified = lines.select(
        "_cid",
        "_pos",
        role.alias("_role"),
        F.size(tokens(content)).alias("_ntok"),
    )
    turns = classified.filter(F.col("_role") != "noise")
    w = Window.partitionBy("_cid").orderBy("_pos")
    seq = turns.select(
        "_cid",
        "_pos",
        "_role",
        "_ntok",
        F.lag("_role").over(w).alias("_prev"),
        F.row_number().over(w).alias("_tn"),
    )
    per_doc = seq.groupBy("_cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("_role") == "user").cast("long"))
        .cast("long")
        .alias("n_user"),
        F.sum((F.col("_role") == "assistant").cast("long"))
        .cast("long")
        .alias("n_assistant"),
        F.min(
            F.when(F.col("_tn") == 1, F.col("_role") == "user")
        ).alias("starts_with_user"),
        F.min(
            F.when(
                F.col("_prev").isNotNull(), F.col("_role") != F.col("_prev")
            ).otherwise(F.lit(True))
        ).alias("strict_alternation"),
        F.max_by("_role", "_pos").alias("_last_role"),
        F.sum("_ntok").cast("long").alias("turn_tokens"),
        F.sum(
            F.when(F.col("_role") == "assistant", F.col("_ntok")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("assistant_tokens"),
    )
    noise = classified.filter(F.col("_role") == "noise").groupBy("_cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_noise_lines")
    )
    out = per_doc.join(noise, "_cid", "left").select(
        F.col("_cid").alias(id_col),
        "n_turns",
        "n_user",
        "n_assistant",
        F.coalesce("n_noise_lines", F.lit(0))
        .cast("long")
        .alias("n_noise_lines"),
        "starts_with_user",
        "strict_alternation",
        (F.col("_last_role") == "assistant").alias("ends_with_assistant"),
        "turn_tokens",
        "assistant_tokens",
        F.when(
            F.col("turn_tokens") > 0,
            F.round(
                F.col("assistant_tokens") * F.lit(1.0)
                / F.col("turn_tokens"),
                6,
            ),
        ).alias("assistant_token_share"),
    )
    return out.withColumn(
        "is_valid",
        F.col("starts_with_user")
        & F.col("strict_alternation")
        & F.col("ends_with_assistant")
        & (F.col("n_turns") >= 2)
        & (F.col("turn_tokens") >= 1),
    )


def dpo_pair_plan(
    candidates: DataFrame,
    margin_floor: float = 0.1,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    score_col: str = "score",
) -> DataFrame:
    """DPO/RLHF preference-pair construction from scored candidate
    completions (Rafailov 2023's input grain): per prompt, CHOSEN =
    the top-scored candidate, REJECTED = the bottom-scored one
    (rounded-score + id tiebreak — the house engine-portable ranking),
    kept only when the margin (chosen - rejected, on the rounded
    scores) clears ``margin_floor`` — near-tie pairs teach nothing and
    add label noise. Prompts with < 2 candidates are dropped (no pair
    exists).

    Scale shape: ONE prompt-partitioned window pass computes both
    extremes (no self-join of the candidate table); output is
    prompt-grain. A single-candidate prompt yields the same row as
    chosen AND rejected and is dropped by the identity filter (its
    margin is 0 anyway). Returns (prompt_id, chosen_id, rejected_id,
    chosen_score, rejected_score, margin)."""
    r = F.round(F.col(score_col), 6)
    base = candidates.select(
        F.col(prompt_col).alias("prompt_id"),
        F.col(cand_col).alias("cand_id"),
        r.alias("_s"),
    )
    w = Window.partitionBy("prompt_id")
    wd = w.orderBy(F.desc("_s"), F.asc("cand_id"))
    wa = w.orderBy(F.asc("_s"), F.desc("cand_id"))
    ranked = base.select(
        "prompt_id",
        "cand_id",
        "_s",
        F.row_number().over(wd).alias("_top"),
        F.row_number().over(wa).alias("_bot"),
    )
    tops = ranked.filter(F.col("_top") == 1).select(
        "prompt_id",
        F.col("cand_id").alias("chosen_id"),
        F.col("_s").alias("chosen_score"),
    )
    bots = ranked.filter(F.col("_bot") == 1).select(
        "prompt_id",
        F.col("cand_id").alias("rejected_id"),
        F.col("_s").alias("rejected_score"),
    )
    return (
        tops.join(bots, "prompt_id")
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            "prompt_id",
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 6
            ).alias("margin"),
        )
        .filter(F.col("margin") >= float(margin_floor))
    )


def best_of_n_selection(
    candidates: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    score_col: str = "score",
) -> DataFrame:
    """Best-of-n (rejection-sampling) selection table (staged r17
    wave 9; the WebGPT / Llama-2 rejection-sampling data-prep step):
    per prompt, the reward-model argmax candidate plus the pool
    statistics the sampling report publishes — how many candidates
    were drawn, the selected score, the pool mean, the population
    standard deviation, and the selection gap (best - mean, the
    quantity that tells you whether drawing more candidates still
    buys reward). The DPO sibling (:func:`dpo_pair_plan`) keeps the
    extremes as a PAIR; this keeps only the winner — the SFT-on-best
    construction.

    Determinism contract: the winner is min_by over the struct
    (negated 6dp-rounded score, cand_id) — highest score, smallest id
    on ties (rounding first so the argmax replays across engines; the
    dpo_pair_plan convention). The negation sits on the SCORE (numeric
    by contract), never on the id, so string candidate ids work —
    ADVICE r17 flagged the earlier -cand_id form as narrower than the
    dpo sibling it cites. NULL scores are coalesced to -inf INSIDE the
    ordering struct (ADVICE r18: a struct comparison sorts a NULL
    field FIRST, so under min_by a bare NULL negation would let a
    NULL-score candidate win best_id while best_score/mean_score skip
    NULLs — an internally inconsistent row); with the coalesce a
    NULL-score candidate loses to any scored one, and an all-NULL
    prompt falls back to the smallest id with NULL best_score, which
    is exactly the oracle's NULLS-LAST row_number. stddev is the
    POPULATION form
    (sqrt(E[x^2] - E[x]^2 computed as avg of squares minus square of
    avg would be catastrophic — both engines' stddev_pop is the
    numerically-stable Welford form and agrees at 6dp on bounded
    scores). Single-candidate prompts are kept (gap 0, std 0) — the
    report needs them visible, unlike DPO which must drop them.

    Scale shape: ONE prompt-keyed aggregate — no window, no join, no
    Python; map-side partial aggregation makes it a single shuffle of
    prompt-grain rows.

    Returns (prompt_id, n_candidates, best_id, best_score, mean_score,
    std_score, selection_gap), floats 6dp."""
    s6 = F.round(F.col(score_col), 6)
    # NULL-proof argmax key: -inf for a NULL score so it can never win
    # (struct comparison would otherwise rank the NULL field first)
    s6_key = -F.coalesce(s6, F.lit(float("-inf")))
    agg = candidates.groupBy(F.col(prompt_col).alias("prompt_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.min_by(
            F.col(cand_col), F.struct(s6_key, F.col(cand_col))
        ).alias("best_id"),
        F.max(s6).alias("best_score"),
        F.round(F.avg(s6), 6).alias("mean_score"),
        F.round(F.coalesce(F.stddev_pop(s6), F.lit(0.0)), 6).alias(
            "std_score"
        ),
    )
    return agg.select(
        "prompt_id",
        "n_candidates",
        "best_id",
        "best_score",
        "mean_score",
        "std_score",
        F.round(F.col("best_score") - F.col("mean_score"), 6).alias(
            "selection_gap"
        ),
    )
