"""Corpus-statistics operators (staged r10, register r11): Zipf
rank-frequency profile, leave-one-out n-gram novelty, interpolated
Kneser-Ney bigram scoring, and the filter-verdict agreement matrix
(Cohen's kappa).

These extend the text-analysis family (SURVEY §2.11/§2.12 — language
ID, unigram/bigram LM, CCNet perplexity buckets) with the three
measurements a corpus-curation run publishes next to its quality
report: does the token distribution look like natural language (Zipf
slope ~ -1), how much of each document is corpus-unique (novelty), and
a properly-smoothed LM fluency score (KN is what KenLM-style filters
actually use; the add-one bigram scorer overweights unseen-context
penalties).

Engine-parity design (the bigram_fluency precedent): every count is
integer-exact on both engines; probabilities are computed from counts
with the SAME left-associated arithmetic text, so each per-element
value is bit-identical cross-engine and only final means/sums are
order-sensitive — absorbed by 6dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions.text import ngrams, tokens

R = 6


def _word_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram TOKEN occurrence (not distinct;
    scoring weights repeated transitions). Docs with < 2 tokens drop."""
    toks = docs.select(F.col(id_col), tokens(text_col).alias("_t")).filter(
        F.size("_t") >= 2
    )
    return toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_t", 1, F.size("_t") - 1),
                F.slice("_t", 2, F.size("_t") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def zipf_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit: OLS of ln(count) on ln(rank) over the
    ``top_n`` most frequent corpus tokens. Natural-language corpora sit
    near slope -1 (Zipf 1949); machine-generated or boilerplate-heavy
    corpora flatten or steepen — this is the one-row distribution
    health check a curation run logs per source.

    Returns ONE row: (n_types, n_tokens, n_fit, slope, intercept, r2),
    floats rounded 6dp.

    Scale shape: token counts are one map-side-combined shuffle on the
    token key (vocabulary-bounded); the rank takes the TOP-N via
    orderBy().limit() (TakeOrderedAndProject — per-partition partial
    top-n, never a global sort); the OLS sums aggregate <= top_n rows.
    Rank ties break (count desc, token asc) identically on both
    engines, so the fitted set is deterministic.
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
    )
    # the unpartitioned rank window runs AFTER the limit — its input is
    # provably <= top_n rows (the WINDOW_OK boundedness argument when
    # this registers)
    top = (
        counts.orderBy(F.col("c").desc(), "tok")
        .limit(top_n)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "tok"))
            .alias("rank"),
            "c",
        )
        .select(F.log("rank").alias("x"), F.log("c").alias("y"))
    )
    fit = top.agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n_fit").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate corpora: < 2 distinct tokens leaves no rank variance
    # (var_x = 0, the OLS is undefined) -> NULL fit, counts still real;
    # constant counts (var_y = 0) leave slope/intercept defined but r2
    # undefined
    fittable = var_x_n > 0
    return (
        fit.crossJoin(F.broadcast(totals))  # 1 row x 1 row
        .select(
            "n_types",
            "n_tokens",
            "n_fit",
            F.when(fittable, F.round(cov_n / var_x_n, R)).alias("slope"),
            F.when(
                fittable,
                F.round((F.col("sy") - (cov_n / var_x_n) * F.col("sx")) / n, R),
            ).alias("intercept"),
            F.when(
                fittable & (var_y_n > 0),
                F.round((cov_n * cov_n) / (var_x_n * var_y_n), R),
            ).alias("r2"),
        )
    )


def ngram_novelty_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Leave-one-out n-gram novelty: per document, the share of its
    DISTINCT word k-grams that appear in no other document (corpus
    document-frequency 1). High novelty = unique content worth keeping;
    low novelty = templated/boilerplate-heavy material even when no
    single near-duplicate partner exists (the complement of pairwise
    dedup). Returns (id, n_distinct_ngrams, n_novel, novelty) with
    novelty rounded 6dp; docs with no k-gram emit (0, 0, NULL).

    Scale shape: per-doc DISTINCT grams -> one shuffle on the gram key
    for document frequency (map-side combined) -> join back on the gram
    key (no hint: distinct grams scale with the corpus) -> per-doc
    counts. No windows, no self-joins; the mega-shared gram is a single
    aggregate key (AQE-splittable).
    """
    doc_grams = (
        docs.select(F.col(id_col), F.explode(ngrams(text_col, k=k)).alias("g"))
        .distinct()
    )
    df_counts = doc_grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        doc_grams.join(df_counts, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_ngrams"),
            F.sum((F.col("_df") == 1).cast("bigint")).alias("n_novel"),
        )
    )
    base = docs.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_distinct_ngrams", F.lit(0)).alias("n_distinct_ngrams"),
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        F.round(F.col("n_novel") / F.col("n_distinct_ngrams"), R).alias("novelty"),
    )


def kneser_ney_bigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    smoothing KenLM-style quality filters actually use, vs the add-one
    stand-in in ``bigram_logprob_score``):

        P(w2|w1) = max(c(w1,w2) - d, 0)/c(w1·)
                   + (d · N1+(w1·)/c(w1·)) · (N1+(·w2)/T)

    where c(w1·) is the context count, N1+(w1·)/N1+(·w2) are distinct
    continuation/out-degree counts, and T the distinct bigram-type
    count. The model is fit on the scored corpus itself, so every doc
    bigram exists in the model (no OOV backoff tier needed). Returns
    (id, n_bigrams, avg_logprob_kn) — mean ln P over the doc's bigram
    OCCURRENCES, rounded 6dp; docs with < 2 tokens drop.

    Parity: all counts integer; d = 0.75 is exact binary; each bigram's
    P is one fixed left-associated expression over integers — bit-
    identical cross-engine; only the per-doc mean is order-sensitive
    (6dp). Scale shape: one bigram pass feeds (a) corpus bigram counts,
    (b) per-context totals + out-degrees, (c) per-word continuation
    counts — all vocabulary-bounded map-side-combined shuffles; the
    scoring joins shuffle on bigram/unigram keys with NO broadcast
    hints (they scale with vocab; AQE decides); only the 1-row T is a
    bounded broadcast.
    """
    bg = _word_bigrams(docs, text_col, id_col)
    doc_bg = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("_n"))
    corpus_bg = doc_bg.groupBy("w1", "w2").agg(F.sum("_n").alias("_c"))
    ctx = corpus_bg.groupBy("w1").agg(
        F.sum("_c").alias("_ctx"),
        F.count(F.lit(1)).alias("_fanout"),  # N1+(w1 .)
    )
    cont = corpus_bg.groupBy("w2").agg(F.count(F.lit(1)).alias("_cont"))  # N1+(. w2)
    types = corpus_bg.agg(F.count(F.lit(1)).alias("_T"))  # 1 row
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("_c") - d, F.lit(0.0)) / F.col("_ctx")
        + ((d * F.col("_fanout")) / F.col("_ctx"))
        * (F.col("_cont") / F.col("_T"))
    )
    return (
        doc_bg.join(corpus_bg, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))  # 1 row (allowlisted totals pattern)
        .groupBy(id_col)
        .agg(
            F.sum("_n").alias("n_bigrams"),
            F.round(
                F.sum(F.col("_n") * F.log(p_kn)) / F.sum("_n"), R
            ).alias("avg_logprob_kn"),
        )
    )


def verdict_agreement_matrix(
    df: DataFrame, verdict_cols: list[str]
) -> DataFrame:
    """Pairwise agreement between boolean quality-filter verdicts
    (staged r10, register r11): for every unordered pair of verdict
    columns, the 2x2 contingency counts, raw agreement, and Cohen's
    kappa. This is the calibration report a curation team reads before
    composing filters (Gopher rules vs classifier vs perplexity vs C4
    line survival): high kappa = redundant filters, low kappa = filters
    that disagree enough to be complementary — or one of them is
    broken. NULL verdicts (docs a filter abstains on) are excluded per
    pair.

    Returns (filter_a, filter_b, n_00, n_01, n_10, n_11, agreement,
    kappa) with floats rounded 6dp; kappa is NULL when either filter is
    constant on the compared rows (pe = 1, the undefined case).

    Scale shape: ONE map-only pass + ONE 1-row aggregate computes all
    C(k,2) pairs' counts (4*C(k,2) conditional sums in a single agg —
    no per-pair scans, no shuffle beyond the final reduce); the pair
    rows come from exploding the 1-row result. Everything downstream
    of the aggregate is bounded by k^2.
    """
    if len(verdict_cols) < 2:
        raise ValueError(
            "verdict_agreement_matrix needs at least 2 verdict columns, "
            f"got {verdict_cols!r}"
        )
    pairs = [
        (a, b)
        for i, a in enumerate(verdict_cols)
        for b in verdict_cols[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        for va in (False, True):
            for vb in (False, True):
                aggs.append(
                    F.sum(
                        (both & (F.col(a) == va) & (F.col(b) == vb)).cast("bigint")
                    ).alias(f"{a}|{b}|{int(va)}{int(vb)}")
                )
    counts = df.agg(*aggs)
    rows = []
    for a, b in pairs:
        c = lambda t, _a=a, _b=b: F.col(f"`{_a}|{_b}|{t}`")
        n = c("00") + c("01") + c("10") + c("11")
        nd = n.cast("double")
        po = (c("00") + c("11")) / nd
        pe = (
            (c("00") + c("01")) * (c("00") + c("10"))
            + (c("10") + c("11")) * (c("01") + c("11"))
        ) / (nd * nd)
        rows.append(
            counts.select(
                F.lit(a).alias("filter_a"),
                F.lit(b).alias("filter_b"),
                c("00").alias("n_00"),
                c("01").alias("n_01"),
                c("10").alias("n_10"),
                c("11").alias("n_11"),
                F.round(po, R).alias("agreement"),
                F.when(
                    pe < 1.0, F.round((po - pe) / (1.0 - pe), R)
                ).otherwise(F.lit(None).cast("double")).alias("kappa"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
