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

from datapipeline_spike_spark.cache import materialize_barrier
from datapipeline_spike_spark.functions.text import ngrams, tokens
from datapipeline_spike_spark.scale import fan_out

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
    # materialize the two count frames ONCE (r19): doc_bg feeds the
    # corpus model AND the scoring join; corpus_bg feeds FOUR consumers
    # (ctx, cont, the 1-row T, the scoring join). Catalyst compiles
    # each consumer's subtree independently, so without the barriers
    # the tokenize+bigram pipeline replayed ~5x per run. doc_bg is the
    # (doc, bigram) count frame an n-gram LM fit materializes anyway;
    # corpus_bg is vocabulary-bounded. Eager localCheckpoint =
    # lineage-free blocks drained by cache.unpersist_all.
    doc_bg = (
        bg.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .transform(materialize_barrier)
    )
    corpus_bg = (
        doc_bg.groupBy("w1", "w2")
        .agg(F.sum("_n").alias("_c"))
        .transform(materialize_barrier)
    )
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


def token_distribution_drift(
    docs: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-drift report between two snapshots/sources (staged r11,
    register r12): add-one-smoothed unigram distributions for the rows
    where ``group_col`` is ``group_a`` vs ``group_b``, compared by
    KL(a||b), KL(b||a), and the Jensen-Shannon divergence — the
    monitoring number a pipeline publishes when a crawl snapshot or an
    upstream source changes (JS near 0 = same distribution; drift
    trends are what page re-crawl/re-filter decisions key on).

    Returns ONE row: (n_tokens_a, n_tokens_b, vocab_a, vocab_b,
    vocab_union, kl_ab, kl_ba, js_divergence), divergences in nats
    rounded 6dp (NULL when either side is empty).

    Parity: p(t) = (c+1)/(n+V) from integer counts with identical
    arithmetic text both engines; only the final sums are
    order-sensitive (6dp). Scale shape: ONE vocabulary-bounded
    map-side-combined token aggregate with conditional per-side sums,
    a 1-row totals broadcast-cross, one final 1-row reduce — no joins
    on data-scale keys, no windows."""
    is_a = F.col(group_col) == group_a
    toks = docs.filter(F.col(group_col).isin([group_a, group_b])).select(
        is_a.alias("_is_a"), F.explode(tokens(text_col)).alias("tok")
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.col("_is_a").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_is_a")).cast("bigint")).alias("_cb"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("_ca"), F.lit(0)).alias("_na"),
        F.coalesce(F.sum("_cb"), F.lit(0)).alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
        F.coalesce(
            F.sum((F.col("_ca") > 0).cast("bigint")), F.lit(0)
        ).alias("_va"),
        F.coalesce(
            F.sum((F.col("_cb") > 0).cast("bigint")), F.lit(0)
        ).alias("_vb"),
    )
    crossed = counts.crossJoin(F.broadcast(totals))
    pa = (F.col("_ca") + 1.0) / (F.col("_na") + F.col("_v"))
    pb = (F.col("_cb") + 1.0) / (F.col("_nb") + F.col("_v"))
    m = (pa + pb) / 2.0
    contrib = crossed.agg(
        F.sum(pa * F.log(pa / pb)).alias("_kl_ab"),
        F.sum(pb * F.log(pb / pa)).alias("_kl_ba"),
        F.sum(pa * F.log(pa / m)).alias("_kl_am"),
        F.sum(pb * F.log(pb / m)).alias("_kl_bm"),
    )
    return totals.crossJoin(F.broadcast(contrib)).select(
        F.col("_na").alias("n_tokens_a"),
        F.col("_nb").alias("n_tokens_b"),
        F.col("_va").alias("vocab_a"),
        F.col("_vb").alias("vocab_b"),
        F.col("_v").alias("vocab_union"),
        F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0), F.round("_kl_ab", R)
        ).alias("kl_ab"),
        F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0), F.round("_kl_ba", R)
        ).alias("kl_ba"),
        F.when(
            (F.col("_na") > 0) & (F.col("_nb") > 0),
            F.round(0.5 * F.col("_kl_am") + 0.5 * F.col("_kl_bm"), R),
        ).alias("js_divergence"),
    )


def rouge_ngram_eval(
    pairs: DataFrame,
    cand_col: str = "candidate",
    ref_col: str = "reference",
    id_col: str = "pair_id",
    k: int = 2,
) -> DataFrame:
    """ROUGE-N over (candidate, reference) text pairs (staged r11,
    register r12; Lin 2004): clipped word-k-gram overlap — each gram
    counts min(count_in_candidate, count_in_reference) times — with
    precision, recall, and F1. The eval-side workhorse for summary /
    generation quality and for near-match detection between generated
    text and its source (a training-data decontamination signal the
    pairwise Jaccard family under-weights repeated grams on).

    Returns one row per input pair: (id, cand_grams, ref_grams,
    overlap, precision, recall, f1), floats rounded 6dp; a side with
    no k-gram leaves its ratio NULL (and f1 NULL), matching the
    abstain convention.

    Scale shape: two gram-count aggregates -> one full outer join on
    (pair id, gram) — keys scale with the corpus, no broadcast hint —
    -> one per-pair reduce -> join back to the pair spine. Clipping is
    least() on integer counts: exact both engines."""
    def side(col: str, alias: str) -> DataFrame:
        return (
            pairs.select(F.col(id_col), F.explode(ngrams(col, k=k)).alias("g"))
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    cg = side(cand_col, "_cc")
    rg = side(ref_col, "_cr")
    per_pair = (
        cg.join(rg, [id_col, "g"], "full")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("_cc", F.lit(0))).alias("cand_grams"),
            F.sum(F.coalesce("_cr", F.lit(0))).alias("ref_grams"),
            F.sum(
                F.least(F.coalesce("_cc", F.lit(0)), F.coalesce("_cr", F.lit(0)))
            ).alias("overlap"),
        )
    )
    base = pairs.select(id_col)
    out = base.join(per_pair, id_col, "left").select(
        id_col,
        F.coalesce("cand_grams", F.lit(0)).alias("cand_grams"),
        F.coalesce("ref_grams", F.lit(0)).alias("ref_grams"),
        F.coalesce("overlap", F.lit(0)).alias("overlap"),
    )
    p = F.when(F.col("cand_grams") > 0, F.col("overlap") / F.col("cand_grams"))
    r = F.when(F.col("ref_grams") > 0, F.col("overlap") / F.col("ref_grams"))
    f1 = F.when(
        p.isNotNull() & r.isNotNull(),
        F.when((p + r) > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0)),
    )
    return out.select(
        id_col,
        "cand_grams",
        "ref_grams",
        "overlap",
        F.round(p, R).alias("precision"),
        F.round(r, R).alias("recall"),
        F.round(f1, R).alias("f1"),
    )


def watermark_greenlist_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gamma: float = 0.5,
) -> DataFrame:
    """Green-list watermark detection (staged r12, registered r14;
    Kirchenbauer et al. 2023): a watermarking LLM hashes the previous
    token to pseudorandomly partition the vocabulary into a "green"
    fraction ``gamma`` and boosts green logits, so watermarked text
    shows a green-token rate far above gamma. The detector needs no
    model — only the hash rule — which makes it a CORPUS-CURATION
    filter: score every document's green rate and z-statistic and gate
    suspected synthetic (model-generated) text out of training data.

    Rule (context width 1, the paper's simplest form, md5-portable):
    token i (i >= 1) is green iff the 8th hex digit of
    ``md5(prev_token # token)`` is even — an exactly-gamma=0.5
    partition both engines compute identically. Natural text scores
    z ~ 0; greedily green-chained text scores z ~ sqrt(n).

    Returns one row per doc: (id, n_tokens, n_scored, n_green,
    green_rate, z_score); docs with < 2 tokens report zero counts and
    NULL rate/z (nothing to score). Scale shape: map-only — one
    tokenize + one array fold per row, no shuffle at any corpus size;
    the token array is HOF-bound once (the r1 lambda-binding rule).

    ``gamma`` must be 0.5: the even-hex-digit rule IS an exactly-half
    partition, and scoring it against any other gamma would make the
    z-statistic systematically wrong (natural text would score
    ~0.58*sqrt(n) at gamma=0.25). A variable-gamma detector needs a
    matching k-of-16-digits green rule — raise loudly rather than
    mis-score."""
    if gamma != 0.5:
        raise ValueError(
            "gamma must be 0.5 (the even-hex-digit rule is an exactly-"
            f"half vocabulary partition), got {gamma}"
        )

    def stats(a):
        n1 = F.greatest(F.size(a) - 1, F.lit(0))
        green = F.zip_with(
            F.slice(a, 1, n1),
            F.slice(a, 2, n1),
            lambda p, t: F.substring(
                F.md5(F.concat(p, F.lit("#"), t)), 8, 1
            ).isin("0", "2", "4", "6", "8", "a", "c", "e").cast("int"),
        )
        return F.struct(
            F.size(a).cast("long").alias("n_tokens"),
            n1.cast("long").alias("n_scored"),
            F.aggregate(green, F.lit(0), lambda acc, x: acc + x)
            .cast("long")
            .alias("n_green"),
        )

    bound = F.element_at(F.transform(F.array(tokens(text_col)), stats), 1)
    out = docs.select(F.col(id_col), bound.alias("_s")).select(
        id_col,
        F.col("_s.n_tokens").alias("n_tokens"),
        F.col("_s.n_scored").alias("n_scored"),
        F.col("_s.n_green").alias("n_green"),
    )
    scored = F.col("n_scored").cast("double")
    rate = F.col("n_green") / scored
    z = (F.col("n_green") - gamma * scored) / F.sqrt(
        scored * gamma * (1.0 - gamma)
    )
    has = F.col("n_scored") > 0
    return out.select(
        id_col,
        "n_tokens",
        "n_scored",
        "n_green",
        F.when(has, F.round(rate, R)).alias("green_rate"),
        F.when(has, F.round(z, R)).alias("z_score"),
    )


def oov_rate_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1024,
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary (staged r14) — the tokenizer-
    coverage diagnostic run before committing a vocab: documents whose
    token mass falls heavily outside the head vocabulary either carry
    rare-domain language worth keeping or encoding garbage worth
    dropping, and the OOV rate is the split signal (the same statistic
    reported as "unknown-token rate" in tokenizer-fertility studies).

    Vocabulary = the ``vocab_size`` most frequent corpus tokens with a
    TOTAL deterministic order (count desc, token asc) so the boundary
    tie never differs between engines or runs. Scale shape: one
    tokenize pass -> vocabulary-bounded (token-keyed) count aggregate
    -> global top-V via orderBy+limit (TakeOrderedAndProject: per-
    partition partial top-k, never a global sort of the vocab) -> the
    per-doc occurrence frame LEFT-joins the V-row vocab (broadcast at
    any corpus size) -> doc-grain rollup.

    Returns one row per doc with >= 1 token: (doc_id, n_tokens,
    oov_tokens, oov_rate, distinct_oov) — oov_rate rounded 6dp."""
    tok = fan_out(docs).select(
        F.col(id_col).alias("_cid"), F.explode(tokens(text_col)).alias("_t")
    )
    occ = tok.groupBy("_cid", "_t").agg(F.count(F.lit(1)).alias("_n"))
    vocab = (
        occ.groupBy("_t")
        .agg(F.sum("_n").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("_t"))
        .limit(vocab_size)
        .select("_t", F.lit(True).alias("_in_v"))
    )
    flagged = occ.join(F.broadcast(vocab), "_t", "left")
    oov = F.when(F.col("_in_v").isNull(), F.col("_n")).otherwise(F.lit(0))
    return (
        flagged.groupBy("_cid")
        .agg(
            F.sum("_n").cast("long").alias("n_tokens"),
            F.sum(oov).cast("long").alias("oov_tokens"),
            F.sum(F.when(F.col("_in_v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("distinct_oov"),
        )
        .select(
            F.col("_cid").alias(id_col),
            "n_tokens",
            "oov_tokens",
            F.round(F.col("oov_tokens") / F.col("n_tokens"), 6).alias(
                "oov_rate"
            ),
            "distinct_oov",
        )
    )


def char_entropy_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-BIGRAM Shannon entropy (staged r14) —
    the cheap garbage detector corpus pipelines run before any
    model-based scoring: natural language sits in a narrow entropy
    band; base64/hex blobs, compressed or encrypted payloads score
    near the uniform maximum, and degenerate repetition ("aaaa...")
    scores near zero. Both tails are drop candidates (the CCNet/
    Gopher-adjacent heuristic that needs no LM).

    H = ln(N) - (sum n_g * ln n_g) / N over the doc's bigram counts —
    the algebraic form whose only float reduction is one bounded sum
    of n*ln(n) terms (6dp rounding absorbs summation order, the
    bigram-LM precedent); counts are exact integers from a
    (doc, bigram)-keyed aggregate. ``entropy_norm`` = H / ln(distinct)
    in [0, 1] (NULL when distinct = 1, where H = 0 by definition).

    Scale shape: one map-only bigram explode (length-bounded per row),
    one keyed aggregate, one doc-grain rollup — no windows, no joins.
    Returns (doc_id, n_bigrams, distinct_bigrams, entropy,
    entropy_norm) for docs with >= 1 bigram (length >= 2)."""
    t = F.col(text_col)
    # the text is projected ONCE as an attribute before the HOF so the
    # per-element lambda slices a bound column, not a re-evaluated
    # expression (the r1 lambda-binding rule); Column.substr takes a
    # Column start position (F.substring is literal-only)
    grams = fan_out(docs).filter(F.length(t) >= 2).select(
        F.col(id_col).alias("_cid"), t.alias("_txt")
    ).select(
        "_cid",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_txt") - 1),
                lambda i: F.col("_txt").substr(i, F.lit(2)),
            )
        ).alias("_g"),
    )
    cnt = grams.groupBy("_cid", "_g").agg(F.count(F.lit(1)).alias("_n"))
    nl = F.col("_n").cast("double")
    return (
        cnt.groupBy("_cid")
        .agg(
            F.sum("_n").cast("long").alias("n_bigrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
            F.sum(nl * F.log(nl)).alias("_snln"),
        )
        .select(
            F.col("_cid").alias(id_col),
            "n_bigrams",
            "distinct_bigrams",
            F.round(
                F.log(F.col("n_bigrams").cast("double"))
                - F.col("_snln") / F.col("n_bigrams"),
                6,
            ).alias("entropy"),
            F.when(
                F.col("distinct_bigrams") > 1,
                F.round(
                    (
                        F.log(F.col("n_bigrams").cast("double"))
                        - F.col("_snln") / F.col("n_bigrams")
                    )
                    / F.log(F.col("distinct_bigrams").cast("double")),
                    6,
                ),
            ).alias("entropy_norm"),
        )
    )


def vocab_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    vocab_size: int = 256,
) -> DataFrame:
    """Pairwise source-vocabulary Jaccard (staged r14 wave 4) — the
    data-mixing diagnostic read next to source_overlap_matrix: that
    operator measures shared DOCUMENTS, this one shared LANGUAGE. Two
    sources whose top-``vocab_size`` vocabularies barely overlap
    contribute genuinely different text (worth separate mixture
    weights); near-identical vocabularies suggest the same upstream
    crawl wearing two labels.

    Per source the top-V tokens under the oov_rate_profile boundary
    discipline (count desc, token asc — a TOTAL order, so the V-th
    slot never differs between engines). Scale shape: one tokenize
    pass, (source, token) counts, per-source top-V via a PARTITIONED
    rank window on the aggregated (vocabulary-bounded) grain, then a
    token-keyed self-join of the (sources x V)-row vocab frame —
    bounded by construction, broadcastable at any corpus size.

    Returns one row per unordered source pair (source_a < source_b):
    (source_a, source_b, v_a, v_b, n_common, jaccard r6)."""
    from datapipeline_spike_spark.functions.text import tokens as tok_fn

    counts = (
        fan_out(docs)
        .select(
            F.col(source_col).alias("_src"),
            F.explode(tok_fn(text_col)).alias("_t"),
        )
        .groupBy("_src", "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy("_src").orderBy(F.desc("_c"), F.asc("_t"))
    vocab = (
        counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= int(vocab_size))
        .select("_src", "_t")
    )
    sizes = vocab.groupBy("_src").agg(F.count(F.lit(1)).alias("_v"))
    inter = (
        vocab.alias("a")
        .join(vocab.alias("b"), "_t")
        .filter(F.col("a._src") < F.col("b._src"))
        .groupBy(F.col("a._src").alias("source_a"), F.col("b._src").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(
        F.col("_src").alias("source_a"), F.col("_v").alias("_va")
    )
    sb = sizes.select(
        F.col("_src").alias("source_b"), F.col("_v").alias("_vb")
    )
    # all-pairs frame so zero-overlap pairs still appear (inter alone
    # drops them); sources x sources is bounded
    pairs = sa.crossJoin(sb).filter(F.col("source_a") < F.col("source_b"))
    return (
        pairs.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.col("_va").cast("long").alias("v_a"),
            F.col("_vb").cast("long").alias("v_b"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce("n_common", F.lit(0))
                / (F.col("_va") + F.col("_vb") - F.coalesce("n_common", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def min_k_prob_profile(
    docs: DataFrame,
    k_frac: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Min-K% Prob membership/contamination signal (staged r17 wave 8;
    Shi et al. 2023 "Detecting Pretraining Data from Large Language
    Models"): per document, the mean log-probability of its
    ``k_frac``-fraction LOWEST-probability tokens under a corpus LM —
    the outlier-token tail a member document lacks and a non-member
    document carries. The published method uses the target model's
    own token logprobs; this corpus-side form scores with the same
    add-one smoothed unigram LM the registered
    ``unigram_logprob_score`` fits (fit on the corpus itself), which
    is the engine-side signal available BEFORE any model exists —
    the same substitution the perplexity-bucket filter makes for
    CCNet. Next to ``avg_logprob`` it gives curation the tail-vs-mean
    gap: near-duplicate-of-corpus pages have a thin tail (small gap),
    template/spam pages a heavy one.

    Determinism contract: the selected bottom-k SET is ranked on
    (token count asc, token asc, position asc) — logprob is MONOTONE
    in the integer count, so this integer/string ordering selects
    exactly the k lowest-probability tokens with a total tie-break
    that replays on any engine; no float ever enters the ORDER BY.
    k_tokens = greatest(1, ceil(k_frac * n_tokens)) with the SAME
    double multiply both engines. Returns (doc_id, n_tokens, k_tokens,
    avg_logprob, min_k_avg_logprob), logprobs 6dp-rounded.

    Scale shape: one tokenize+posexplode pass; vocabulary-bounded
    count shuffle; the token->count probe join is hint-free (AQE
    broadcasts while the vocabulary is small); the rank window is
    PARTITIONED by document; the 1-row smoothing totals ride the
    broadcast-cross totals precedent (BNLJ_OK). No self-joins, no
    Python."""
    if not 0.0 < k_frac <= 1.0:
        # ADVICE r17: k_frac > 1 would make k_tokens exceed n_tokens and
        # silently understate the tail mean (sum of n logprobs / larger
        # k); k_frac <= 0 would silently clamp to 1 — both are caller
        # bugs, not profiles.
        raise ValueError(f"min_k_prob_profile needs 0 < k_frac <= 1, got {k_frac}")
    ex = fan_out(docs).select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("_pos", "_tok"),
    )
    vocab = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    totals = vocab.agg(
        F.sum("_c").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    scored = (
        ex.join(vocab, "_tok")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "_pos",
            "_tok",
            "_c",
            F.log(
                (F.col("_c") + 1.0) / (F.col("_total") + F.col("_v"))
            ).alias("_lp"),
        )
    )
    part = Window.partitionBy(id_col)
    w = part.orderBy(F.col("_c").asc(), F.col("_tok").asc(), F.col("_pos").asc())
    ranked = scored.select(
        id_col,
        "_lp",
        F.row_number().over(w).alias("_rnk"),
        F.count(F.lit(1)).over(part).alias("_n"),
    ).withColumn(
        "_k",
        F.greatest(
            F.lit(1), F.ceil(F.lit(float(k_frac)) * F.col("_n")).cast("int")
        ),
    )
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.max("_k").cast("long").alias("k_tokens"),
        F.round(F.avg("_lp"), R).alias("avg_logprob"),
        F.round(
            F.sum(F.when(F.col("_rnk") <= F.col("_k"), F.col("_lp")))
            / F.max("_k"),
            R,
        ).alias("min_k_avg_logprob"),
    )


def distinct_ngram_diversity(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Distinct-n lexical diversity per source (staged r17 wave 9; Li
    et al. 2016 "A Diversity-Promoting Objective Function for Neural
    Conversation Models" — distinct-1/distinct-2): the ratio of
    DISTINCT unigrams/bigrams to total unigram/bigram occurrences.
    The standard mode-collapse detector for SYNTHETIC training data —
    a model-generated corpus that loops on stock phrases shows normal
    unigram stats but a collapsed distinct-2; curation stacks that mix
    generated data read this table next to the Zipf profile (natural
    text) and the repetition profile (per-document loops): distinct-n
    is the CORPUS-level counterpart a per-doc metric cannot see.

    Exact integer counts on both engines; the two ratios are the only
    floats (6dp). Bigrams use the same zip_with adjacency as the
    bigram LM (``_word_bigrams``), at token grain (multiset — repeats
    count, the published definition). Scale shape (single-pass,
    re-shaped at registration r19 — the pre-freeze window): ONE
    tokenize+explode pass emits every gram tagged with its grain
    (unigram/bigram), then ONE vocabulary-bounded two-level aggregate
    — level 1 keyed (source, grain, gram) counts occurrences with
    map-side partials, level 2 collapses to source grain with
    conditional sums (the hand-rolled count-distinct, so the grain
    split costs no second tokenize of the corpus — the staged shape's
    separate unigram/bigram aggregates each re-scanned and
    re-tokenized the text, a 2x on the operator's dominant cost at
    scale). No windows; the only join is the final source-grain
    assembly against the n_docs aggregate (bounded, broadcastable at
    any corpus size; n_docs scans only the pruned source column).

    Returns (source, n_docs, total_unigrams, distinct_unigrams,
    distinct_1, total_bigrams, distinct_bigrams, distinct_2)."""
    toks = docs.select(
        F.col(source_col).alias("_src"),
        tokens(text_col).alias("_t"),
    )
    # one generate: unigrams tagged grain 0, adjacent bigrams grain 1
    grams = toks.filter(F.size("_t") >= 1).select(
        "_src",
        F.explode(
            F.concat(
                F.transform(
                    "_t", lambda x: F.struct(F.lit(0).alias("_gr"), x.alias("_g"))
                ),
                F.zip_with(
                    F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.slice("_t", 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                    lambda a, b: F.struct(
                        F.lit(1).alias("_gr"),
                        F.concat(a, F.lit(" "), b).alias("_g"),
                    ),
                ),
            )
        ).alias("_e"),
    ).select("_src", F.col("_e._gr").alias("_gr"), F.col("_e._g").alias("_g"))
    per_gram = grams.groupBy("_src", "_gr", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    stats = per_gram.groupBy("_src").agg(
        F.sum(F.when(F.col("_gr") == 0, F.col("_c"))).alias("total_unigrams"),
        F.count(F.when(F.col("_gr") == 0, F.lit(1))).alias(
            "distinct_unigrams"
        ),
        F.sum(F.when(F.col("_gr") == 1, F.col("_c"))).alias("total_bigrams"),
        F.count(F.when(F.col("_gr") == 1, F.lit(1))).alias(
            "distinct_bigrams"
        ),
    )
    n_docs = docs.groupBy(F.col(source_col).alias("_src")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        n_docs.join(stats, "_src", "left")
        .select(
            F.col("_src").alias("source"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("total_unigrams", F.lit(0)).cast("long").alias(
                "total_unigrams"
            ),
            F.coalesce("distinct_unigrams", F.lit(0)).cast("long").alias(
                "distinct_unigrams"
            ),
            # ADVICE r17: a source whose docs all tokenize empty (or to
            # <2 tokens for bigrams) has total 0 — emit NULL, not 0/0 =
            # NaN (the house F.when(denominator > 0) guard; the staging
            # oracle mirrors with CASE WHEN)
            F.round(
                F.when(
                    F.coalesce("total_unigrams", F.lit(0)) > 0,
                    F.coalesce("distinct_unigrams", F.lit(0))
                    / F.col("total_unigrams"),
                ),
                6,
            ).alias("distinct_1"),
            F.coalesce("total_bigrams", F.lit(0)).cast("long").alias(
                "total_bigrams"
            ),
            F.coalesce("distinct_bigrams", F.lit(0)).cast("long").alias(
                "distinct_bigrams"
            ),
            F.round(
                F.when(
                    F.coalesce("total_bigrams", F.lit(0)) > 0,
                    F.coalesce("distinct_bigrams", F.lit(0))
                    / F.col("total_bigrams"),
                ),
                6,
            ).alias("distinct_2"),
        )
    )
