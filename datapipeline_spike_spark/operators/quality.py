"""Quality/outlier operators (SURVEY.md §2.2 P2, §2.4 A10-A13).

The reference names ``checkOutliers`` / ``calculateOutlierScore`` /
``calculateQualityScore`` / ``checkCompleteness`` / ``checkConsistency``
(reference/README.md:434-499) but gives no bodies; the engine's
documented definitions (SURVEY.md §7.4.1):

- outlier_z  = (value - mean) / stddev over the record's status group
- is_valid   = |z| <= z_threshold (default 3.0)
- outlier_score = min(|z| / 10, 1.0)
- completeness  = fraction of required columns non-null
- consistency   = boolean cross-field sanity check
- quality score = 0.5*completeness + 0.3*(1-outlier_score) + 0.2*consistency

All are plain column expressions (SQL-expressible for the oracle).
Group statistics are computed with a broadcast join of a tiny aggregate,
not a window over the full table — at 100 TB the per-group stats frame
is KB-sized while an OVER() window would re-shuffle every row.
"""

from __future__ import annotations

from collections.abc import Sequence

from datapipeline_spike_spark.cache import materialize_barrier
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_group_zscore(
    df: DataFrame, value: str = "value", group: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Attach mean/stddev of ``value`` per group and the z-score."""
    group = list(group)
    stats = df.groupBy(*group).agg(
        F.avg(value).alias("_mean"), F.stddev_samp(value).alias("_std")
    )
    joined = df.join(F.broadcast(stats), on=group, how="left")
    z = F.when(
        F.col("_std") > 0, (F.col(value) - F.col("_mean")) / F.col("_std")
    ).otherwise(F.lit(None))
    return joined.withColumn("z", z)


def outlier_gate(
    df: DataFrame,
    value: str = "value",
    group: Sequence[str] = ("event_type",),
    z_threshold: float = 3.0,
) -> DataFrame:
    """P2 validity filter: drop records with |z| > threshold, attaching
    outlier_check struct first (reference/README.md:434-449 — invalid
    records are dropped before further processing)."""
    scored = with_group_zscore(df, value, group)
    scored = scored.withColumn(
        "outlier_check",
        F.struct(
            (F.abs(F.col("z")) <= z_threshold).alias("is_valid"),
            F.least(F.abs(F.col("z")) / 10, F.lit(1.0)).alias("outlier_score"),
        ),
    )
    return scored.filter(F.col("outlier_check.is_valid")).drop("_mean", "_std")


def completeness(required: Sequence[str]) -> Column:
    """A10: fraction of required fields present (reference/README.md:491-493)."""
    n = len(required)
    present = sum((F.col(c).isNotNull().cast("int") for c in required), F.lit(0))
    return present / F.lit(float(n))


def consistency(*checks: Column) -> Column:
    """A11: conjunction of cross-field sanity checks (reference/README.md:494)."""
    out = F.lit(True)
    for c in checks:
        out = out & c
    return out.cast("boolean")


def quality_score(completeness_c: Column, outlier_score_c: Column, consistency_c: Column) -> Column:
    """A12 composite score (engine-defined weights, SURVEY §7.4.1)."""
    return (
        0.5 * completeness_c
        + 0.3 * (F.lit(1.0) - outlier_score_c)
        + 0.2 * consistency_c.cast("double")
    )


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style language-model quality bucketing (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data"): fit a PER-LANGUAGE add-one-smoothed unigram LM on the
    corpus itself, score every document by mean token log-probability,
    and split each language into ``n_buckets`` perplexity buckets via
    approximate quantiles. Returns (id, lang, n_tokens, avg_logprob,
    bucket[, bucket_label]) — bucket 1 = LOWEST log-probability =
    highest perplexity (CCNet's "tail"); with the default 3 buckets a
    head/middle/tail label is attached. Docs with zero tokens are
    dropped (nothing to score).

    Scale shape: vocabulary-bounded shuffles only (the (lang, token)
    count table), the token->prob join is broadcastable at any corpus
    size only via AQE (no forced hint — vocabulary is data-dependent),
    the 1-row-per-language smoothing totals stay in-plan, and the
    bucketing is the map-only threshold banding of
    :func:`operators.ranks.approx_percentile_bands` — no per-language
    global sort of the corpus (CCNet itself shards by language for
    exactly this step)."""
    from datapipeline_spike_spark.functions.text import tokens as tok_fn
    from datapipeline_spike_spark.operators.ranks import approx_percentile_bands

    ex = docs.select(
        F.col(id_col), F.col(lang_col).alias("_pl_lang"),
        F.explode(tok_fn(text_col)).alias("_pl_tok"),
    )
    tf = ex.groupBy(id_col, "_pl_lang", "_pl_tok").agg(
        F.count(F.lit(1)).alias("_pl_n")
    )
    vocab = tf.groupBy("_pl_lang", "_pl_tok").agg(F.sum("_pl_n").alias("_pl_c"))
    totals = vocab.groupBy("_pl_lang").agg(
        F.sum("_pl_c").alias("_pl_total"), F.count(F.lit(1)).alias("_pl_v")
    )
    lp = F.log(
        (F.col("_pl_c") + 1.0) / (F.col("_pl_total") + F.col("_pl_v"))
    )
    scored = (
        # vocab is VOCABULARY-scale (per-language distinct tokens,
        # Heap's-law unbounded): no forced broadcast — AQE decides. The
        # per-language totals (|languages| rows) stay hinted.
        tf.join(vocab, ["_pl_lang", "_pl_tok"])
        .join(F.broadcast(totals), "_pl_lang")
        .groupBy(id_col, "_pl_lang")
        .agg(
            F.sum("_pl_n").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("_pl_n") * lp) / F.sum("_pl_n"), 6
            ).alias("avg_logprob"),
        )
    )
    out = approx_percentile_bands(
        scored, ["_pl_lang"], "avg_logprob",
        n_bands=n_buckets, accuracy=accuracy, band_col="bucket",
    ).withColumnRenamed("_pl_lang", lang_col)
    if n_buckets == 3:
        out = out.withColumn(
            "bucket_label",
            F.element_at(
                F.array(F.lit("tail"), F.lit("middle"), F.lit("head")),
                F.col("bucket"),
            ),
        )
    return out


def bigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-fit bigram LM fluency scoring — the word-ORDER-sensitive
    upgrade of the unigram scorer (``unigram_logprob_score``): an
    add-one-smoothed bigram model P(w_i | w_{i-1}) fit on the corpus
    itself scores each document by mean conditional log-probability.
    Scrambled or concatenative gibberish that reuses common VOCABULARY
    (which a unigram model scores as fluent) ranks low because its
    TRANSITIONS are rare; this is the SQL-replayable stand-in for the
    KenLM-perplexity filters production pipelines run. Returns
    (id, n_bigrams, avg_logprob); docs with < 2 tokens are dropped
    (no transition to score).

    P(b|a) = (c(a,b) + 1) / (c(a,·) + V), V = distinct corpus unigrams
    — every count integer-exact, only the final mean is float (6dp
    rounding absorbs engine summation order, the unigram precedent).
    Scale shape: one tokenize pass feeds bigram counts; the per-doc
    scoring join shuffles on the bigram key WITHOUT a broadcast hint
    (distinct bigrams scale toward vocab^2) and so does the per-context
    totals join (vocabulary-scale) — the SF-scaling-table rule, AQE
    broadcasts either while small; only the 1-row vocabulary size is a
    genuinely bounded broadcast. All
    aggregates map-side combined; no windows, no self-joins."""
    from datapipeline_spike_spark.functions.text import tokens as tok_fn

    toks = docs.select(F.col(id_col), tok_fn(text_col).alias("_bl_toks")).filter(
        F.size("_bl_toks") >= 2
    )
    # adjacent pairs via slice/zip: bigram i = (tok_i, tok_{i+1})
    bigrams = toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("_bl_toks", 1, F.size("_bl_toks") - 1),
                F.slice("_bl_toks", 2, F.size("_bl_toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bl_bg"),
    ).select(id_col, F.col("_bl_bg.w1").alias("_bl_w1"), F.col("_bl_bg.w2").alias("_bl_w2"))
    # materialize the (doc, bigram) count frame ONCE (r20 — the r19
    # kneser_ney class): unbarriered, the tokenize + zip-explode
    # subtree re-rendered per consumer — doc_bg feeds the scoring join,
    # corpus_bg, and (through it) ctx, and vocab added two more renders
    # through its union branches: 5 tokenize renderings per run. The
    # frame is the aggregated (doc, bigram) grain an n-gram LM fit
    # materializes anyway.
    doc_bg = bigrams.groupBy(id_col, "_bl_w1", "_bl_w2").agg(
        F.count(F.lit(1)).alias("_bl_n")
    ).transform(materialize_barrier)
    # corpus_bg feeds ctx AND the scoring join — vocabulary-bounded
    corpus_bg = doc_bg.groupBy("_bl_w1", "_bl_w2").agg(
        F.sum("_bl_n").alias("_bl_c")
    ).transform(materialize_barrier)
    ctx = corpus_bg.groupBy("_bl_w1").agg(F.sum("_bl_c").alias("_bl_ctx"))
    # V = distinct unigrams (both positions; last token of a doc appears
    # in w2, first in w1 — the union covers every token). Derived from
    # the CHECKPOINTED doc_bg, not the raw bigram stream: doc_bg holds
    # every distinct (w1, w2) key, so the distinct-unigram set is
    # identical and the tokenize pass is not re-rendered (r20).
    vocab = (
        doc_bg.select(F.col("_bl_w1").alias("w"))
        .unionByName(doc_bg.select(F.col("_bl_w2").alias("w")))
        .agg(F.count_distinct("w").alias("_bl_v"))
    )
    lp = F.log(
        (F.col("_bl_c") + 1.0) / (F.col("_bl_ctx") + F.col("_bl_v"))
    )
    return (
        # no broadcast hint on the bigram-count table: DISTINCT BIGRAMS
        # scale toward vocab^2 at corpus size (the customer-table rule);
        # the equi-join shuffles on the bigram key and AQE may still
        # broadcast it while small. ctx (per-unigram totals) and the
        # 1-row V stay broadcast — genuinely vocabulary-bounded.
        doc_bg.join(corpus_bg, ["_bl_w1", "_bl_w2"])
        # ctx is per-UNIGRAM totals — vocabulary-scale, same rule: no hint
        .join(ctx, "_bl_w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("_bl_n").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("_bl_n") * lp) / F.sum("_bl_n"), 6).alias(
                "avg_logprob"
            ),
        )
    )


# --- encoding / mojibake hygiene ---------------------------------------------

# C0 controls minus \t\n\r, plus DEL — text that should never survive a
# clean extraction pipeline. \x escapes parse identically in Java regex
# (Spark) and RE2 (DuckDB).
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
# Zero-width / invisible formatting: ZWSP, ZWNJ, ZWJ, BOM-as-ZWNBSP.
_ZERO_WIDTH_RE = "[​‌‍﻿]"
# Unicode replacement char — the decoder already gave up here.
_REPLACEMENT_RE = "�"
# Residual HTML entities an extractor failed to decode.
_ENTITY_RE = r"&(#[0-9]{1,6}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,30});"
# Classic UTF-8-read-as-Latin-1 tells: 'Ã'/'Â' lead bytes and the
# 'â€¦'-family three-byte smart-punctuation wrecks.
_MOJIBAKE_RE = "Ã|Â|â€"


def encoding_quality_columns(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Encoding-hygiene profile for web-crawl text (SURVEY §2.11 — the
    curation gate that runs BEFORE tokenization: a corpus at 100 TB
    always contains decoder casualties, and counting them is cheaper
    than training on them). Adds per-document counts of replacement
    characters, stray C0 controls, zero-width characters, undecoded
    HTML entities, and UTF-8-as-Latin-1 mojibake markers, plus a
    combined bad-character ratio and an ``encoding_ok`` verdict.

    Map-only: five ``regexp_count`` column expressions, codegen-
    eligible, no shuffle — at cluster scale this is a pure scan stage
    and composes in front of any gate (same contract as
    ``quality_classifier_columns``: full input schema preserved).
    Thresholds: any replacement/control char fails; mojibake fails;
    bad-char ratio (replacement+control+zero-width over chars) above
    0.1% fails. Empty text is vacuously ok."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    counts = {
        "n_replacement": _REPLACEMENT_RE,
        "n_control": _CONTROL_RE,
        "n_zero_width": _ZERO_WIDTH_RE,
        "n_entity": _ENTITY_RE,
        "n_mojibake": _MOJIBAKE_RE,
    }
    out = df.withColumn("n_chars_enc", n_chars)
    for name, pat in counts.items():
        out = out.withColumn(name, F.regexp_count(t, F.lit(pat)).cast("long"))
    bad = F.col("n_replacement") + F.col("n_control") + F.col("n_zero_width")
    ratio = F.when(
        F.col("n_chars_enc") > 0, bad / F.col("n_chars_enc")
    ).otherwise(F.lit(0.0))
    return out.withColumn("bad_char_ratio", F.round(ratio, 6)).withColumn(
        "encoding_ok",
        (F.col("n_replacement") == 0)
        & (F.col("n_control") == 0)
        & (F.col("n_mojibake") == 0)
        & (F.col("bad_char_ratio") <= 0.001),
    )


# Gopher (Rae et al. 2021, Appendix A1.1) heuristic quality thresholds.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_columns(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The MassiveText/Gopher heuristic quality gate (Rae et al. 2021,
    Appendix A1.1) — the standard pre-classifier document filter of a
    pretraining pipeline: word-count bounds, mean-word-length band,
    symbol-to-word ratio (hash / ellipsis), bullet-line and
    ellipsis-line ratios, alphabetic-word ratio, and minimum stop-word
    presence (>= ``min_stopwords`` distinct members of the canonical
    8-word set). Adds the measured columns, one boolean per rule, and
    the conjunction ``gopher_pass``.

    Map-only column expressions end to end (whitespace word split +
    array HOFs + regexp counts) — codegen-eligible, zero shuffle, a
    pure scan stage at any corpus size; every expression is in the
    Java/RE2 regex common subset so a SQL oracle replays each decision
    exactly. Empty documents fail the word-count rule and carry NULL
    ratio columns rather than divide-by-zero garbage."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    df = df.withColumn("_gq_words", words)
    w = F.col("_gq_words")
    n_words = F.size(w).cast("long")
    nonempty = n_words > 0
    mean_wl = F.when(
        nonempty,
        F.round(
            F.aggregate(
                w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            ).cast("double")
            / n_words,
            6,
        ),
    )
    n_symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    ).cast("long")
    symbol_ratio = F.when(nonempty, F.round(n_symbols / n_words, 6))
    alpha_ratio = F.when(
        nonempty,
        F.round(
            F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))) / n_words, 6
        ),
    )
    lw = F.transform(w, F.lower)
    n_stop = sum(
        F.array_contains(lw, sw).cast("int") for sw in GOPHER_STOPWORDS
    ).cast("int")
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l0: F.trim(l0)), lambda l: l != ""
    )
    n_lines = F.size(lines).cast("long")
    has_lines = n_lines > 0
    bullet_ratio = F.when(
        has_lines,
        F.round(
            F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]")))
            / n_lines,
            6,
        ),
    )
    ellipsis_ratio = F.when(
        has_lines,
        F.round(
            F.size(
                F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
            )
            / n_lines,
            6,
        ),
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("alpha_word_ratio", alpha_ratio)
        .withColumn("n_gopher_stopwords", n_stop)
        .withColumn("bullet_line_ratio", bullet_ratio)
        .withColumn("ellipsis_line_ratio", ellipsis_ratio)
        .drop("_gq_words")
    )
    rules = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_word_ratio")
        <= max_symbol_word_ratio,
        "ok_bullet_lines": F.col("bullet_line_ratio")
        <= max_bullet_line_ratio,
        "ok_ellipsis_lines": F.col("ellipsis_line_ratio")
        <= max_ellipsis_line_ratio,
        "ok_alpha_words": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "ok_stopwords": F.col("n_gopher_stopwords") >= min_stopwords,
    }
    passed = F.lit(True)
    for name, cond in rules.items():
        cond = F.coalesce(cond, F.lit(False))
        out = out.withColumn(name, cond)
        passed = passed & cond
    return out.withColumn("gopher_pass", passed)


def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) at line and
    page grain. Line rules (a line survives only if ALL hold): ends in
    terminal punctuation ``[.!?]``; has >= ``min_line_words`` words;
    does not contain the word "javascript" (case-insensitive). Page
    rules (the whole document drops): fewer than ``min_kept_lines``
    surviving lines, contains "lorem ipsum", or contains a curly
    brace. Adds ``n_lines``/``n_kept``/``kept_text`` (surviving lines
    newline-joined, the text C4 trains on), ``page_keep``, and
    ``drop_reason`` ('lorem_ipsum' | 'curly_brace' |
    'too_few_sentences' | 'ok' — first matching rule in that fixed
    order, so the label is engine-portable).

    Map-only: one line split + array HOFs, no shuffle — scan-speed at
    100 TB, and every predicate is RE2-compatible for the oracle."""
    t = F.col(text_col)
    kept = F.filter(
        F.transform(F.split(t, "\n"), lambda l0: F.trim(l0)),
        lambda l: l.rlike(r"[.!?]$")
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda x: x != ""))
            >= min_line_words
        )
        & ~F.lower(l).contains("javascript"),
    )
    out = (
        df.withColumn(
            "n_lines",
            F.size(
                F.filter(
                    F.transform(F.split(t, "\n"), lambda l0: F.trim(l0)), lambda l: l != ""
                )
            ).cast("long"),
        )
        .withColumn("_c4_kept", kept)
        .withColumn("n_kept", F.size("_c4_kept").cast("long"))
        .withColumn("kept_text", F.array_join("_c4_kept", "\n"))
        .drop("_c4_kept")
    )
    lower = F.lower(t)
    reason = (
        F.when(lower.contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(t.contains("{"), F.lit("curly_brace"))
        .when(F.col("n_kept") < min_kept_lines, F.lit("too_few_sentences"))
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("drop_reason", reason).withColumn(
        "page_keep", F.col("drop_reason") == "ok"
    )


def reliability_calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Classifier-calibration report (staged r11, register r12): bin
    ``score_col`` (a [0,1] quality-classifier probability) into
    ``n_bins`` equal-width bins and compare each bin's MEAN PREDICTED
    score against its OBSERVED pass rate on ``label_col`` — the
    reliability-diagram table (Guo et al. 2017's calibration framing).
    A curation team reads this before trusting classifier thresholds:
    |gap| near 0 = trust the scores as probabilities; systematic gap =
    re-calibrate (or threshold on rank, not value). The ``weight``
    column makes ECE a trivial downstream sum(weight * abs_gap).

    Returns one row per non-empty bin: (bin, n, mean_score, pass_rate,
    abs_gap, weight), floats rounded 6dp. NULL scores/labels are
    excluded (abstentions). Scale shape: one map-only bin assign + one
    n_bins-grain aggregate + a 1-row total broadcast-cross — linear,
    no windows.

    Parity: bin ids come from floor(score * n_bins) clamped to the top
    bin (score = 1.0 lands in bin n_bins-1); all counts integer; means
    and rates are integer-or-data sums / counts, order-sensitivity
    absorbed by the 6dp round (the engine-wide convention)."""
    # scores outside [0,1] are contract violations for a probability
    # column, not data — they are EXCLUDED alongside the NULL abstains
    # rather than clamped into the edge bins, so a miscalibrated
    # upstream can't silently inflate bin 0 / bin n-1 (ADVICE r11: a
    # negative score used to produce out-of-range negative bin ids)
    s = F.col(score_col).cast("double")
    ok = (
        s.isNotNull()
        & F.col(label_col).isNotNull()
        & (s >= 0.0)
        & (s <= 1.0)
    )
    binned = df.filter(ok).select(
        F.least(
            F.lit(n_bins - 1), F.floor(s * n_bins).cast("int")
        ).alias("bin"),
        s.alias("_s"),
        F.col(label_col).cast("boolean").alias("_l"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s").alias("_sum_s"),
        F.sum(F.col("_l").cast("bigint")).alias("_n_pass"),
    )
    total = per_bin.agg(F.sum("n").alias("_total"))
    mean_score = F.col("_sum_s") / F.col("n")
    pass_rate = F.col("_n_pass") / F.col("n")
    return (
        per_bin.crossJoin(F.broadcast(total))  # 1-row totals pattern
        .select(
            "bin",
            "n",
            F.round(mean_score, 6).alias("mean_score"),
            F.round(pass_rate, 6).alias("pass_rate"),
            F.round(F.abs(pass_rate - mean_score), 6).alias("abs_gap"),
            F.round(F.col("n") / F.col("_total"), 6).alias("weight"),
        )
    )


def quality_rank_normalize(
    df: DataFrame,
    score_col: str = "score",
    group_col: str = "source",
    precision: int = 4,
) -> DataFrame:
    """Per-group quantile (rank) normalization of a classifier score
    (staged r12, registered r14): map each document's raw score to its
    mid-rank percentile WITHIN its source — ``(n_below + 0.5 * n_tied)
    / n_group``. This is the "threshold on rank, not value" transform
    the calibration report (reliability_calibration_bins) recommends
    when scores are miscalibrated ACROSS sources: a fixed raw-score
    cut keeps systematically different fractions per source, while a
    rank cut keeps exactly the same quantile everywhere.

    Scale shape (the budget_select histogram pattern, NOT a per-group
    window — a ``Window.partitionBy(source)`` funnels each source's
    whole corpus through one reducer): scores quantize to ``precision``
    dp buckets, one (group, bucket)-grain count aggregate, a cumulative
    sweep over each group's bounded histogram (<= 10^precision + 1 rows
    per group — callers pass a bounded-range score, same boundedness
    contract as budget_select), then a map-side join back to rows.
    NULL scores (abstentions) AND NULL groups (unattributed rows — a
    rank within no stratum is undefined; a null-unsafe join would
    otherwise drop them SILENTLY) are excluded, explicitly. Exact:
    counts are integers, the percentile is one division rounded 6dp,
    and quantization uses the same round() text both engines."""
    from pyspark.sql import Window

    s = F.round(F.col(score_col).cast("double"), precision)
    rows = df.filter(
        F.col(score_col).isNotNull() & F.col(group_col).isNotNull()
    ).withColumn("_b", s)
    hist = rows.groupBy(group_col, "_b").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(group_col).orderBy("_b")
    swept = hist.select(
        group_col,
        "_b",
        "_n",
        (F.sum("_n").over(w) - F.col("_n")).alias("_below"),
        F.sum("_n").over(
            Window.partitionBy(group_col).orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    pct = (F.col("_below") + 0.5 * F.col("_n")) / F.col("_total")
    return rows.join(swept, [group_col, "_b"]).select(
        *[c for c in df.columns if c not in (score_col,)],
        F.col(score_col),
        F.col("_total").cast("long").alias("n_group"),
        F.round(pct, 6).alias("rank_pct"),
    )


def boilerplate_line_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_frac: float = 0.05,
    df_floor: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate line stripping (staged r14; the
    CCNet / RefinedWeb line-dedup pass): a trimmed non-empty line is
    BOILERPLATE iff it occurs in >= max(``df_floor``,
    ceil(``df_frac`` * n_docs)) DISTINCT documents (nav bars, cookie
    banners, footers — the lines c4_line_filters' per-line rules
    cannot catch because they are locally well-formed), and every
    occurrence of a boilerplate line is removed. The threshold is
    scale-derived from a 1-row broadcast corpus count (the
    ngram_containment_pairs cap posture): an absolute cutoff would
    reclassify ever more legitimately-shared lines as corpus size
    grows.

    Scale shape: one posexplode, one line-fingerprint document-
    frequency aggregate (distinct per doc first, so an intra-doc
    repeat does not inflate df), one fp-keyed join back, one doc-grain
    regroup — all shuffles keyed, no windows, no self-joins.

    Returns one row per document with >= 1 non-empty line:
    (doc_id, n_lines, n_removed, removed_fraction, kept_fp) where
    kept_fp = md5 of the surviving lines newline-joined in original
    order ('' when everything was boilerplate — the c4 empty-join
    convention)."""
    lines, marked = _line_df_marked(df, text_col, id_col, df_frac, df_floor)
    joined = lines.join(marked, "_fp")
    return (
        joined.groupBy("_cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("_bp").cast("long")).cast("long").alias("n_removed"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.filter(
                            F.array_sort(
                                F.collect_list(
                                    F.struct("_pos", "_line", "_bp")
                                )
                            ),
                            lambda s: ~s["_bp"],
                        ),
                        lambda s: s["_line"],
                    ),
                    "\n",
                )
            ).alias("kept_fp"),
        )
        .select(
            F.col("_cid").alias(id_col),
            "n_lines",
            "n_removed",
            F.round(F.col("n_removed") / F.col("n_lines"), 6).alias(
                "removed_fraction"
            ),
            "kept_fp",
        )
    )


def _line_df_marked(
    df: DataFrame,
    text_col: str,
    id_col: str,
    df_frac: float,
    df_floor: int,
):
    """Shared subtree of the boilerplate pass: the per-line exploded
    frame (with md5 fingerprints) and the (fp, is_boilerplate) marking
    from the scale-derived document-frequency threshold."""
    from datapipeline_spike_spark.scale import fan_out

    lines = fan_out(df).select(
        F.col(id_col).alias("_cid"),
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), "\n"), lambda l0: F.trim(l0)),
                lambda l: l != "",
            )
        ).alias("_pos", "_line"),
    ).withColumn("_fp", F.md5("_line"))
    dfreq = (
        lines.select("_cid", "_fp")
        .distinct()
        .groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    total = df.agg(F.count(F.lit(1)).alias("_nd"))
    marked = dfreq.crossJoin(F.broadcast(total)).select(
        "_fp",
        (
            F.col("_df")
            >= F.greatest(
                F.lit(df_floor).cast("long"),
                F.ceil(F.lit(float(df_frac)) * F.col("_nd")),
            )
        ).alias("_bp"),
    )
    return lines, marked


def boilerplate_line_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_frac: float = 0.05,
    df_floor: int = 2,
) -> DataFrame:
    """The OFFLINE artifact of the boilerplate pass: one row per
    boilerplate line fingerprint (``line_fp``), computed on a reference
    corpus snapshot with exactly :func:`boilerplate_line_removal`'s
    threshold semantics. This is what the streaming deployment ships
    to the online strip stage (CCNet's topology: frequency tables are
    built per crawl snapshot offline, applied online).

    Size bound (why the online stage may broadcast it): every
    boilerplate fp occurs in >= df_frac * n_docs distinct docs, and a
    corpus has at most n_docs * avg_lines distinct (doc, fp) pairs, so
    |index| <= avg_lines_per_doc / df_frac — INDEPENDENT of corpus
    size (~2k rows at 100 lines/doc and the default 5%)."""
    _, marked = _line_df_marked(df, text_col, id_col, df_frac, df_floor)
    return marked.filter(F.col("_bp")).select(F.col("_fp").alias("line_fp"))
