"""Text-analysis expressions (SURVEY.md §2.11 — north-star extension).

Everything here is built-in-function based (JVM-side) and deliberately
SQL-expressible so the DuckDB oracle can replay it: tokenization is a
regex split, hashing is md5 (identical hex output in Spark and DuckDB),
language ID is a stopword-ratio heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "token_count",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "quality_score",
    "fingerprint_md5",
    "shingles",
]

# Tiny per-language stopword inventories for the n-gram/stopword language
# heuristic. Public common-word lists; kept minimal so the oracle SQL can
# inline them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}


def normalize_text(c: Column | str) -> Column:
    """lowercase, collapse whitespace, strip — canonical form for
    fingerprinting and dedup."""
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace/punctuation tokenizer -> array<string> (empty strings
    removed). The BPE-ish variant is the same split on a finer regex.
    array_remove instead of a filter() lambda: higher-order functions
    are interpreted (CodegenFallback) and break whole-stage codegen,
    while array_remove stays compiled."""
    c = F.col(c) if isinstance(c, str) else c
    return F.array_remove(F.split(F.lower(c), r"[^a-z0-9']+"), "")


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


BPEISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpeish_tokens(c: Column | str) -> Column:
    """Finer-grained tokenizer (the 'BPE-ish regex' of SURVEY §2.11):
    letter runs, digit runs, and individual punctuation marks are
    separate tokens — approximating how a subword vocabulary splits
    mixed text, without needing a trained merges table. RE2-compatible
    pattern so the DuckDB oracle uses it verbatim."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(F.lower(c), F.lit(BPEISH_PATTERN), 0)


def avg_token_len(c: Column | str) -> Column:
    return avg_token_len_from_tokens(tokens(c))


def avg_token_len_from_tokens(t: Column) -> Column:
    """Metric over a PRE-TOKENIZED array — callers computing several
    token metrics should tokenize once into a named column and use the
    ``_from_tokens`` forms (the text-column forms re-run the regex split
    per metric; a 5-metric profile paid it 7x per row)."""
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0.0), lambda a, s: a + F.length(s)) / F.size(t),
    ).otherwise(F.lit(None))


def punct_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[\.,;:!\?]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(None))


def digit_ratio(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, digits / n).otherwise(F.lit(None))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    return stopword_ratio_from_tokens(tokens(c), lang)


def stopword_ratio_from_tokens(t: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda tok: F.array_contains(sw, tok)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(None))


def quality_score(c: Column | str) -> Column:
    """Composite document-quality score in [0,1] — the text analogue of
    the reference's calculateQualityScore (reference/README.md:490-492,
    formula unspecified there; engine definition documented here):
    0.4*length_score + 0.3*stopword_score + 0.3*(1 - punct_ratio),
    where length_score saturates at 200 tokens and stopword_score
    saturates at a 10% English stopword ratio."""
    return quality_score_from_tokens(tokens(c), c)


def quality_score_from_tokens(t: Column, c: Column | str) -> Column:
    """Same formula over a pre-tokenized array (punct_ratio still reads
    the raw text — it is character-level)."""
    tc = F.size(t).cast("double")
    length_score = F.least(tc / F.lit(200.0), F.lit(1.0))
    sw_score = F.least(
        F.coalesce(stopword_ratio_from_tokens(t), F.lit(0.0)) / F.lit(0.10),
        F.lit(1.0),
    )
    p_score = F.lit(1.0) - F.coalesce(punct_ratio(c), F.lit(0.0))
    return 0.4 * length_score + 0.3 * sw_score + 0.3 * p_score


def fingerprint_md5(c: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    md5 yields identical lowercase hex in Spark and DuckDB, making exact
    dedup oracle-checkable.

    Shared assumption (ADVICE r19, repo-wide convention): every md5
    identity key in the engine — this fingerprint, the span-removal
    posting digests (``dedup.dedup_span_removal``), the paragraph
    fingerprints — treats 128 bits as collision-free, which is true for
    RANDOM collisions at any corpus size (2^64 birthday bound) but not
    against ADVERSARIALLY crafted inputs (md5 is collision-broken: an
    attacker can construct two texts with one digest and merge their
    dedup identities). Adversarial dedup-poisoning is out of scope for
    this engine; a deployment that must resist it swaps this one
    function (and the posting-key expression) to sha2-256-truncated or
    xxhash64-pair digests — both engines support each."""
    return F.md5(normalize_text(c))


def ngrams(c: Column | str, k: int = 3) -> Column:
    """All word k-grams as strings ('w1 w2 w3'), in document order WITH
    duplicates — the multiset form repetition metrics need (a doc that
    repeats one bigram 50 times must count it 50 times).

    The token array is bound as a LAMBDA VARIABLE (via a one-element
    array transform) before the sliding-window transform runs.
    Interpreted higher-order functions re-evaluate any outer expression
    referenced in the lambda body once per element — referencing the
    split() directly turns shingling quadratic (regex split per shingle
    index, ~50x slower on real documents)."""

    def _ng(t: Column) -> Column:
        n = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))
        return F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, k))),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens(c)), _ng), 1)


def shingles(c: Column | str, k: int = 3) -> Column:
    """Word k-shingles as strings ('w1 w2 w3'), distinct — the unit set
    for MinHash / Jaccard near-dup detection. See ngrams() for the
    lambda-binding trick; this is its set projection."""
    return F.array_distinct(ngrams(c, k))


def token_chunks(c: Column | str, chunk_size: int = 64, stride: int = 48) -> Column:
    """Overlapping fixed-size token windows — the context-window prep
    stage of a training pipeline: array<struct<chunk_idx int, chunk_text
    string, chunk_tokens int>>, windows starting at 0, stride, 2*stride
    ... (< n), each chunk_size tokens (the last one short). stride <
    chunk_size gives chunk_size - stride tokens of overlap so no span
    is split across a boundary without context. Same lambda-binding
    trick as ngrams(): the token array is bound once, not re-split per
    chunk."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")

    def _ch(t: Column) -> Column:
        n = F.size(t)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
        return F.when(
            n > 0,
            F.transform(
                F.filter(starts, lambda s: s < n),
                lambda s, i: F.struct(
                    i.cast("int").alias("chunk_idx"),
                    F.concat_ws(" ", F.slice(t, s + 1, chunk_size)).alias("chunk_text"),
                    F.least(n - s, F.lit(chunk_size)).cast("int").alias("chunk_tokens"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<chunk_idx:int,chunk_text:string,chunk_tokens:int>>")
        )

    return F.element_at(F.transform(F.array(tokens(c)), _ch), 1)
