"""PII detection and redaction — the scrubbing stage of a training-data
pipeline (SURVEY §2.11 extension; the reference's quality gates
README.md:449-467 validate payloads, this is the text-payload analogue
for LLM corpora).

Patterns are deliberately restricted to the regex subset Java
(java.util.regex, Spark's engine) and RE2 (DuckDB's engine) evaluate
identically: character classes, bounded repetition, ASCII word
boundaries — no lookaround, no backreferences. That keeps every
redaction decision replayable by the DuckDB oracle and portable across
engines, the same property the md5-based dedup fingerprints rely on.

All expressions are JVM-side (``regexp_count`` / ``regexp_replace``
inside whole-stage codegen) — zero Python in the hot path, map-only,
no shuffle: at 100 TB this runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom. Email first so its dotted
# domain can never be half-eaten by the IPv4 pass; SSN (3-2-4) and
# phone (3-3-4) shapes are mutually exclusive by construction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (counting before
    redacting keeps each count independent of pass order)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    }


def redact(text: Column | str) -> Column:
    """Text with every PII match replaced by its type token, applying
    the passes in ``PII_PATTERNS`` order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind PII counts, a total, a ``clean`` flag, and the
    redacted text. Map-only: survives any scale by construction."""
    counts = pii_counts(text_col)
    out = df
    for kind in counts:
        out = out.withColumn(f"n_{kind}", counts[kind])
    total = sum(F.col(f"n_{k}") for k, _, _ in PII_PATTERNS)
    return (
        out.withColumn("n_pii", total.cast("long"))
        .withColumn("clean", F.col("n_pii") == 0)
        .withColumn("redacted_text", redact(text_col))
    )
