"""Content-type detectors (staged r14 wave 2, register r16): code
detection and license detection over a text corpus.

Why these belong in a training-data engine: code-vs-prose routing is
the first split a mixed web corpus makes (code goes to a code-specific
cleaning stack — The Stack / StarCoder pipelines; prose to the CCNet
stack), and license detection is the compliance gate those code
pipelines run before admission (permissive-only corpora filter on
exactly this signal). Reference scope: the reference docs describe
quality routing by content class (README.md routing section); these
are the two routing signals a text+code corpus needs, Spark-first.

Both are MAP-ONLY regex/translate batteries over built-in JVM
expressions (no UDFs, no shuffle until the final small rollup), so at
100 TB they run at scan speed with only (source × class)-grain rows
shuffling. Engine parity: every count is an exact integer
(regexp_count / length-after-translate); the code-density test is an
integer cross-multiply (sym * 50 > n_chars, i.e. density > 2%) so no
float comparison anywhere; the only float outputs are 6dp-rounded
means of exact ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R = 6

# keyword batteries — deliberately small, anchored with \b so prose
# words ("classic", "variant") never fire; both Java regex and RE2
# (DuckDB) implement these identically
KW_PYTHON = r"\b(def|import|class|lambda|elif)\b"
KW_JS = r"\b(function|var|const|let)\b"
KW_C = r"(#include|\bprintf\b|\bvoid\b|\bint main\b)"
CODE_SYMBOLS = "{};=<>#()"

# license battery, priority order = first match wins (copyleft first so
# dual-mention texts classify conservatively); patterns over lower(text)
LICENSE_PATTERNS = (
    ("gpl-3.0", r"(gpl-3\.0|gnu general public license)", False),
    ("apache-2.0", r"(apache-2\.0|apache license)", True),
    ("bsd-3-clause", r"(bsd-3-clause|bsd license)", True),
    ("cc-by-4.0", r"(cc-by-4\.0|creative commons)", True),
    ("mit", r"\bmit\b", True),
)


def code_detect_profile(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-(source, language family) code-detection rollup.

    Per doc: keyword hits per family (python/js/c batteries above),
    symbol count (chars in ``{};=<>#()`` via length-after-translate),
    family = argmax with fixed py > js > c tie priority and a >= 2
    keyword floor ('none' otherwise), is_code = family detected AND
    symbol density > 2% (integer cross-multiply). Rollup: n_docs,
    n_code, mean symbol ratio, total keyword hits per (source, family).
    """
    txt = F.lower(F.col(text_col))
    n_chars = F.length(text_col)
    sym = n_chars - F.length(F.translate(F.col(text_col), CODE_SYMBOLS, ""))
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        n_chars.alias("_nc"),
        sym.alias("_sym"),
        F.regexp_count(txt, F.lit(KW_PYTHON)).alias("_py"),
        F.regexp_count(txt, F.lit(KW_JS)).alias("_js"),
        F.regexp_count(txt, F.lit(KW_C)).alias("_c"),
    ).select(
        "source",
        "_nc",
        "_sym",
        F.when(
            (F.col("_py") >= F.col("_js"))
            & (F.col("_py") >= F.col("_c"))
            & (F.col("_py") >= 2),
            F.lit("python"),
        )
        .when((F.col("_js") >= F.col("_c")) & (F.col("_js") >= 2), F.lit("js"))
        .when(F.col("_c") >= 2, F.lit("c"))
        .otherwise(F.lit("none"))
        .alias("family"),
        (F.col("_py") + F.col("_js") + F.col("_c")).alias("_kw"),
    )
    is_code = (F.col("family") != "none") & (
        F.col("_sym") * 50 > F.col("_nc")
    )
    return (
        per_doc.filter(F.col("_nc") > 0)
        .groupBy("source", "family")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(is_code.cast("int")).cast("long").alias("n_code"),
            F.round(
                F.avg(F.col("_sym").cast("double") / F.col("_nc")), R
            ).alias("mean_symbol_ratio"),
            F.sum("_kw").cast("long").alias("total_kw_hits"),
        )
    )


def license_detect_profile(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-(source, license) rollup of license mentions.

    Per doc: first-match license over :data:`LICENSE_PATTERNS`
    (priority order, copyleft first; 'none' when nothing fires) and the
    license's permissive flag. Rollup: n_docs, n_permissive, and each
    license's share of its source (6dp) — the admission-gate table a
    permissive-only corpus build reads."""
    txt = F.lower(F.col(text_col))
    lic = F.lit("none")
    perm = F.lit(False)
    for name, pat, permissive in reversed(LICENSE_PATTERNS):
        hit = F.regexp_count(txt, F.lit(pat)) > 0
        lic = F.when(hit, F.lit(name)).otherwise(lic)
        perm = F.when(hit, F.lit(permissive)).otherwise(perm)
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        lic.alias("license"),
        perm.alias("_perm"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("_src_docs")
    )
    return (
        per_doc.groupBy("source", "license")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("_perm").cast("int")).cast("long").alias("n_permissive"),
        )
        .join(F.broadcast(per_src), "source")
        .select(
            "source",
            "license",
            "n_docs",
            "n_permissive",
            F.round(F.col("n_docs") / F.col("_src_docs"), R).alias(
                "source_share"
            ),
        )
    )
