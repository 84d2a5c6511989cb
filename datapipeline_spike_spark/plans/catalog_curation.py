"""Curation-assembly queries (r9): the end-to-end ``curate_corpus``
funnel profile and the paragraph-grain dedup profile, each with a full
stage-replayed DuckDB oracle.

The documents testdata has no newlines, so both queries plant
deterministic paragraph structure (the synthesized PNG/WAV/HTML-page
precedent): every document becomes

    'common header boilerplate' \\n <text> \\n 'footer for lang <lang>'

— a corpus-wide duplicate header (one winner: doc 0 pos 0), a unique
body, and a per-language duplicate footer (one winner per language).
The same concatenation is expressed verbatim in SQL on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans.catalog_extensions import (
    _sql_dedup_assign_ctes,
)
from datapipeline_spike_spark.plans.registry import load, register

# --- shared SQL fragments -----------------------------------------------------

_SQL_TOKS_OF = (
    "list_filter(regexp_split_to_array(lower({t}), '[^a-z0-9'']+'),"
    " t -> t != '')"
)
_SQL_SW_EN = "['the','and','of','to','in','is','that','it','for','on']"


def _sql_quality6(toks: str, text: str) -> str:
    """functions.text.quality_score_from_tokens replay, rounded 6dp —
    the same expression text as the quality_classifier_score oracle."""
    return (
        f"round(0.4 * least(len({toks}) / 200.0, 1.0)"
        f" + 0.3 * least((len(list_filter({toks}, x -> list_contains("
        f"{_SQL_SW_EN}, x))) * 1.0 / len({toks})) / 0.10, 1.0)"
        f" + 0.3 * (1.0 - (length({text}) - length(regexp_replace({text},"
        f" '[\\.,;:!\\?]', '', 'g'))) * 1.0 / length({text})), 6)"
    )


def _sql_redact(text: str) -> str:
    """operators.redaction.redact replay (pattern order preserved)."""
    from datapipeline_spike_spark.operators.redaction import PII_PATTERNS

    red = text
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return red


def _sql_u01(key: str) -> str:
    return f"(('0x' || substr(md5({key}), 1, 8))::BIGINT / 4294967296.0)"


# the synthetic paged corpus, identical text on both engines
_SQL_PAGES = (
    "SELECT doc_id, 'common header boilerplate' || chr(10) || text"
    " || chr(10) || 'footer for lang ' || lang AS text FROM documents"
)

# paragraph_dedup replay on the pages relation: split -> first-occurrence
# winner by (doc_id, pos) -> in-order reassembly (docs whose every
# paragraph lost stay as empty text, matching the operator's left join)
_SQL_PARA_CTES = f"""
    pages AS ({_SQL_PAGES}),
    parts0 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(p) + 1),
             i -> struct_pack(pos := i - 1, para := p[i]))) AS s
      FROM (SELECT doc_id, string_split(text, chr(10)) AS p FROM pages)
    ),
    parts AS (
      SELECT doc_id, s.pos AS pos, s.para AS para FROM parts0
      WHERE trim(s.para) != ''
    ),
    fps AS (
      SELECT doc_id, pos, para, md5(trim(lower(para))) AS f FROM parts
    ),
    keepp AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY f ORDER BY doc_id, pos) = 1
               AS keep
      FROM fps
    ),
    cleaned AS (
      SELECT doc_id,
             coalesce(string_agg(para, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS text,
             CAST(count(*) AS INT) AS n_paragraphs,
             CAST(count(*) FILTER (WHERE keep) AS INT) AS n_kept
      FROM keepp GROUP BY doc_id
    )
"""


@register(
    "paragraph_dedup_profile",
    oracle=f"""
    WITH {_SQL_PARA_CTES}
    SELECT p.doc_id,
           coalesce(c.text, '') AS text,
           coalesce(c.n_paragraphs, 0) AS n_paragraphs,
           coalesce(c.n_kept, 0) AS n_kept
    FROM pages p LEFT JOIN cleaned c ON p.doc_id = c.doc_id
    """,
    doc="""operators/dedup.paragraph_dedup registered (the last r8
    library operator without a registry row): MassiveText/Gopher
    paragraph-grain boilerplate removal — posexplode, min-struct
    first-occurrence winner per normalized-paragraph fingerprint,
    fingerprint join, ordered reassembly. The planted header is a
    500-way corpus duplicate (kept once, by doc 0) and each footer an
    ~SF*100-way per-language duplicate, so the removal path does real
    cross-document work; bodies survive untouched. Scale shape: no
    windows over the corpus, no self-join — the mega-duplicated header
    is a single aggregate key (AQE-splittable), and the oracle replays
    winner selection as an equivalent rank.""",
    tags=("dedup", "curation", "text"),
)
def q_paragraph_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.dedup import paragraph_dedup

    d = load(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("common header boilerplate\n"),
            F.col("text"),
            F.lit("\nfooter for lang "),
            F.col("lang"),
        ).alias("text"),
    )
    return paragraph_dedup(pages, text_col="text", id_col="doc_id", sep="\n")


# --- end-to-end curation funnel -----------------------------------------------

_MIN_QUALITY = 0.45
_TOKEN_BUDGET = 8000.0
_N_SHARDS = 4

_T = _SQL_TOKS_OF.format(t="text")

_SQL_CURATION = f"""
    WITH RECURSIVE {_SQL_PARA_CTES},
    cne AS (
      SELECT doc_id, text FROM cleaned WHERE length(text) > 0
    ),
    scored AS (
      SELECT doc_id, text, quality, len(toks) AS n_tokens
      FROM (SELECT doc_id, text, toks,
                   {_sql_quality6("toks", "text")} AS quality
            FROM (SELECT doc_id, text, {_T} AS toks FROM cne))
      WHERE quality >= {_MIN_QUALITY}
    ),
    {_sql_dedup_assign_ctes("scored")},
    ranked AS (
      SELECT a.canonical_id, a.doc_id,
             row_number() OVER (PARTITION BY a.canonical_id
                                ORDER BY s.quality DESC, a.doc_id) AS rn
      FROM assignment a JOIN scored s ON a.doc_id = s.doc_id
    ),
    survivors AS (
      SELECT s.* FROM scored s
      JOIN ranked r ON s.doc_id = r.doc_id AND r.rn = 1
    ),
    red AS (
      SELECT doc_id, {_sql_redact("text")} AS text, quality, n_tokens
      FROM survivors
    ),
    hist AS (
      SELECT round(quality, 4) AS bkt, sum(CAST(n_tokens AS DOUBLE)) AS mass
      FROM red GROUP BY 1
    ),
    cum AS (
      SELECT bkt, mass,
             coalesce(sum(mass) OVER (ORDER BY bkt DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
               AS mass_above
      FROM hist
    ),
    thr AS (
      SELECT bkt AS b0,
             least(({_TOKEN_BUDGET} - mass_above)
                   / CASE WHEN mass > 0 THEN mass ELSE 1.0 END, 1.0) AS rate
      FROM cum WHERE mass_above < {_TOKEN_BUDGET} ORDER BY bkt LIMIT 1
    ),
    sel AS (
      SELECT r.* FROM red r, thr
      WHERE round(r.quality, 4) > thr.b0
         OR (round(r.quality, 4) = thr.b0
             AND {_sql_u01("CAST(r.doc_id AS VARCHAR)")} < thr.rate)
    ),
    sharded AS (
      SELECT doc_id, text,
             CAST(floor({_sql_u01("CAST(doc_id AS VARCHAR) || '#0'")}
                        * {_N_SHARDS}) AS INT) AS shard
      FROM sel
    ),
    funnel AS (
      SELECT '00_input' AS stage, count(*) AS n_docs,
             coalesce(sum(len({_T})), 0) AS n_tokens FROM pages
      UNION ALL
      SELECT '10_paragraph_dedup', count(*), coalesce(sum(len({_T})), 0)
      FROM cne
      UNION ALL
      SELECT '20_quality_floor', count(*), coalesce(sum(len({_T})), 0)
      FROM scored
      UNION ALL
      SELECT '30_neardup_best_copy', count(*), coalesce(sum(len({_T})), 0)
      FROM survivors
      UNION ALL
      SELECT '40_redacted', count(*), coalesce(sum(len({_T})), 0) FROM red
      UNION ALL
      SELECT '50_budget', count(*), coalesce(sum(len({_T})), 0) FROM sel
      UNION ALL
      SELECT '60_shard_' || CAST(shard AS VARCHAR), count(*),
             coalesce(sum(len({_T})), 0)
      FROM sharded GROUP BY shard
    )
    SELECT stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM funnel
"""


@register(
    "curation_stage_profile",
    oracle=_SQL_CURATION,
    doc="""The flagship §2.11 deliverable as ONE oracle-checked query:
    operators/curation.curate_corpus run end to end on the paged
    corpus — paragraph boilerplate dedup, quality floor (0.45), LSH
    near-dup collapse with keep-best-copy survivors, PII redaction,
    token-budget selection (8k), deterministic 4-shard split — reported
    as its acceptance funnel: (stage, n_docs, n_tokens) per stage plus
    one row per training shard. The oracle replays EVERY stage in SQL:
    the paragraph CTEs, the quality expression, the shared
    exact-collapse -> LSH -> Jaccard -> transitive-closure dedup chain
    (parameterized over the mid-pipeline 'scored' relation), the argmax
    survivor rank, the redaction regex chain, the histogram-threshold
    budget cut, and the md5 shard draw — so the driver hash certifies
    the COMPOSITION, not just the stages in isolation. Tokens are
    recomputed from each stage's current text (the funnel downstream
    actually trains on). Scale: the profile adds one bounded aggregate
    per stage on top of the pipeline's own guarded-LSH cost; the
    scoring frame is persisted once and freed via the r9 cache_handle
    lifecycle (no clearCache sledgehammer).""",
    tags=("curation", "pipeline", "dedup", "quality", "sampling"),
)
def q_curation_stage_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.curation import curation_profile

    d = load(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("common header boilerplate\n"),
            F.col("text"),
            F.lit("\nfooter for lang "),
            F.col("lang"),
        ).alias("text"),
    )
    handle: list[DataFrame] = []
    return curation_profile(
        pages,
        min_quality=_MIN_QUALITY,
        jaccard_threshold=0.8,
        token_budget=_TOKEN_BUDGET,
        n_shards=_N_SHARDS,
        cache_handle=handle,
    )
