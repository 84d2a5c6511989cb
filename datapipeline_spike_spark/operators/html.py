"""HTML -> text extraction (SURVEY.md §2.11 — web-crawl front door).

The first transform of every web-scale pretraining pipeline is crawl
HTML -> clean text (C4/CCNet start from WET extractions; jusText/
trafilatura do it from raw HTML). This is that stage as pure built-in
Column expressions — map-only, no UDFs, whole plan stays JVM-side, and
every regex is Java-regex/RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracle replays it verbatim.

Pipeline (documented engine semantics, deliberately regex-grade — a
best-effort extractor for malformed real-world HTML, not an HTML5
parser):

1. normalize source newlines/tabs to spaces (HTML treats them as
   whitespace — only tag structure makes block boundaries), then drop
   ``<head>`` (with a bare-``<title>`` fallback for unclosed heads),
   ``<script>``/``<style>`` elements and ``<!-- -->`` comments;
2. mark anchor openings with a \\x01 sentinel (consumed by the
   link-density filter below), then turn block-level tags (p, br, div,
   li, headings, table rows, semantic sections) into newlines so
   document structure survives tag stripping — the block grain is what
   :func:`~datapipeline_spike_spark.operators.dedup.paragraph_dedup`
   consumes downstream;
3. strip every remaining tag; decode the common entities
   (&lt; &gt; &quot; &#39; &apos; &nbsp; then &amp; LAST so
   ``&amp;lt;`` does not double-decode);
4. split into blocks, compute per-block word and link-marker counts
   with one bound-array transform, and drop empty blocks plus
   *link-dense* blocks (links > max_link_density * words — the jusText
   boilerplate heuristic: nav bars, footers and link farms are mostly
   anchors, body prose is not);
5. re-join surviving blocks with single newlines, inner whitespace
   collapsed.

Returns NULL for NULL input; plain text without tags passes through
(modulo whitespace collapse), so the operator is idempotent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["html_title", "html_to_text"]

_LINK = "\x01"
# block-level elements whose open OR close tag becomes a newline
_BLOCK_TAGS = (
    "p|br|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|"
    "header|footer|nav|blockquote|pre|hr|td|th"
)
# decoded FIRST; &amp; must come last (see module docstring)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_title(c: Column | str) -> Column:
    """Contents of the first ``<title>`` element, entity-decoded and
    whitespace-collapsed; empty string when absent."""
    c = F.col(c) if isinstance(c, str) else c
    t = F.regexp_extract(c, r"(?is)<title[^>]*>([^<]*)", 1)
    for ent, rep in _ENTITIES:
        t = F.regexp_replace(t, ent, rep)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_to_text(
    c: Column | str, *, max_link_density: float = 0.5
) -> Column:
    """Clean text from an HTML document column — see module docstring.

    ``max_link_density``: a block survives while its anchor count is
    <= this fraction of its word count (0.5 default: a 10-word nav row
    with 6 links dies, a paragraph citing 2 links in 40 words lives).
    Pass float('inf') to disable boilerplate dropping."""
    c = F.col(c) if isinstance(c, str) else c
    # source newlines/tabs are just whitespace in HTML — only TAG
    # structure may create block boundaries below
    x = F.regexp_replace(c, r"[\r\n\t]+", " ")
    x = F.regexp_replace(x, r"(?is)<head\b[^>]*>.*?</head>", " ")
    x = F.regexp_replace(x, r"(?is)<title\b[^>]*>.*?</title>", " ")  # unclosed-head fallback
    x = F.regexp_replace(x, r"(?is)<script\b[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?i)<a\b[^>]*>", _LINK)
    x = F.regexp_replace(x, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        x = F.regexp_replace(x, ent, rep)

    def _blocks(raw: Column) -> Column:
        # one pass per block: word count with the link markers blanked,
        # link count from the marker chars, cleaned text
        scored = F.transform(
            F.split(raw, r"\n+"),
            lambda b: F.struct(
                F.trim(
                    F.regexp_replace(F.translate(b, _LINK, " "), r"\s+", " ")
                ).alias("txt"),
                (F.length(b) - F.length(F.translate(b, _LINK, ""))).alias(
                    "links"
                ),
            ),
        )
        kept = F.filter(
            scored,
            lambda s: (F.length(s["txt"]) > 0)
            & (
                s["links"].cast("double")
                <= F.lit(float(max_link_density))
                * F.size(F.split(s["txt"], r"\s+"))
            ),
        )
        return F.concat_ws("\n", F.transform(kept, lambda s: s["txt"]))

    # bind the flattened string once (lambda-binding trick: interpreted
    # HOFs re-evaluate outer expressions per element, which would re-run
    # the whole regex chain once per block)
    return F.when(
        c.isNotNull(), F.element_at(F.transform(F.array(x), _blocks), 1)
    )


_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
# case-insensitive, '=' optional: real crawls carry UTM_Source=x and
# valueless fbclid flags (r14 review)
_TRACKING_PARAM_RE = r"(?i)^(utm_[a-z]+|fbclid|gclid|ref)(=|$)"


def canonical_url(c: Column | str) -> Column:
    """RFC-3986-flavored URL canonicalization (staged r14) — the
    normalization every web-crawl dedup runs before URL-level dedup
    (the same page arrives as http://WWW.Site.com/path?utm_source=x
    and https://site.com/path): lowercase scheme + host, strip a
    leading ``www.``, strip the scheme-default port (:80 http, :443
    https), strip one trailing slash from a non-root path (empty path
    -> ``/``), DROP the fragment, drop tracking query params
    (utm_*, fbclid, gclid, ref) and SORT the survivors so param order
    never splits a group. Non-URL strings (no scheme://) return NULL.
    Pure built-in regex/array expressions — map-only, codegen-side
    except the bounded param-list HOFs."""
    c = F.col(c) if isinstance(c, str) else c
    scheme = F.lower(F.regexp_extract(c, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(c, _URL_RE, 2))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host1.endswith(":80"),
        F.regexp_replace(host1, ":80$", ""),
    ).when(
        (scheme == "https") & host1.endswith(":443"),
        F.regexp_replace(host1, ":443$", ""),
    ).otherwise(host1)
    path0 = F.regexp_extract(c, _URL_RE, 3)
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path0) > 1) & path0.endswith("/"),
            F.regexp_replace(path0, "/$", ""),
        ).otherwise(path0)
    )
    qs = F.regexp_extract(c, _URL_RE, 4)
    params = F.filter(
        F.split(F.regexp_replace(qs, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), host, path, query),
    )


def url_canonical_dedup(
    df, url_col: str = "url", id_col: str = "doc_id"
):
    """URL-level dedup groups under :func:`canonical_url` (staged r14):
    every row gets its canonical form, the size of its canonical
    group, and whether it is the group's canonical representative
    (lowest id — the deterministic survivor rule shared with
    dedup_corpus). Rows whose URL fails to parse (NULL canonical) are
    excluded — an unparseable URL belongs to no group. Scale shape:
    map-only canonicalization + ONE canonical-keyed aggregate joined
    back (keyed shuffles only; the group frame is group-count-sized).

    Returns (id, url, canonical_url, group_size, is_canonical)."""
    rows = df.select(
        F.col(id_col),
        F.col(url_col),
        canonical_url(url_col).alias("canonical_url"),
    ).filter(F.col("canonical_url").isNotNull())
    groups = rows.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min(id_col).alias("_rep"),
    )
    return rows.join(groups, "canonical_url").select(
        id_col,
        url_col,
        "canonical_url",
        F.col("group_size").cast("long").alias("group_size"),
        (F.col(id_col) == F.col("_rep")).alias("is_canonical"),
    )
