"""HTML -> text extraction (operators/html.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.html import html_title, html_to_text

PAGE = """<!DOCTYPE html>
<html><head>
<title>  Spark &amp; the  Crawl </title>
<style>body { color: red; }</style>
<script>var x = "<p>not text</p>";</script>
</head>
<body>
<!-- navigation -->
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Blog</a>
<a href="/c">Contact</a> <a href="/d">Login</a></nav>
<h1>Heading &lt;one&gt;</h1>
<p>First paragraph with a <a href="x">single link</a> and enough plain
prose around it to keep the density low.</p>
<div>Second   block &quot;quoted&quot; &#39;text&#39;&nbsp;here.</div>
<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>
</body></html>"""


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return df.select(html_to_text("html", **kw).alias("t")).first()["t"]


def test_html_to_text_strips_markup_and_boilerplate(spark):
    t = _extract(spark, PAGE)
    lines = t.split("\n")
    assert lines[0] == "Heading <one>"
    assert lines[1].startswith("First paragraph with a single link")
    assert lines[2] == "Second block \"quoted\" 'text' here."
    assert len(lines) == 3
    # script/style/comment/nav/footer content is gone
    for bad in ("color: red", "var x", "navigation", "Home", "Terms"):
        assert bad not in t
    # entity decode happened exactly once (&amp;lt; would be a bug)
    assert "&" not in t


def test_html_link_density_gate_is_tunable(spark):
    # with the gate disabled, the nav and footer rows come back
    t = _extract(spark, PAGE, max_link_density=float("inf"))
    assert "Home About Blog Contact Login" in t
    assert "Terms Privacy" in t


def test_html_title_and_edges(spark):
    df = spark.createDataFrame(
        [(0, PAGE), (1, "no markup at all"), (2, None), (3, "")],
        "doc_id long, html string",
    )
    rows = {
        r["doc_id"]: (r["title"], r["t"])
        for r in df.select(
            "doc_id",
            html_title("html").alias("title"),
            html_to_text("html").alias("t"),
        ).collect()
    }
    assert rows[0][0] == "Spark & the Crawl"
    # idempotent on plain text
    assert rows[1] == ("", "no markup at all")
    assert rows[2] == (None, None)
    assert rows[3] == ("", "")


def test_html_to_text_feeds_paragraph_dedup(spark):
    """Composition: extracted blocks are exactly the paragraph grain
    paragraph_dedup consumes — shared boilerplate paragraphs collapse
    across pages."""
    from datapipeline_spike_spark.operators.dedup import paragraph_dedup

    shared = "<p>Subscribe to our newsletter for more updates and offers.</p>"
    pages = [
        (0, f"<h1>Page one</h1><p>Unique story about parquet files.</p>{shared}"),
        (1, f"<h1>Page two</h1><p>Different story about shuffles.</p>{shared}"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    texts = df.select("doc_id", html_to_text("html").alias("text"))
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(texts, sep="\n").collect()
    }
    assert "Subscribe to our newsletter" in out[0]
    assert "Subscribe to our newsletter" not in out[1]
    assert "Different story about shuffles." in out[1]
