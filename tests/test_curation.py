"""End-to-end curation assembly (operators/curation.py)."""

from __future__ import annotations

from datapipeline_spike_spark.operators.curation import curate_corpus

BOILER = "Subscribe to our newsletter for offers and updates every week."
STORY_A = (
    "The parquet reader prunes row groups using footer statistics and "
    "the planner pushes filters down to the scan so that only the "
    "matching pages are ever read from the object store."
)
STORY_B = (
    "Shuffle partitions should be sized so that each task fits in "
    "memory because a spill to disk during the exchange is the most "
    "common cause of slow wide stages in practice."
)


def _corpus(spark):
    rows = [
        # near-dup family: 1 is the original, 2 a superset copy with
        # HIGHER quality (longer prose); kept boilerplate-free so the
        # paragraph stage cannot perturb their similarity
        (1, STORY_A),
        (2, f"{STORY_A} The reader also caches the decoded dictionary pages between the row groups."),
        # gibberish low-quality doc (scores ~0.27: no stopwords, tiny length)
        (3, "zzk qqv 9 xx!!"),
        # unique doc with PII, carrying the shared boilerplate paragraph
        (4, f"{STORY_B} Contact alice@example.com for details.\n{BOILER}"),
        # second carrier: its boilerplate copy must vanish (doc 4 is first)
        (5, f"{BOILER}\nThe optimizer folds constant expressions before the plan is cached for reuse by later queries in the same session."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_end_to_end_stages(spark):
    out = {
        r["doc_id"]: r.asDict()
        for r in curate_corpus(
            _corpus(spark), min_quality=0.35, jaccard_threshold=0.5
        ).collect()
    }
    # gibberish doc failed the quality floor
    assert 3 not in out
    # near-dup family collapsed to the HIGHER-quality copy (doc 2,
    # despite doc 1 being first) — label != survivor
    assert 2 in out and 1 not in out
    # both unique docs survive; the boilerplate paragraph exists ONLY
    # at its first corpus occurrence (doc 4), not in doc 5
    assert 4 in out and 5 in out
    assert BOILER in out[4]["text"]
    assert BOILER not in out[5]["text"]
    # PII redacted
    assert "alice@example.com" not in out[4]["text"]
    assert "[EMAIL]" in out[4]["text"]
    # schema: quality + n_tokens carried through
    assert set(out[4]) == {"doc_id", "text", "quality", "n_tokens"}


def test_curate_corpus_html_front_door_and_tail_stages(spark):
    html_rows = [
        (
            i,
            "<html><head><title>t</title></head><body>"
            "<nav><a href='/'>Home</a> <a href='/b'>Blog</a></nav>"
            f"<p>{STORY_A} Variation token number {i} keeps the "
            f"documents distinct from one another.</p></body></html>",
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(html_rows, "doc_id long, html string")
    out = curate_corpus(
        df,
        html_col="html",
        min_quality=0.0,
        jaccard_threshold=0.95,
        token_budget=400.0,
        n_shards=4,
        seed=1,
    ).collect()
    assert 0 < len(out) < 20  # budget genuinely cut the corpus
    for r in out:
        assert "Home" not in r["text"]  # nav boilerplate gone
        assert 0 <= r["shard"] < 4
        assert "shuffle_u" in r.asDict()
    # deterministic end to end: rerun and input-layout invariance
    again = curate_corpus(
        df.repartition(7),
        html_col="html",
        min_quality=0.0,
        jaccard_threshold=0.95,
        token_budget=400.0,
        n_shards=4,
        seed=1,
    ).collect()
    key = lambda rows: sorted((r["doc_id"], r["text"], r["shard"]) for r in rows)
    assert key(again) == key(out)
