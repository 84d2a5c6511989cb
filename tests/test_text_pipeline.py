"""Round-3 text-pipeline extensions: deterministic stratified sampling,
repetition profiling (non-distinct ngrams), benchmark contamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import text as Tx
from datapipeline_spike_spark.operators.sampling import hash_u01, stratified_sample


def test_ngrams_keep_duplicates_shingles_do_not(spark):
    df = spark.createDataFrame([("a b a b a b",)], ["text"])
    row = df.select(
        Tx.ngrams("text", k=2).alias("ng"), Tx.shingles("text", k=2).alias("sh")
    ).collect()[0]
    assert row["ng"] == ["a b", "b a", "a b", "b a", "a b"]
    assert sorted(row["sh"]) == ["a b", "b a"]


def test_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([("only",), ("",)], ["text"])
    rows = df.select(Tx.ngrams("text", k=2).alias("ng")).collect()
    assert all(r["ng"] == [] for r in rows)


def test_stratified_sample_deterministic_and_partition_invariant(spark, sf_dir):
    from datapipeline_spike_spark.plans.registry import load

    d = load(spark, sf_dir, "documents")
    rate = F.lit(0.5)
    a = {r["doc_id"] for r in stratified_sample(d, "doc_id", rate).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(d.repartition(13), "doc_id", rate).collect()
    }
    assert a == b  # decision depends on the key alone, not layout
    n = d.count()
    assert 0.35 * n < len(a) < 0.65 * n  # uniform draw actually thins


def test_stratified_sample_respects_per_stratum_rate(spark, sf_dir):
    from datapipeline_spike_spark.plans.registry import load

    d = load(spark, sf_dir, "documents")
    rate = F.when(F.col("doc_id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    kept = stratified_sample(d, "doc_id", rate).select("doc_id").collect()
    assert len(kept) > 0
    assert all(r["doc_id"] % 2 == 0 for r in kept)


def test_hash_u01_range(spark, sf_dir):
    from datapipeline_spike_spark.plans.registry import load

    d = load(spark, sf_dir, "documents")
    row = d.agg(
        F.min(hash_u01("doc_id")).alias("lo"), F.max(hash_u01("doc_id")).alias("hi")
    ).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0


def test_repetition_profile_flags_planted_repeater(spark, tmp_path, sf_dir):
    """A doc that is one bigram stamped 50 times must be flagged; a
    diverse doc must not."""
    import shutil

    from datapipeline_spike_spark.plans import REGISTRY

    src = f"{sf_dir}/documents.parquet"
    spot = str(tmp_path / "docs")
    base = spark.read.parquet(src).limit(0)
    planted = spark.createDataFrame(
        [
            (900001, "spam ham " * 50, "en", "srcX", 400),
            (900002, " ".join(f"w{i}" for i in range(100)), "en", "srcX", 400),
        ],
        schema=base.schema,
    )
    planted.write.mode("overwrite").parquet(f"{spot}/documents.parquet")
    try:
        out = {
            r["doc_id"]: r
            for r in REGISTRY["repetition_profile"].spark(spark, spot).collect()
        }
        assert out[900001]["repetitive"] is True
        assert out[900001]["top_bigram_frac"] > 0.4
        assert out[900002]["repetitive"] is False
        assert abs(out[900002]["type_token_ratio"] - 1.0) < 1e-9
    finally:
        shutil.rmtree(spot, ignore_errors=True)


def test_benchmark_contamination_detects_planted_overlap(spark, tmp_path, sf_dir):
    """Doc 15 copies a 6-token span from benchmark doc 7 (7 % 7 == 0);
    doc 16 shares nothing. Only doc 15 may be reported (15 and 16 are
    not multiples of 7, so both are corpus-side)."""
    import shutil

    from datapipeline_spike_spark.plans import REGISTRY

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(0)
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (7, bench_text, "en", "srcB", 40),
            (15, "intro words beta gamma delta epsilon zeta eta outro", "en", "srcC", 40),
            (16, "one two three four five six seven eight nine ten", "en", "srcC", 40),
        ],
        schema=base.schema,
    )
    spot = str(tmp_path / "docs2")
    docs.write.mode("overwrite").parquet(f"{spot}/documents.parquet")
    try:
        out = {
            r["doc_id"]: r
            for r in REGISTRY["benchmark_contamination"].spark(spark, spot).collect()
        }
        assert set(out) == {15}
        assert out[15]["n_contaminated"] == 2  # two shared 5-grams in the span
    finally:
        shutil.rmtree(spot, ignore_errors=True)


def test_token_chunks_overlap_and_tail(spark):
    """100 tokens at chunk 64 / stride 48: windows at 0 (64 tokens),
    48 (52), 96 (4) — overlapping spans repeat their 16-token context,
    the tail stays short, nothing is dropped."""
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(text,)], ["text"])
    chunks = df.select(F.explode(Tx.token_chunks("text", 64, 48)).alias("c")).collect()
    got = [(r["c"]["chunk_idx"], r["c"]["chunk_tokens"]) for r in chunks]
    assert got == [(0, 64), (1, 52), (2, 4)]
    first, second = chunks[0]["c"]["chunk_text"].split(), chunks[1]["c"]["chunk_text"].split()
    assert first[48:] == second[:16]  # the 16-token overlap is verbatim
    assert first[0] == "w0" and second[0] == "w48"


def test_token_chunks_short_and_empty(spark):
    df = spark.createDataFrame([("only two",), ("",)], ["text"])
    rows = df.select(Tx.token_chunks("text", 64, 48).alias("ch")).collect()
    assert [(c["chunk_idx"], c["chunk_tokens"]) for c in rows[0]["ch"]] == [(0, 2)]
    assert rows[1]["ch"] == []


def test_corpus_scored_queries_build_lazily_and_reuse_scan(spark, sf_dir):
    """Building unigram_logprob_score / tfidf_top_terms must NOT fire a
    Spark job (the r4 plan collected corpus totals at plan-build time,
    double-scanning the tokenize+explode pipeline), and the totals must
    live in-plan as a broadcast so one exchange serves every branch."""
    from datapipeline_spike_spark.plans.registry import REGISTRY

    from datapipeline_spike_spark.plans.registry import load

    sc = spark.sparkContext

    def jobs_during(group, thunk):
        sc.setJobGroup(group, "plan construction must be lazy")
        try:
            out = thunk()
        finally:
            sc.setJobGroup(None, None)
        return out, len(set(sc.statusTracker().getJobIdsForGroup(group)))

    # A bare parquet load fires schema/listing metadata jobs; that is the
    # lazy baseline the full query must not exceed (a plan-build collect
    # adds a real multi-stage job on top).
    _, baseline = jobs_during("lazy-check-baseline", lambda: load(spark, sf_dir, "documents"))
    for name in ("unigram_logprob_score", "tfidf_top_terms"):
        df, n_jobs = jobs_during(
            f"lazy-check-{name}", lambda: REGISTRY[name].spark(spark, sf_dir)
        )
        assert n_jobs <= baseline, (
            f"{name} ran {n_jobs} Spark jobs during plan construction "
            f"(bare load fires {baseline}) — a collect() is hiding in the plan build"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # sanity: it still computes
        assert df.limit(5).count() >= 0


def test_bm25_planted_relevant_doc_ranks_first(spark, tmp_path):
    """A document saturated with the fixed query terms must outrank
    docs that barely mention them; a doc with none of the terms must
    not appear at all."""
    from pyspark.sql import functions as F

    from datapipeline_spike_spark.plans import REGISTRY

    filler = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = [
        (0, "window stream vector window stream vector window stream"),
        (1, filler + "window"),
        (2, filler + "completely unrelated words only"),
        (3, filler + "stream vector"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(f"{sf}/documents.parquet")

    rows = REGISTRY["bm25_ranked_retrieval"].spark(spark, sf).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert ranked[0] == 0          # term-dense doc wins
    assert 2 not in ranked         # no query terms -> not retrieved
    assert set(ranked) == {0, 1, 3}


def test_source_overlap_matrix_detects_planted_containment(spark, tmp_path):
    """A source whose docs are verbatim copies of another source's must
    show containment 1.0 against it; an unrelated source shows zero
    overlap (no row at all)."""
    from pyspark.sql import functions as F

    from datapipeline_spike_spark.plans import REGISTRY

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "totally different content about spark shuffles joins and aggregation plans"
    docs = [
        (0, a, "srcA"),
        (1, a + " with a small extra tail of new words appended here", "srcA"),
        (2, a, "srcB"),          # srcB verbatim-contains srcA's core doc
        (3, b, "srcC"),          # srcC shares nothing
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        f"{sf}/documents.parquet"
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in REGISTRY["source_overlap_matrix"].spark(spark, sf).collect()
    }
    ab = rows[("srcA", "srcB")]
    assert ab["containment"] == 1.0      # srcB subset of srcA's n-grams
    assert 0 < ab["jaccard"] < 1.0
    assert ("srcA", "srcC") not in rows and ("srcB", "srcC") not in rows


def test_quality_classifier_planted_labels(spark):
    """The linear scorer must separate planted extremes: a doc of
    positive-weight tokens keeps, a doc of negative-weight tokens
    drops, and the integer decision matches the sign of the replayed
    dot product."""
    from datapipeline_spike_spark.plans.catalog_extensions import (
        _QC_BIAS,
        _QC_WEIGHTS,
        quality_classifier_score,
    )

    good = "the data query join table stream " * 10
    bad = "slow batch big small hash " * 10
    mixed = "the slow data batch unknownword " * 10
    docs = spark.createDataFrame(
        [(0, good), (1, bad), (2, mixed)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_classifier_score(docs).collect()}
    assert rows[0]["keep"] is True and rows[0]["quality_score"] > 0.5
    assert rows[1]["keep"] is False and rows[1]["quality_score"] < 0.5
    # replay z for the mixed doc by hand
    toks = mixed.split()
    n = len(toks)
    z = _QC_BIAS * n + sum(
        w * toks.count(t) for t, w in _QC_WEIGHTS.items()
    )
    assert rows[2]["z_micro"] == z
    assert rows[2]["keep"] == (z > 0)


def test_dsir_importance_weights_rank_target_like_raw_docs_first(spark):
    """DSIR's whole point (Xie et al. 2023): among the RAW (non-target)
    docs, the ones written in the target's vocabulary must receive the
    highest log importance weights — they are what importance
    resampling would keep — and raw docs in the raw vocabulary must
    score below them."""
    from datapipeline_spike_spark.plans.catalog_extensions import (
        dsir_importance_weights,
    )

    target_text = "alpha beta gamma delta " * 8
    raw_text = "zeta eta theta omega " * 8
    rows = (
        # target corpus (lang=en): defines the target distribution
        [(i, "en", target_text) for i in range(20)]
        # raw corpus: mostly raw-vocab...
        + [(100 + i, "de", raw_text) for i in range(20)]
        # ...with two planted target-like raw docs
        + [(200, "de", target_text), (201, "de", target_text)]
    )
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {r["doc_id"]: r["log_weight"] for r in dsir_importance_weights(d).collect()}
    planted = {w[200], w[201]}
    raw_vocab = {w[100 + i] for i in range(20)}
    assert min(planted) > max(raw_vocab)
    # planted docs share the target text, so they tie with the target
    # docs themselves — and the weight separation is strictly positive
    assert w[200] == w[0]
    assert min(planted) > 0 > max(raw_vocab)


def test_encoding_quality_planted_counts(spark):
    from datapipeline_spike_spark.operators.quality import (
        encoding_quality_columns,
    )

    rows = [
        (1, "clean ascii text."),
        (2, "bad � twice � here"),
        (3, "ctrl\x07 and\x1f del\x7f but \t\n\r fine"),
        (4, "zero​width‌ and﻿ bom"),
        (5, "left &amp; &#x27; &mdash; over &notanentity"),
        (6, "mojibake cafÃ© â€” dash Â here"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in encoding_quality_columns(df).collect()
    }
    # full input schema preserved plus the profile columns
    assert {"doc_id", "text"} <= set(out[1].asDict())
    assert out[1]["encoding_ok"] and out[1]["bad_char_ratio"] == 0.0
    assert out[2]["n_replacement"] == 2 and not out[2]["encoding_ok"]
    assert out[3]["n_control"] == 3 and not out[3]["encoding_ok"]
    assert out[4]["n_zero_width"] == 3 and not out[4]["encoding_ok"]
    # entities alone don't flip the verdict (recoverable residue)
    assert out[5]["n_entity"] == 3 and out[5]["encoding_ok"]
    assert out[6]["n_mojibake"] == 3 and not out[6]["encoding_ok"]
    assert out[7]["encoding_ok"] and out[7]["bad_char_ratio"] == 0.0
