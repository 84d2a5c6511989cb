"""r10 staged corpus-statistics operators (register r11): DuckDB
differential tests + planted-property checks for zipf_profile,
ngram_novelty_profile, and kneser_ney_bigram_score — the same
pre-registration gauntlet the r8 staged ops ran before their r9
registration (oracle parity proven HERE, so registration is a
catalog-entry move, not new verification surface)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.text_stats import (
    kneser_ney_bigram_score,
    ngram_novelty_profile,
    zipf_profile,
)
from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),"
    " t -> t != '')"
)

# the engine's deterministic md5 [0,1) draw (operators/sampling.hash_u01)
_SQL_U01_DOC = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return con


def test_zipf_profile_matches_duckdb(spark):
    got = zipf_profile(load(spark, SF, "documents")).collect()[0].asDict()
    want = _con().execute(
        f"""
        WITH toks AS (
          SELECT unnest({_SQL_TOKS}) AS tok FROM documents
        ),
        counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        totals AS (
          SELECT count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens
          FROM counts
        ),
        top AS (
          SELECT ln(rank) AS x, ln(c) AS y FROM (
            SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
            FROM counts ORDER BY c DESC, tok LIMIT 1000
          )
        ),
        fit AS (
          SELECT count(*) AS n_fit, sum(x) AS sx, sum(y) AS sy,
                 sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
          FROM top
        )
        SELECT n_types, n_tokens, n_fit,
               round((n_fit*sxy - sx*sy) / (n_fit*sxx - sx*sx), 6) AS slope,
               round((sy - ((n_fit*sxy - sx*sy) / (n_fit*sxx - sx*sx)) * sx)
                     / n_fit, 6) AS intercept,
               round(((n_fit*sxy - sx*sy) * (n_fit*sxy - sx*sy))
                     / ((n_fit*sxx - sx*sx) * (n_fit*syy - sy*sy)), 6) AS r2
        FROM fit CROSS JOIN totals
        """
    ).df().iloc[0].to_dict()
    assert got["n_types"] == want["n_types"]
    assert got["n_tokens"] == int(want["n_tokens"])
    assert got["n_fit"] == want["n_fit"]
    for c in ("slope", "intercept", "r2"):
        assert got[c] == pytest.approx(want[c], abs=2e-6), c
    # sanity on the synthetic corpus: counts decrease with rank (slope
    # negative) and the fit is a valid correlation. The near -1
    # natural-language slope is asserted on the PLANTED Zipfian corpus
    # below — the driver's synthetic token distribution is deliberately
    # flat (slope here ~ -0.18), which is exactly the signal this
    # profile exists to surface.
    assert got["slope"] < 0
    assert 0.0 < got["r2"] <= 1.0


def test_zipf_profile_planted_distribution(spark):
    """An exactly Zipfian corpus (count(rank r) = N//r) must fit slope
    ~ -1 with near-perfect r2."""
    rows = []
    for r in range(1, 51):
        rows.extend([(f"w{r:03d}",)] * (2000 // r))
    docs = spark.createDataFrame(rows, "text string").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    prof = zipf_profile(docs, top_n=50).collect()[0]
    assert prof["slope"] == pytest.approx(-1.0, abs=0.05)
    assert prof["r2"] > 0.999


def test_ngram_novelty_matches_duckdb(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_novelty_profile(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(
        f"""
        WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
        grams AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) - 1),
                          i -> array_to_string(t[i:i+2], ' '))) AS g
            FROM toks WHERE len(t) >= 3
          )
        ),
        dfc AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
        per_doc AS (
          SELECT doc_id, count(*) AS n_distinct_ngrams,
                 CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel
          FROM grams JOIN dfc USING (g) GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_distinct_ngrams, 0) AS n_distinct_ngrams,
               coalesce(p.n_novel, 0) AS n_novel,
               round(p.n_novel * 1.0 / p.n_distinct_ngrams, 6) AS novelty
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_distinct_ngrams"] == w["n_distinct_ngrams"], w["doc_id"]
        assert g["n_novel"] == int(w["n_novel"]), w["doc_id"]
        if g["novelty"] is None:
            assert w["n_distinct_ngrams"] == 0
        else:
            assert g["novelty"] == pytest.approx(w["novelty"], abs=2e-6)


def test_ngram_novelty_planted_duplicate_pair(spark):
    """Two identical docs share every gram (novelty 0); a unique doc
    scores 1; a doc below the gram threshold yields the NULL row."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "completely different words entirely here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty_profile(docs).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0
    assert out[4]["n_distinct_ngrams"] == 0 and out[4]["novelty"] is None


def test_kneser_ney_matches_duckdb(spark):
    got = {
        r["doc_id"]: r.asDict()
        for r in kneser_ney_bigram_score(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(
        f"""
        WITH toks AS (
          SELECT doc_id, {_SQL_TOKS} AS t FROM documents
        ),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t)),
                        i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS s
          FROM toks WHERE len(t) >= 2
        ),
        doc_bg AS (
          SELECT doc_id, s.w1 AS w1, s.w2 AS w2, count(*) AS n
          FROM bg GROUP BY 1, 2, 3
        ),
        corpus_bg AS (SELECT w1, w2, sum(n) AS c FROM doc_bg GROUP BY 1, 2),
        ctx AS (SELECT w1, sum(c) AS ctx, count(*) AS fanout
                FROM corpus_bg GROUP BY 1),
        cont AS (SELECT w2, count(*) AS cont FROM corpus_bg GROUP BY 1),
        types AS (SELECT count(*) AS T FROM corpus_bg)
        SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
               round(sum(n * ln(
                 greatest(c - 0.75, 0.0) / ctx
                 + ((0.75 * fanout) / ctx) * (cont * 1.0 / T)
               )) / sum(n), 6) AS avg_logprob_kn
        FROM doc_bg
        JOIN corpus_bg USING (w1, w2)
        JOIN ctx USING (w1)
        JOIN cont USING (w2)
        CROSS JOIN types
        GROUP BY doc_id
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_bigrams"] == int(w["n_bigrams"]), w["doc_id"]
        assert g["avg_logprob_kn"] == pytest.approx(
            w["avg_logprob_kn"], abs=2e-6
        ), w["doc_id"]


def test_kneser_ney_ranks_fluent_above_scrambled(spark):
    """The word-order property the smoothing must preserve: a document
    reusing the corpus's COMMON TRANSITIONS outscores one built from
    the same vocabulary with scrambled transitions."""
    base = "the quick brown fox jumps over the lazy dog"
    corpus = [(i, base) for i in range(20)]
    corpus.append((100, base))  # fluent: transitions seen 21x
    corpus.append((101, "dog the over fox brown lazy jumps quick the"))
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_logprob_kn"] for r in
           kneser_ney_bigram_score(docs).collect()}
    assert out[100] > out[101]


def test_verdict_agreement_matrix_matches_duckdb(spark):
    """Agreement matrix vs a DuckDB replay on planted verdicts over the
    documents table (filters: quality floor, length floor, digit-free),
    including a NULL-abstain column and the kappa formula."""
    from datapipeline_spike_spark.operators.text_stats import (
        verdict_agreement_matrix,
    )

    docs = load(spark, SF, "documents")
    verdicts = docs.select(
        (F.length("text") >= 200).alias("len_ok"),
        (F.size(F.split(F.lower("text"), "[^a-z0-9']+")) >= 40).alias("tok_ok"),
        F.when(F.col("n_chars") % 7 != 0, F.col("n_chars") % 2 == 0).alias(
            "parity"  # abstains (NULL) on every 7th doc
        ),
    )
    got = {
        (r["filter_a"], r["filter_b"]): r.asDict()
        for r in verdict_agreement_matrix(
            verdicts, ["len_ok", "tok_ok", "parity"]
        ).collect()
    }
    assert set(got) == {("len_ok", "tok_ok"), ("len_ok", "parity"), ("tok_ok", "parity")}
    want = _con().execute(
        """
        WITH v AS (
          SELECT length(text) >= 200 AS len_ok,
                 len(list_filter(regexp_split_to_array(lower(text),
                     '[^a-z0-9'']+'), t -> t != '')) >= 40 AS tok_ok,
                 CASE WHEN n_chars % 7 != 0 THEN n_chars % 2 = 0 END AS parity
          FROM documents
        )
        SELECT
          sum(CASE WHEN NOT len_ok AND NOT tok_ok THEN 1 ELSE 0 END) AS n_00,
          sum(CASE WHEN NOT len_ok AND tok_ok THEN 1 ELSE 0 END)     AS n_01,
          sum(CASE WHEN len_ok AND NOT tok_ok THEN 1 ELSE 0 END)     AS n_10,
          sum(CASE WHEN len_ok AND tok_ok THEN 1 ELSE 0 END)         AS n_11,
          sum(CASE WHEN parity IS NOT NULL AND NOT len_ok AND NOT parity
              THEN 1 ELSE 0 END) AS p_00,
          sum(CASE WHEN parity IS NOT NULL AND NOT len_ok AND parity
              THEN 1 ELSE 0 END) AS p_01,
          sum(CASE WHEN parity IS NOT NULL AND len_ok AND NOT parity
              THEN 1 ELSE 0 END) AS p_10,
          sum(CASE WHEN parity IS NOT NULL AND len_ok AND parity
              THEN 1 ELSE 0 END) AS p_11
        FROM v
        """
    ).df().iloc[0]
    lt = got[("len_ok", "tok_ok")]
    assert (lt["n_00"], lt["n_01"], lt["n_10"], lt["n_11"]) == (
        int(want["n_00"]), int(want["n_01"]), int(want["n_10"]), int(want["n_11"])
    )
    lp = got[("len_ok", "parity")]
    assert (lp["n_00"], lp["n_01"], lp["n_10"], lp["n_11"]) == (
        int(want["p_00"]), int(want["p_01"]), int(want["p_10"]), int(want["p_11"])
    )
    # kappa replay in python from the counts (same formula)
    for key in got:
        g = got[key]
        n00, n01, n10, n11 = g["n_00"], g["n_01"], g["n_10"], g["n_11"]
        n = n00 + n01 + n10 + n11
        po = (n00 + n11) / n
        pe = ((n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)) / (n * n)
        assert g["agreement"] == pytest.approx(po, abs=1e-6)
        if pe < 1.0:
            assert g["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


def test_verdict_agreement_matrix_kappa_extremes(spark):
    """Planted extremes: identical verdicts -> kappa 1; independent
    50/50 verdicts -> kappa ~0; one constant filter -> kappa 0 (no
    agreement beyond chance, pe = 0.5); BOTH constant -> kappa NULL
    (pe = 1, the undefined case)."""
    from datapipeline_spike_spark.operators.text_stats import (
        verdict_agreement_matrix,
    )

    df = spark.range(400).select(
        (F.col("id") % 2 == 0).alias("a"),
        (F.col("id") % 2 == 0).alias("a_copy"),
        ((F.col("id") % 4) < 2).alias("b"),   # independent of a
        F.lit(True).alias("always"),
        F.lit(True).alias("always2"),
    )
    got = {
        (r["filter_a"], r["filter_b"]): r
        for r in verdict_agreement_matrix(
            df, ["a", "a_copy", "b", "always", "always2"]
        ).collect()
    }
    assert got[("a", "a_copy")]["kappa"] == 1.0
    assert abs(got[("a", "b")]["kappa"]) < 0.05
    assert got[("a", "always")]["kappa"] == 0.0  # one constant: pe = 0.5
    assert got[("always", "always2")]["kappa"] is None  # both constant: pe = 1
    assert got[("always", "always2")]["agreement"] == 1.0


def test_zipf_profile_degenerate_corpora(spark):
    """< 2 distinct tokens leaves the OLS undefined: NULL fit, real
    counts; an empty corpus yields the all-zero/NULL row instead of a
    crash."""
    one_word = spark.createDataFrame(
        [(1, "spam spam spam"), (2, "spam")], "doc_id long, text string"
    )
    r = zipf_profile(one_word).collect()[0]
    assert r["n_types"] == 1 and r["n_tokens"] == 4 and r["n_fit"] == 1
    assert r["slope"] is None and r["r2"] is None
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = zipf_profile(empty).collect()[0]
    assert r["n_fit"] == 0 and r["slope"] is None


def test_dedup_span_removal_matches_duckdb(spark):
    """Corpus-internal duplicate-span scrubbing vs a full DuckDB replay
    on a PLANTED paged corpus (the curation planting precedent: shared
    header on every doc, shared footer per language) — the synthetic
    documents rarely share natural k-grams, so the planting makes the
    cross-doc span machinery do real work."""
    from datapipeline_spike_spark.operators.dedup import dedup_span_removal

    d = load(spark, SF, "documents")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("shared preamble sentence for every document here now "),
            F.col("text"),
            F.lit(" closing notice for language "),
            F.col("lang"),
            F.lit(" end of record marker words"),
        ).alias("text"),
    )
    k = 6
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_span_removal(pages, k=k).collect()
    }
    want = _con().execute(
        f"""
        WITH pages AS (
          SELECT doc_id,
                 'shared preamble sentence for every document here now '
                 || text || ' closing notice for language ' || lang
                 || ' end of record marker words' AS text
          FROM documents
        ),
        t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM pages),
        pos0 AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks) - {k} + 2),
                 i -> {{'pos': i - 1,
                        'ng': array_to_string(toks[i:i+{k - 1}], ' ')}})) AS s
          FROM t WHERE len(toks) >= {k}
        ),
        stats AS (
          SELECT s.ng AS ng, count(DISTINCT doc_id) AS df,
                 min(doc_id) AS canon
          FROM pos0 GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        ),
        hits AS (
          SELECT doc_id, s.pos AS pos
          FROM pos0 JOIN stats ON s.ng = stats.ng
          WHERE doc_id != stats.canon
        ),
        cov AS (
          SELECT DISTINCT doc_id, c.cp AS cp
          FROM (SELECT doc_id,
                       unnest(list_transform(range(0, {k}), d -> pos + d)) AS cp
                FROM hits) AS c(doc_id, cp)
        ),
        agg AS (
          SELECT cov.doc_id, count(*) AS n_removed,
                 (SELECT count(DISTINCT pos) FROM hits h
                  WHERE h.doc_id = cov.doc_id) AS n_flagged
          FROM cov GROUP BY 1
        )
        SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(agg.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(coalesce(agg.n_flagged, 0) AS BIGINT) AS n_flagged_ngrams,
               CASE WHEN len(toks) = 0 THEN 1.0
                    ELSE round((len(toks) - coalesce(agg.n_removed, 0)) * 1.0
                               / len(toks), 6) END AS retained_ratio
        FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
        """
    ).df()
    assert len(got) == len(want)
    n_scrubbed = 0
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_tokens"] == int(w["n_tokens"]), w["doc_id"]
        assert g["n_removed"] == int(w["n_removed"]), w["doc_id"]
        assert g["n_flagged_ngrams"] == int(w["n_flagged_ngrams"]), w["doc_id"]
        assert g["retained_ratio"] == pytest.approx(w["retained_ratio"], abs=2e-6)
        n_scrubbed += int(g["n_removed"] > 0)
    # the planted header/footer must actually trigger cross-doc removal
    assert n_scrubbed >= len(want) - 1  # all but the canonical doc(s)


def test_dedup_span_removal_keep_first_policy(spark):
    """Planted semantics: doc 1 and doc 2 share an 8-token license
    block inside otherwise unique text; the block survives ONLY in the
    canonical (lower-id) doc, and a fully unique doc loses nothing."""
    from datapipeline_spike_spark.operators.dedup import dedup_span_removal

    block = "this standard license block text is identical everywhere"
    docs = spark.createDataFrame(
        [
            (1, f"alpha unique opening words {block} alpha closing run"),
            (2, f"beta different starting phrase {block} beta ending part"),
            (3, "gamma totally original content with no shared spans at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_span_removal(docs, k=8).collect()}
    assert out[1]["n_removed"] == 0        # canonical keeps its copy
    assert out[2]["n_removed"] > 0         # duplicate span scrubbed
    assert out[3]["n_removed"] == 0        # unique doc untouched
    assert out[2]["retained_ratio"] < 1.0 == out[1]["retained_ratio"]


def test_temperature_mixture_matches_duckdb(spark):
    """Temperature mixture plan vs a full DuckDB replay on the
    documents table at tau=0.5, budget 30%, epoch cap 4."""
    from datapipeline_spike_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    d = load(spark, SF, "documents").select(
        "doc_id",
        "lang",
        F.size(F.array_remove(F.split(F.lower("text"), "[^a-z0-9']+"), "")).alias("tk"),
    )
    got = {
        r["lang"]: r.asDict()
        for r in temperature_mixture_plan(
            d, budget_frac=0.3, tau=0.5, max_epochs=4.0
        ).collect()
    }
    want = _con().execute(
        f"""
        WITH d AS (
          SELECT doc_id, lang, len({_SQL_TOKS}) AS tk FROM documents
        ),
        by_g AS (
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(tk) AS BIGINT) AS n_tokens
          FROM d GROUP BY 1
        ),
        w AS (SELECT *, exp(0.5 * ln(CAST(n_tokens AS DOUBLE))) AS pw FROM by_g),
        tot AS (SELECT sum(pw) AS wsum,
                       CAST(sum(n_tokens) AS BIGINT) AS total FROM w),
        plan AS (
          SELECT lang, n_docs, n_tokens,
                 round(pw / wsum, 6) AS p,
                 round(0.3 * (pw / wsum) * total, 2) AS target_tokens,
                 round(least(4.0, (0.3 * (pw / wsum) * total) / n_tokens), 6)
                   AS epochs
          FROM w, tot
        ),
        kept AS (
          SELECT lang, count(*) AS n_kept_docs,
                 CAST(sum(tk) AS BIGINT) AS kept_tokens
          FROM d JOIN plan USING (lang)
          WHERE {_SQL_U01_DOC} < least(1.0, epochs)
          GROUP BY 1
        )
        SELECT plan.lang, n_docs, n_tokens, p, target_tokens, epochs,
               round(least(1.0, epochs), 6) AS sampling_rate,
               coalesce(n_kept_docs, 0) AS n_kept_docs,
               coalesce(kept_tokens, 0) AS kept_tokens
        FROM plan LEFT JOIN kept USING (lang)
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["lang"]]
        for c in ("n_docs", "n_tokens", "n_kept_docs", "kept_tokens"):
            assert g[c] == int(w[c]), (w["lang"], c)
        for c in ("p", "target_tokens", "epochs", "sampling_rate"):
            assert g[c] == pytest.approx(w[c], abs=2e-6), (w["lang"], c)


def test_temperature_mixture_tau_properties(spark):
    """Planted tau semantics on a skewed 2-group corpus (90/10 token
    split): tau=1 reproduces proportional shares; tau=0 splits the
    budget uniformly; tau=0.5 sits strictly between; the epoch cap
    binds when a tiny group's target exceeds cap x its size."""
    from datapipeline_spike_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    rows = [(i, "big", 90) for i in range(100)] + [
        (1000 + i, "small", 10) for i in range(100)
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, tk long")

    def shares(tau, cap=100.0):
        out = {
            r["lang"]: r
            for r in temperature_mixture_plan(
                d, budget_frac=0.5, tau=tau, max_epochs=cap
            ).collect()
        }
        return out

    p1 = shares(1.0)
    assert p1["big"]["p"] == pytest.approx(0.9, abs=1e-6)
    p0 = shares(0.0)
    assert p0["big"]["p"] == pytest.approx(0.5, abs=1e-6)
    ph = shares(0.5)
    assert 0.5 < ph["big"]["p"] < 0.9
    # cap: small group's uncapped epochs at tau=0 would be
    # 0.5 * 0.5 * 10000 / 1000 = 2.5 -> a cap of 2 binds
    capped = shares(0.0, cap=2.0)
    assert capped["small"]["epochs"] == 2.0
