"""r11 staged operators (register r12): DuckDB differential tests +
planted-property checks for reliability_calibration_bins,
token_distribution_drift, rouge_ngram_eval, and
embedding_centroid_drift — the same pre-registration gauntlet every
staged cohort runs (oracle parity proven HERE, so registration is a
catalog-entry move, not new verification surface)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.quality import (
    reliability_calibration_bins,
)
from datapipeline_spike_spark.operators.similarity import (
    embedding_centroid_drift,
)
from datapipeline_spike_spark.operators.text_stats import (
    rouge_ngram_eval,
    token_distribution_drift,
)
from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9'']+'),"
    " t -> t != '')"
)
_SQL_U01_DOC = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    return con


# --- reliability_calibration_bins ---------------------------------------------


def test_calibration_bins_match_duckdb(spark):
    """Scores from the portable md5 [0,1) draw, labels from a length
    rule — the full bin table vs a DuckDB replay."""
    from datapipeline_spike_spark.operators.sampling import hash_u01

    docs = load(spark, SF, "documents").select(
        hash_u01("doc_id").alias("score"),
        (F.length("text") >= 200).alias("label"),
    )
    got = {
        r["bin"]: r.asDict()
        for r in reliability_calibration_bins(docs).collect()
    }
    want = _con().execute(
        f"""
        WITH v AS (
          SELECT {_SQL_U01_DOC} AS s, length(text) >= 200 AS l
          FROM documents
        ),
        b AS (
          SELECT least(9, CAST(floor(s * 10) AS INT)) AS bin,
                 count(*) AS n, sum(s) AS sum_s,
                 CAST(sum(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
          FROM v GROUP BY 1
        ),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM b)
        SELECT bin, CAST(n AS BIGINT) AS n,
               round(sum_s / n, 6) AS mean_score,
               round(n_pass * 1.0 / n, 6) AS pass_rate,
               round(abs(n_pass * 1.0 / n - sum_s / n), 6) AS abs_gap,
               round(n * 1.0 / total, 6) AS weight
        FROM b, t
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["bin"]]
        assert g["n"] == int(w["n"]), w["bin"]
        for c in ("mean_score", "pass_rate", "abs_gap", "weight"):
            assert g[c] == pytest.approx(w[c], abs=2e-6), (w["bin"], c)


def test_calibration_planted_extremes(spark):
    """A perfectly calibrated synthetic (label true with probability =
    score, realized exactly within each bin) shows ~0 gap; inverted
    labels show gap ~ |1 - 2*score|; NULL scores/labels are excluded."""
    rows = []
    # bin b holds 20 rows at score b/10 + 0.05; exactly round(20*s) pass
    for b in range(10):
        s = b / 10 + 0.05
        n_pass = round(20 * s)
        rows += [(s, i < n_pass) for i in range(20)]
    rows += [(None, True), (0.5, None)]  # abstentions
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bin"]: r for r in reliability_calibration_bins(df).collect()}
    assert set(out) == set(range(10))
    assert sum(r["n"] for r in out.values()) == 200  # abstentions excluded
    for b, r in out.items():
        assert r["abs_gap"] <= 0.051, b  # calibrated within bin grain
        assert r["weight"] == pytest.approx(0.1, abs=1e-6)
    inverted = df.select("score", (~F.col("label")).alias("label"))
    inv = {r["bin"]: r for r in reliability_calibration_bins(inverted).collect()}
    assert inv[0]["abs_gap"] > 0.8 and inv[9]["abs_gap"] > 0.8


# --- token_distribution_drift --------------------------------------------------


def test_token_drift_matches_duckdb(spark):
    got = token_distribution_drift(
        load(spark, SF, "documents"), "lang", "en", "fr"
    ).collect()[0].asDict()
    toks = _SQL_TOKS.format(c="text")
    want = _con().execute(
        f"""
        WITH toks AS (
          SELECT (lang = 'en') AS ia, unnest({toks}) AS tok
          FROM documents WHERE lang IN ('en', 'fr')
        ),
        c AS (
          SELECT tok,
                 CAST(sum(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN ia THEN 0 ELSE 1 END) AS BIGINT) AS cb
          FROM toks GROUP BY 1
        ),
        t AS (
          SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS na,
                 CAST(coalesce(sum(cb), 0) AS BIGINT) AS nb,
                 count(*) AS v,
                 CAST(coalesce(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS va,
                 CAST(coalesce(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END), 0)
                      AS BIGINT) AS vb
          FROM c
        ),
        k AS (
          SELECT
            sum(((ca + 1.0) / (na + v))
                * ln(((ca + 1.0) / (na + v)) / ((cb + 1.0) / (nb + v))))
              AS kl_ab,
            sum(((cb + 1.0) / (nb + v))
                * ln(((cb + 1.0) / (nb + v)) / ((ca + 1.0) / (na + v))))
              AS kl_ba,
            sum(((ca + 1.0) / (na + v))
                * ln(((ca + 1.0) / (na + v))
                     / ((((ca + 1.0) / (na + v)) + ((cb + 1.0) / (nb + v))) / 2.0)))
              AS kl_am,
            sum(((cb + 1.0) / (nb + v))
                * ln(((cb + 1.0) / (nb + v))
                     / ((((ca + 1.0) / (na + v)) + ((cb + 1.0) / (nb + v))) / 2.0)))
              AS kl_bm
          FROM c, t
        )
        SELECT na AS n_tokens_a, nb AS n_tokens_b, va AS vocab_a,
               vb AS vocab_b, v AS vocab_union,
               round(kl_ab, 6) AS kl_ab, round(kl_ba, 6) AS kl_ba,
               round(0.5 * kl_am + 0.5 * kl_bm, 6) AS js_divergence
        FROM t, k
        """
    ).df().iloc[0].to_dict()
    for c in ("n_tokens_a", "n_tokens_b", "vocab_a", "vocab_b", "vocab_union"):
        assert got[c] == int(want[c]), c
    for c in ("kl_ab", "kl_ba", "js_divergence"):
        assert got[c] == pytest.approx(want[c], abs=2e-6), c
    assert got["kl_ab"] > 0 and got["js_divergence"] > 0


def test_token_drift_planted_properties(spark):
    """Identical snapshots -> all divergences 0; disjoint vocabularies
    -> large and JS <= ln 2; an empty side -> NULL divergences with
    real counts."""
    same = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "alpha beta gamma")],
        "snap string, text string",
    )
    r = token_distribution_drift(same, "snap", "a", "b").collect()[0]
    assert r["kl_ab"] == 0.0 and r["kl_ba"] == 0.0 and r["js_divergence"] == 0.0
    assert r["vocab_union"] == 3 and r["n_tokens_a"] == 3
    # large enough that add-one smoothing doesn't dominate the signal
    disjoint = spark.createDataFrame(
        [("a", "alpha beta gamma delta " * 50), ("b", "epsilon zeta eta theta " * 50)],
        "snap string, text string",
    )
    r = token_distribution_drift(disjoint, "snap", "a", "b").collect()[0]
    assert r["js_divergence"] > 0.5  # near ln 2 for disjoint vocab
    import math

    assert r["js_divergence"] <= math.log(2) + 1e-9
    empty_side = spark.createDataFrame(
        [("a", "alpha beta"), ("c", "unrelated words")],
        "snap string, text string",
    )
    r = token_distribution_drift(empty_side, "snap", "a", "b").collect()[0]
    assert r["n_tokens_a"] == 2 and r["n_tokens_b"] == 0
    assert r["kl_ab"] is None and r["js_divergence"] is None


# --- rouge_ngram_eval -----------------------------------------------------------


def test_rouge_matches_duckdb(spark):
    """Planted pair construction over documents (identical / appended /
    word-reversed references by doc_id mod 3) vs a full DuckDB replay
    of the clipped-bigram overlap."""
    from datapipeline_spike_spark.functions.text import tokens

    d = load(spark, SF, "documents")
    pairs = d.select(
        F.col("doc_id").alias("pair_id"),
        F.col("text").alias("candidate"),
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat("text", F.lit(" extra appended trailer words")),
        )
        .otherwise(F.concat_ws(" ", F.reverse(tokens("text"))))
        .alias("reference"),
    )
    got = {r["pair_id"]: r.asDict() for r in rouge_ngram_eval(pairs).collect()}
    toks = _SQL_TOKS.format(c="text")
    toks_c = _SQL_TOKS.format(c="candidate")
    toks_r = _SQL_TOKS.format(c="reference")
    want = _con().execute(
        f"""
        WITH pairs AS (
          SELECT doc_id AS pair_id, text AS candidate,
                 CASE WHEN doc_id % 3 = 0 THEN text
                      WHEN doc_id % 3 = 1
                        THEN text || ' extra appended trailer words'
                      ELSE array_to_string(list_reverse({toks}), ' ')
                 END AS reference
          FROM documents
        ),
        cg AS (
          SELECT pair_id, g, count(*) AS cc FROM (
            SELECT pair_id, unnest(list_transform(range(1, len(t)),
                   i -> array_to_string(t[i:i+1], ' '))) AS g
            FROM (SELECT pair_id, {toks_c} AS t FROM pairs)
            WHERE len(t) >= 2
          ) GROUP BY 1, 2
        ),
        rg AS (
          SELECT pair_id, g, count(*) AS cr FROM (
            SELECT pair_id, unnest(list_transform(range(1, len(t)),
                   i -> array_to_string(t[i:i+1], ' '))) AS g
            FROM (SELECT pair_id, {toks_r} AS t FROM pairs)
            WHERE len(t) >= 2
          ) GROUP BY 1, 2
        ),
        j AS (
          SELECT pair_id,
                 CAST(sum(coalesce(cc, 0)) AS BIGINT) AS cand_grams,
                 CAST(sum(coalesce(cr, 0)) AS BIGINT) AS ref_grams,
                 CAST(sum(least(coalesce(cc, 0), coalesce(cr, 0))) AS BIGINT)
                   AS overlap
          FROM cg FULL JOIN rg USING (pair_id, g) GROUP BY 1
        )
        SELECT p.pair_id,
               coalesce(cand_grams, 0) AS cand_grams,
               coalesce(ref_grams, 0) AS ref_grams,
               coalesce(overlap, 0) AS overlap,
               round(overlap * 1.0 / cand_grams, 6) AS precision,
               round(overlap * 1.0 / ref_grams, 6) AS recall,
               round(CASE WHEN (overlap * 1.0 / cand_grams)
                               + (overlap * 1.0 / ref_grams) > 0
                          THEN 2.0 * (overlap * 1.0 / cand_grams)
                               * (overlap * 1.0 / ref_grams)
                               / ((overlap * 1.0 / cand_grams)
                                  + (overlap * 1.0 / ref_grams))
                          ELSE 0.0 END, 6) AS f1
        FROM pairs p LEFT JOIN j ON p.pair_id = j.pair_id
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["pair_id"]]
        for c in ("cand_grams", "ref_grams", "overlap"):
            assert g[c] == int(w[c]), (w["pair_id"], c)
        for c in ("precision", "recall", "f1"):
            if g[c] is None:
                assert w["cand_grams"] == 0 or w["ref_grams"] == 0
            else:
                assert g[c] == pytest.approx(w[c], abs=2e-6), (w["pair_id"], c)


def test_rouge_planted_semantics(spark):
    """Identity pair -> P=R=F1=1; disjoint -> 0; clipping: a candidate
    repeating one reference bigram 5x gets credit once per reference
    occurrence, not 5x; a below-threshold side -> NULLs."""
    pairs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "the quick brown fox"),
            (2, "alpha beta gamma", "delta epsilon zeta"),
            (3, "go go go go go go", "go go stop"),
            (4, "word", "a real reference text"),
        ],
        "pair_id long, candidate string, reference string",
    )
    out = {r["pair_id"]: r for r in rouge_ngram_eval(pairs).collect()}
    assert out[1]["precision"] == 1.0 == out[1]["recall"] == out[1]["f1"]
    assert out[2]["overlap"] == 0 and out[2]["f1"] == 0.0
    # candidate 'go go' x5, reference has ONE 'go go' -> clipped to 1
    assert out[3]["overlap"] == 1
    assert out[3]["precision"] == pytest.approx(1 / 5, abs=1e-6)
    assert out[4]["cand_grams"] == 0 and out[4]["precision"] is None
    assert out[4]["f1"] is None


# --- embedding_centroid_drift ----------------------------------------------------


def test_centroid_drift_matches_duckdb(spark):
    e = load(spark, SF, "embeddings").withColumn(
        "snap", (F.col("vec_id") % 2).cast("int")
    )
    got = {
        r["label"]: r.asDict()
        for r in embedding_centroid_drift(
            e, snapshot_col="snap", snapshot_a=0, snapshot_b=1
        ).collect()
    }
    want = _con().execute(
        """
        WITH e AS (
          SELECT label, (vec_id % 2 = 0) AS ia, embedding::DOUBLE[] AS ev
          FROM embeddings
        ),
        d AS (
          SELECT label, ia, s.dim AS dim, s.val AS val FROM (
            SELECT label, ia,
                   unnest(list_transform(range(1, len(ev) + 1),
                          i -> {'dim': i - 1, 'val': ev[i]})) AS s
            FROM e
          )
        ),
        pd AS (
          SELECT label, dim,
                 round(sum(CASE WHEN ia THEN val END)
                       / sum(CASE WHEN ia THEN 1 ELSE 0 END), 6) AS ma,
                 round(sum(CASE WHEN NOT ia THEN val END)
                       / sum(CASE WHEN NOT ia THEN 1 ELSE 0 END), 6) AS mb,
                 sum(CASE WHEN ia THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN NOT ia THEN 1 ELSE 0 END) AS nb
          FROM d GROUP BY 1, 2
        ),
        ag AS (
          SELECT label,
                 list(ma ORDER BY dim) AS ca, list(mb ORDER BY dim) AS cb,
                 CAST(max(na) AS BIGINT) AS n_a,
                 CAST(max(nb) AS BIGINT) AS n_b
          FROM pd GROUP BY 1
        )
        SELECT label, n_a, n_b,
               round(list_cosine_similarity(ca, cb), 6) AS centroid_cosine,
               round(sqrt(list_sum(list_transform(range(1, len(ca) + 1),
                     i -> (ca[i] - cb[i]) * (ca[i] - cb[i])))), 6)
                 AS centroid_shift_l2
        FROM ag
        """
    ).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[w["label"]]
        assert g["n_a"] == int(w["n_a"]) and g["n_b"] == int(w["n_b"])
        assert g["centroid_cosine"] == pytest.approx(
            w["centroid_cosine"], abs=2e-6
        ), w["label"]
        assert g["centroid_shift_l2"] == pytest.approx(
            w["centroid_shift_l2"], abs=2e-6
        ), w["label"]


@pytest.fixture()
def _emb_snap(spark):
    e = load(spark, SF, "embeddings")
    return e.withColumn("snap", (F.col("vec_id") % 2).cast("int"))


def test_centroid_drift_planted_properties(spark):
    """Identical snapshots -> cosine 1, shift 0; an orthogonal planted
    pair -> cosine 0; a group on one side only -> NULL geometry with
    real counts."""
    rows = [
        ("g1", 0, [1.0, 0.0]), ("g1", 1, [1.0, 0.0]),      # identical
        ("g2", 0, [2.0, 0.0]), ("g2", 1, [0.0, 3.0]),      # orthogonal
        ("g3", 0, [1.0, 1.0]),                             # a-side only
    ]
    df = spark.createDataFrame(
        rows, "label string, snap int, embedding array<double>"
    )
    out = {
        r["label"]: r
        for r in embedding_centroid_drift(
            df, "snap", 0, 1, group_col="label"
        ).collect()
    }
    assert out["g1"]["centroid_cosine"] == 1.0
    assert out["g1"]["centroid_shift_l2"] == 0.0
    assert out["g2"]["centroid_cosine"] == 0.0
    assert out["g3"]["n_a"] == 1 and out["g3"]["n_b"] == 0
    assert out["g3"]["centroid_cosine"] is None


# --- hubness_profile -------------------------------------------------------------


def test_hubness_profile_matches_duckdb(spark):
    """Approximate top-5 neighbor lists from the auto-plane LSH bucket
    join, then the k-occurrence moment profile — vs a full DuckDB
    replay (bucket assignment from the same inlined hyperplanes and
    count-derived plane number, rank on the rounded cosine, integer
    raw moments)."""
    from datapipeline_spike_spark.operators.similarity import hubness_profile
    from datapipeline_spike_spark.plans.catalog_r9 import (
        _AUTO_MAX_PLANES,
        _AUTO_MIN_PLANES,
        _AUTO_TARGET_BUCKET,
        _SQL_BUCKET16,
    )

    got = (
        hubness_profile(load(spark, SF, "embeddings"), dim=64, k=5)
        .collect()[0]
        .asDict()
    )
    want = _con().execute(
        f"""
        WITH np AS (
          SELECT least({_AUTO_MAX_PLANES}, greatest({_AUTO_MIN_PLANES},
                 CAST(ceil(log2(count(*) / {float(_AUTO_TARGET_BUCKET)}))
                      AS INT))) AS n
          FROM embeddings
        ),
        v AS (
          SELECT vec_id, embedding::DOUBLE[] AS ev,
                 ({_SQL_BUCKET16}) & ((1 << n) - 1) AS bucket
          FROM embeddings, np
        ),
        scored AS (
          SELECT a.vec_id AS anchor_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(a.ev, c.ev), 6) AS cos_sim
          FROM v a JOIN v c USING (bucket)
          WHERE a.vec_id != c.vec_id
        ),
        topk AS (
          SELECT neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY anchor_id
                      ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM scored
          ) WHERE rnk <= 5
        ),
        occ AS (
          SELECT CAST(coalesce(cnt, 0) AS BIGINT) AS nk
          FROM embeddings e LEFT JOIN (
            SELECT neighbor_id, count(*) AS cnt FROM topk GROUP BY 1
          ) t ON e.vec_id = t.neighbor_id
        ),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(nk) AS BIGINT) AS s1,
                 CAST(sum(nk * nk) AS BIGINT) AS s2,
                 CAST(sum(nk * nk * nk) AS BIGINT) AS s3,
                 CAST(max(nk) AS BIGINT) AS max_k_occ,
                 CAST(sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_orphans
          FROM occ
        )
        SELECT n AS n_vectors, n_orphans, max_k_occ,
               round(s1 * 1.0 / n, 6) AS mean_k_occ,
               CASE WHEN (s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n)) > 0
                    THEN round(
                      (s3 * 1.0 / n
                       - 3.0 * (s1 * 1.0 / n) * (s2 * 1.0 / n)
                       + 2.0 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n))
                      / ((s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n))
                         * sqrt(s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n))),
                      6)
               END AS skew_k_occ
        FROM m
        """
    ).df().iloc[0].to_dict()
    for c in ("n_vectors", "n_orphans", "max_k_occ"):
        assert got[c] == int(want[c]), c
    assert got["mean_k_occ"] == pytest.approx(want["mean_k_occ"], abs=2e-6)
    assert got["skew_k_occ"] == pytest.approx(want["skew_k_occ"], abs=2e-6)


def test_hubness_planted_hub(spark):
    """A planted hub dominates the k-occurrence distribution: vectors
    scattered near the first axis with ONE central vector everyone is
    closest to -> max_k_occ near n, heavy orphan tail, positive skew;
    a symmetric ring (everyone is someone's neighbor equally often)
    shows ~zero skew."""
    import math

    from datapipeline_spike_spark.operators.similarity import hubness_profile

    # hub construction in 64-D (n_planes=0 = exact all-pairs mode):
    # v_i = 0.9*hub + e_i on a distinct axis, so cos(v_i, hub) ~ 0.67
    # beats cos(v_i, v_j) ~ 0.45 — the hub is EVERY vector's nearest
    dim = 64
    hub = [1.0] + [0.0] * (dim - 1)
    rows = [(0, hub)]
    for i in range(1, 40):
        v = [0.9] + [0.0] * (dim - 1)
        v[i] = 1.0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    prof = hubness_profile(df, dim=dim, k=1, n_planes=0).collect()[0]
    # with k=1 and every vector's nearest being a shared central point,
    # the hub's k-occurrence dwarfs the mean and skew is large positive
    assert prof["n_vectors"] == 40
    assert prof["max_k_occ"] == 39  # everyone's top-1 is the hub
    assert prof["skew_k_occ"] > 2.0
    assert prof["n_orphans"] >= 35

    # symmetric ring in 2-D: i-th at angle 2*pi*i/n — each vector's
    # top-2 are its ring adjacents, N_k is uniform 2 -> zero variance,
    # skew NULL (the degenerate-healthy case), no orphans
    n = 32
    ring = [
        (i, [math.cos(2 * math.pi * i / n), math.sin(2 * math.pi * i / n),
             0.0, 0.0])
        for i in range(n)
    ]
    rdf = spark.createDataFrame(ring, "vec_id long, embedding array<double>")
    rprof = hubness_profile(rdf, dim=4, k=2, n_planes=0).collect()[0]
    assert rprof["n_vectors"] == n
    assert rprof["n_orphans"] == 0
    assert rprof["mean_k_occ"] == 2.0
    assert rprof["skew_k_occ"] is None or abs(rprof["skew_k_occ"]) < 1.0


# --- ivfpq_topk ------------------------------------------------------------------


def _sql_ivfpq(m=4, k_cb=8, iters=2, width=16, scale=1 << 20,
               n_centroids=16, n_probe=2, k=5) -> str:
    """Full DuckDB replay of operators.similarity.ivfpq_topk: coarse
    lowest-id centroids -> rounded-L2 argmin assignment -> residuals ->
    the SHARED fixed-point PQ Lloyd's chain (catalog_ml._sql_pq_ctes
    trained on the residual prelude) -> min_by encode -> probed ADC."""
    from datapipeline_spike_spark.plans.catalog_ml import _sql_pq_ctes

    l2 = ("list_aggregate(list_transform(range(1, len({a}) + 1), "
          "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')")
    prelude = f"""cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings
      WHERE vec_id < {n_centroids}
    ),
    ce AS (SELECT vec_id AS cvid, embedding::DOUBLE[] AS cv FROM embeddings),
    asg AS (
      SELECT cvid, cid AS list_id, cvec, cv FROM (
        SELECT ce.cvid, c.cid, c.cvec, ce.cv,
               row_number() OVER (PARTITION BY cvid
                 ORDER BY round({l2.format(a="ce.cv", b="c.cvec")}, 6), c.cid)
                 AS rnk
        FROM ce, cents c
      ) WHERE rnk = 1
    ),
    resid AS (
      SELECT cvid AS vid, list_id,
             list_transform(range(1, len(cv) + 1), i -> cv[i] - cvec[i]) AS v
      FROM asg
    ),
    """
    sql, cb = _sql_pq_ctes(
        m, k_cb, iters, width, scale,
        prelude=prelude, source="SELECT vid, v FROM resid",
    )
    enc_l2 = ("list_aggregate(list_transform(range(1, len(a.v) + 1), "
              "i -> (a.v[i] - c.cvec[i]) * (a.v[i] - c.cvec[i])), 'sum')")
    qslices = ", ".join(
        f"qrv[{s * width + 1}:{(s + 1) * width}]" for s in range(m)
    )
    subspaces = ", ".join(str(s) for s in range(m))
    return sql + f"""
    , codes AS (
      SELECT vid, s, cent_id FROM (
        SELECT a.vid, a.s, c.cent_id,
               row_number() OVER (PARTITION BY a.s, a.vid
                 ORDER BY round({enc_l2}, 6), c.cent_id) AS rnk
        FROM sub a JOIN {cb} c USING (s)
      ) WHERE rnk = 1
    ),
    codesl AS (
      SELECT codes.*, r.list_id
      FROM codes JOIN (SELECT DISTINCT vid, list_id FROM resid) r USING (vid)
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    probes AS (
      SELECT query_id, cid AS list_id,
             list_transform(range(1, len(qv) + 1), i -> qv[i] - cvec[i]) AS qrv
      FROM (
        SELECT q.query_id, c.cid, c.cvec, q.qv,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round({l2.format(a="q.qv", b="c.cvec")}, 6), c.cid)
                 AS rnk
        FROM q, cents c
      ) WHERE rnk <= {n_probe}
    ),
    qsub AS (
      SELECT query_id, list_id,
             unnest([{subspaces}]) AS s, unnest([{qslices}]) AS qsv
      FROM probes
    ),
    pair AS (
      SELECT qsub.query_id, codesl.vid AS neighbor_id,
             CAST(round(round({l2.format(a="qsub.qsv", b="cb.cvec")}, 6)
                        * 1000000) AS BIGINT) AS fp
      FROM codesl
      JOIN {cb} cb ON codesl.s = cb.s AND codesl.cent_id = cb.cent_id
      JOIN qsub ON codesl.list_id = qsub.list_id AND codesl.s = qsub.s
    ),
    adc AS (
      SELECT query_id, neighbor_id, CAST(sum(fp) AS BIGINT) AS adc_fp
      FROM pair WHERE neighbor_id != query_id GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, adc_fp, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adc_fp, neighbor_id) AS rnk FROM adc)
    WHERE rnk <= {k}
    """


def test_ivfpq_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import ivfpq_topk

    e = load(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rank"]): r.asDict()
        for r in ivfpq_topk(e, queries, dim=64)
        .select("query_id", "neighbor_id", "adc_fp",
                F.col("rank").cast("int").alias("rank"))
        .collect()
    }
    want = _con().execute(_sql_ivfpq()).df()
    assert len(got) == len(want)
    for _, w in want.iterrows():
        g = got[(w["query_id"], w["rank"])]
        assert g["neighbor_id"] == w["neighbor_id"], (w["query_id"], w["rank"])
        assert g["adc_fp"] == int(w["adc_fp"])


def test_ivfpq_planted_recovery(spark):
    """Planted semantics: two tight, well-separated clusters whose
    centroids are among the lowest-id vectors — every query's top
    neighbors come from its OWN cluster (the coarse prune + residual
    codes preserve cluster geometry), and rank 1 is its exact nearest
    in-cluster twin."""
    import random

    rng = random.Random(7)
    dim = 64

    def vec(center, jitter):
        return [center[i] + jitter * rng.uniform(-1, 1) for i in range(dim)]

    c_a = [5.0] * 32 + [0.0] * 32
    c_b = [0.0] * 32 + [-5.0] * 32
    rows = [(0, c_a), (1, c_b)]  # the coarse quantizer's seed vectors
    rows += [(10 + i, vec(c_a, 0.05)) for i in range(20)]
    rows += [(50 + i, vec(c_b, 0.05)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from datapipeline_spike_spark.operators.similarity import ivfpq_topk

    queries = df.filter(F.col("vec_id").isin([10, 50]))
    out = ivfpq_topk(df, queries, dim=dim, n_centroids=2, n_probe=1, k=5)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # cluster A query: all neighbors in cluster A ids (0, 10..29)
    assert all(n == 0 or 10 <= n < 30 for n in by_q[10]), by_q[10]
    # cluster B query: all neighbors in cluster B ids (1, 50..69)
    assert all(n == 1 or 50 <= n < 70 for n in by_q[50]), by_q[50]
    assert len(by_q[10]) == 5 and len(by_q[50]) == 5


def test_ivfpq_recall_audit_matches_duckdb(spark):
    """The registered form ivfpq takes in r12 (the pq_adc_recall_at_k
    precedent): per-query recall@5 of the IVF-PQ probe scan against the
    exact full-vector L2 top-5 — quantifying what the coarse prune +
    residual compression together cost in neighbor fidelity. The DuckDB
    side reuses the full _sql_ivfpq chain as CTEs plus the exact-side
    replay over the ORIGINAL vectors (ce in the residual prelude)."""
    from datapipeline_spike_spark.functions.vectors import l2_sq
    from datapipeline_spike_spark.operators.similarity import ivfpq_topk
    from pyspark.sql import Window

    e = load(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    approx = ivfpq_topk(e, queries, dim=64).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("fv"),
    )
    cv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cvv"),
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    exact = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(l2_sq(F.col("fv"), F.col("cvv")), 6).alias("dist"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id")
    )
    got = {
        r["query_id"]: r.asDict()
        for r in exact.join(
            approx.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("int").alias("n_hits"),
            F.round(F.count("hit") / 5.0, 6).alias("recall"),
        )
        .collect()
    }
    # oracle: the ivfpq chain with the top-k select swapped for the
    # recall join against the exact full-vector side
    chain = _sql_ivfpq()
    head, _, _tail = chain.rpartition("SELECT query_id, neighbor_id, adc_fp,")
    l2full = ("list_aggregate(list_transform(range(1, len(q.fv) + 1), "
              "i -> (q.fv[i] - ce.cv[i]) * (q.fv[i] - ce.cv[i])), 'sum')")
    sql = head + f"""
    , approx AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY adc_fp, neighbor_id) AS rnk FROM adc
      ) WHERE rnk <= 5
    ),
    qfull AS (SELECT cvid AS query_id, cv AS fv FROM ce WHERE cvid < 5),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, ce.cvid AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round({l2full}, 6), ce.cvid) AS rnk
        FROM qfull q JOIN ce ON ce.cvid != q.query_id
      ) WHERE rnk <= 5
    )
    SELECT exact.query_id,
           CAST(count(approx.neighbor_id) AS INT) AS n_hits,
           round(count(approx.neighbor_id) / 5.0, 6) AS recall
    FROM exact
    LEFT JOIN approx ON approx.query_id = exact.query_id
                    AND approx.neighbor_id = exact.neighbor_id
    GROUP BY 1
    """
    want = _con().execute(sql).df()
    assert len(got) == len(want) == 5
    for _, wrow in want.iterrows():
        g = got[wrow["query_id"]]
        assert g["n_hits"] == int(wrow["n_hits"]), wrow["query_id"]
        assert g["recall"] == pytest.approx(wrow["recall"], abs=1e-6)
    # the audit must show the index actually finds neighbors on the
    # synthetic corpus (not a vacuous all-zero recall)
    assert sum(r["n_hits"] for r in got.values()) > 0
