"""r17 staged operators, WAVE 8 (register r18 — the r18 head budget is
the fully-documented 50-name queue, so these register by sliding queue
tails per the budget rule, or ride r19): DuckDB differential tests +
planted-property checks + plan pins for hits_hub_authority (Kleinberg
1999 — the hub/authority split PageRank conflates),
knn_graph_edges (the corpus-wide kNN-graph table SemDeDup/NN-Descent
curation stages consume), and min_k_prob_profile (Shi 2023 Min-K% Prob
membership signal under the corpus unigram LM) — the same
pre-registration gauntlet every staged cohort runs (oracle parity
proven HERE, so registration is a catalog-entry move).

Registration notes (measured on these staged plans at sf0.001):
- hits_hub_authority: BNLJ x(2K+1) — the 1-row vertex-count cross +
  per-half-step L1-total crosses (the pagerank BNLJ_OK precedent) ->
  BNLJ_OK at registration; intermediate iterations ExistingRDD-
  barriered.
- knn_graph_edges: BNLJ x1 — the auto-plane 1-row corpus-count cross
  (hard_negative_pairs precedent) -> BNLJ_OK; rank window PARTITIONED.
- min_k_prob_profile: BNLJ x1 — the 1-row smoothing-totals cross
  (unigram_logprob_score precedent) -> BNLJ_OK; both windows
  PARTITIONED by document.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9'']+'),"
    " t -> t != '')"
)


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# --- hits_hub_authority ---------------------------------------------------------

# the deterministic host link graph, shared with the registered
# pagerank oracle (single source: plans/catalog_r16)
from datapipeline_spike_spark.plans.catalog_r16 import _SQL_PR_GRAPH  # noqa: E402


def _sql_hits_iter(k: int) -> str:
    """h0 -> h{k}/a{k} WITH-chain layers replaying
    operators.graph.hits_hub_authority: per iteration one in-edge
    aggregate + L1 normalization (authority), then one out-edge
    aggregate + L1 normalization (hub)."""
    parts = ["h0 AS (SELECT host, 1.0 / nn.n AS h FROM b, nn)"]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"ar{i} AS (SELECT e.dst AS host, sum(h.h) AS x "
            f"FROM e JOIN h{p} h ON e.src = h.host GROUP BY 1)"
        )
        parts.append(
            f"as{i} AS (SELECT coalesce(sum(x), 0) AS s FROM ar{i})"
        )
        parts.append(
            f"a{i} AS (SELECT b.host, CASE WHEN s.s > 0 "
            f"THEN coalesce(ar.x, 0) / s.s ELSE 0 END AS a "
            f"FROM b LEFT JOIN ar{i} ar USING (host), as{i} s)"
        )
        parts.append(
            f"hr{i} AS (SELECT e.src AS host, sum(a.a) AS x "
            f"FROM e JOIN a{i} a ON e.dst = a.host GROUP BY 1)"
        )
        parts.append(
            f"hs{i} AS (SELECT coalesce(sum(x), 0) AS s FROM hr{i})"
        )
        parts.append(
            f"h{i} AS (SELECT b.host, CASE WHEN s.s > 0 "
            f"THEN coalesce(hr.x, 0) / s.s ELSE 0 END AS h "
            f"FROM b LEFT JOIN hr{i} hr USING (host), hs{i} s)"
        )
    return ",\n".join(parts)


SQL_HITS = f"""
    WITH {_SQL_PR_GRAPH},
    {_sql_hits_iter(3)}
    SELECT b.host, round(h3.h, 6) AS hub, round(a3.a, 6) AS authority,
           CAST(b.outd AS BIGINT) AS out_degree,
           CAST(b.ind AS BIGINT) AS in_degree
    FROM b JOIN h3 USING (host) JOIN a3 USING (host)
"""


def test_hits_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.graph import (
        hits_hub_authority,
        host_link_graph,
    )

    got = {
        r["host"]: r.asDict()
        for r in hits_hub_authority(
            host_link_graph(load(spark, SF, "documents"))
        ).collect()
    }
    want = _con().execute(SQL_HITS).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["host"]]
        assert g["out_degree"] == int(w["out_degree"])
        assert g["in_degree"] == int(w["in_degree"])
        assert g["hub"] == pytest.approx(w["hub"], abs=1.5e-6)
        assert g["authority"] == pytest.approx(w["authority"], abs=1.5e-6)


def test_hits_literal_graph_vs_reference(spark):
    """Pure-Python HITS replay (L1-normalized half-steps, 3
    iterations) on a hub-and-spokes graph: the pure hub holds ALL the
    hub mass and zero authority; the spokes split the authority; both
    scores L1-sum to 1."""
    from datapipeline_spike_spark.operators.graph import hits_hub_authority

    edges = [(0, 1), (0, 2), (0, 3), (4, 1)]  # 0 = hub, 1 = best authority
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["host"]: r for r in hits_hub_authority(df).collect()}

    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    h = {v: 1.0 / n for v in verts}
    a = {}
    for _ in range(3):
        raw_a = {v: 0.0 for v in verts}
        for u, v in edges:
            raw_a[v] += h[u]
        s = sum(raw_a.values())
        a = {v: (raw_a[v] / s if s > 0 else 0.0) for v in verts}
        raw_h = {v: 0.0 for v in verts}
        for u, v in edges:
            raw_h[u] += a[v]
        s = sum(raw_h.values())
        h = {v: (raw_h[v] / s if s > 0 else 0.0) for v in verts}

    assert set(got) == set(verts)
    for v in verts:
        assert got[v]["hub"] == pytest.approx(round(h[v], 6), abs=1.5e-6)
        assert got[v]["authority"] == pytest.approx(
            round(a[v], 6), abs=1.5e-6
        )
    # the structural split: node 0 never receives a link -> authority 0;
    # nodes 1-3 never emit one -> hub 0; node 1 out-authorities 2/3
    assert got[0]["authority"] == 0.0 and got[0]["hub"] > 0.5
    assert got[1]["hub"] == 0.0
    assert got[1]["authority"] > got[2]["authority"]
    assert sum(r["hub"] for r in got.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(r["authority"] for r in got.values()) == pytest.approx(
        1.0, abs=1e-4
    )


# --- knn_graph_edges -------------------------------------------------------------

from datapipeline_spike_spark.plans.catalog_r9 import (  # noqa: E402
    _AUTO_MAX_PLANES,
    _AUTO_MIN_PLANES,
    _AUTO_TARGET_BUCKET,
    _SQL_BUCKET16,
)

SQL_KNN_GRAPH = f"""
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
      SELECT a.vec_id AS src_id, c.vec_id AS dst_id,
             round(list_cosine_similarity(a.ev, c.ev), 6) AS cos_sim
      FROM v a JOIN v c USING (bucket)
      WHERE a.vec_id != c.vec_id
    ),
    edges AS (
      SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                     ORDER BY cos_sim DESC, dst_id) AS rank FROM scored)
      WHERE rank <= 5
    )
    SELECT e.src_id, e.dst_id, e.cos_sim, CAST(e.rank AS INT) AS rank,
           (r.src_id IS NOT NULL) AS is_mutual
    FROM edges e LEFT JOIN edges r
      ON r.src_id = e.dst_id AND r.dst_id = e.src_id
"""


def test_knn_graph_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import (
        knn_graph_edges,
    )

    got = {
        (r["src_id"], r["rank"]): r.asDict()
        for r in knn_graph_edges(
            load(spark, SF, "embeddings"), dim=64, k=5
        ).collect()
    }
    want = _con().execute(SQL_KNN_GRAPH).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["src_id"], w["rank"])]
        assert g["dst_id"] == w["dst_id"]
        assert g["cos_sim"] == pytest.approx(w["cos_sim"], abs=1.5e-6)
        assert g["is_mutual"] == bool(w["is_mutual"])


def test_knn_graph_planted_clusters(spark):
    """Scaled copies of a vector share every hyperplane sign (same
    bucket) and cosine exactly 1.0 — each cluster member's top
    neighbors are its cluster-mates with is_mutual=True; ranks are
    contiguous from 1."""
    from datapipeline_spike_spark.operators.similarity import (
        knn_graph_edges,
    )

    base_a = [1.0 if d % 3 == 0 else -0.5 for d in range(64)]
    base_b = [-1.0 if d % 5 == 0 else 0.75 for d in range(64)]
    rows = []
    for i, scale in enumerate((1.0, 2.0, 3.0)):
        rows.append((i, [x * scale for x in base_a]))
        rows.append((10 + i, [x * scale for x in base_b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn_graph_edges(df, dim=64, k=2).collect()
    by_src: dict[int, list] = {}
    for r in got:
        by_src.setdefault(r["src_id"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rank"])
        assert [x["rank"] for x in rs] == list(range(1, len(rs) + 1))
        mates = {x["dst_id"] for x in rs if x["cos_sim"] == 1.0}
        want_mates = (
            {i for i in (0, 1, 2) if i != src}
            if src < 10
            else {i for i in (10, 11, 12) if i != src}
        )
        assert mates == want_mates, src
        assert all(x["is_mutual"] for x in rs if x["cos_sim"] == 1.0)


# --- min_k_prob_profile -----------------------------------------------------------

SQL_MIN_K = f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKS.format(c='text')} AS toks
               FROM documents),
    ex AS (
      SELECT doc_id, u.pos AS pos, u.tok AS tok
      FROM (SELECT doc_id, unnest(list_transform(toks,
              (x, i) -> {{'pos': i - 1, 'tok': x}})) AS u FROM t)
    ),
    vocab AS (SELECT tok, count(*) AS c FROM ex GROUP BY 1),
    tot AS (SELECT sum(c) AS total, count(*) AS v FROM vocab),
    scored AS (
      SELECT ex.doc_id, ex.pos, ex.tok, vocab.c,
             ln((vocab.c + 1.0) / (tot.total + tot.v)) AS lp
      FROM ex JOIN vocab USING (tok) CROSS JOIN tot
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY c ASC, tok ASC, pos ASC) AS rnk,
             count(*) OVER (PARTITION BY doc_id) AS n
      FROM scored
    ),
    kk AS (SELECT *, greatest(1, CAST(ceil(0.2 * n) AS INT)) AS k
           FROM ranked)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(max(k) AS BIGINT) AS k_tokens,
           round(avg(lp), 6) AS avg_logprob,
           round(sum(CASE WHEN rnk <= k THEN lp END) / max(k), 6)
             AS min_k_avg_logprob
    FROM kk GROUP BY 1
"""


def test_min_k_prob_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.text_stats import (
        min_k_prob_profile,
    )

    got = {
        r["doc_id"]: r.asDict()
        for r in min_k_prob_profile(load(spark, SF, "documents")).collect()
    }
    want = _con().execute(SQL_MIN_K).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["n_tokens"] == int(w["n_tokens"])
        assert g["k_tokens"] == int(w["k_tokens"])
        assert g["avg_logprob"] == pytest.approx(w["avg_logprob"], abs=1.5e-6)
        assert g["min_k_avg_logprob"] == pytest.approx(
            w["min_k_avg_logprob"], abs=1.5e-6
        )


def test_min_k_prob_hand_corpus(spark):
    """Pure-Python replay on a literal corpus: the rare token drives
    the min-k tail; k clamps to 1 on short docs; the tail mean is
    never above the full mean."""
    import math

    from datapipeline_spike_spark.operators.text_stats import (
        min_k_prob_profile,
    )

    rows = [
        (1, "common common common rare"),
        (2, "common common"),
        (3, "common unique1 unique2 unique3 unique4 unique5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in min_k_prob_profile(df).collect()}

    counts = {"common": 6, "rare": 1, "unique1": 1, "unique2": 1,
              "unique3": 1, "unique4": 1, "unique5": 1}
    total, v = sum(counts.values()), len(counts)

    def lp(tok):
        return math.log((counts[tok] + 1.0) / (total + v))

    # doc 1: 4 tokens, k = ceil(0.8) -> 1; the single lowest is 'rare'
    assert got[1]["n_tokens"] == 4 and got[1]["k_tokens"] == 1
    assert got[1]["min_k_avg_logprob"] == pytest.approx(
        round(lp("rare"), 6), abs=1e-6
    )
    assert got[1]["avg_logprob"] == pytest.approx(
        round((3 * lp("common") + lp("rare")) / 4, 6), abs=1e-6
    )
    # doc 2: k = greatest(1, ceil(0.4)) = 1; all tokens identical ->
    # the tail mean equals the full mean
    assert got[2]["k_tokens"] == 1
    assert got[2]["min_k_avg_logprob"] == got[2]["avg_logprob"]
    # doc 3: 6 tokens, k = ceil(1.2) = 2; two singleton tokens tie on
    # count, the (count, tok, pos) order picks unique1 then unique2 —
    # but any two singletons share the same lp, so the mean is lp(u)
    assert got[3]["k_tokens"] == 2
    assert got[3]["min_k_avg_logprob"] == pytest.approx(
        round(lp("unique1"), 6), abs=1e-6
    )
    for g in got.values():
        assert g["min_k_avg_logprob"] <= g["avg_logprob"] + 1e-9


def test_min_k_prob_tail_vs_mean_on_corpus(spark):
    """On the real corpus: the bottom-k tail is strictly informative —
    min_k mean <= full mean everywhere, strictly below for docs with
    token-count diversity; k_tokens = ceil(0.2 * n) clamped to >= 1."""
    import math

    from datapipeline_spike_spark.operators.text_stats import (
        min_k_prob_profile,
    )

    rows = min_k_prob_profile(load(spark, SF, "documents")).collect()
    assert rows
    strict = 0
    for r in rows:
        assert r["k_tokens"] == max(1, math.ceil(0.2 * r["n_tokens"]))
        assert r["min_k_avg_logprob"] <= r["avg_logprob"] + 1e-9
        if r["min_k_avg_logprob"] < r["avg_logprob"] - 1e-9:
            strict += 1
    assert strict > 0


# --- plan pins ---------------------------------------------------------------------


# one home for the nontrivial plan-text parsers (review r17: a second
# copy would drift when a Spark upgrade changes node rendering)
from tests.test_r14_staging_wave2 import (  # noqa: E402
    _plan_of,
    _window_groups,
)


def test_wave8_plan_shapes(spark):
    """hits: keyed joins + 1-row broadcast crosses, ExistingRDD
    iteration barriers, no windows, no Python, no cartesian; knn:
    bucket equi-join + partitioned rank window + the auto-plane 1-row
    cross, no Python; min_k: one tokenize pass, partitioned windows
    only, the 1-row totals cross, no Python."""
    from datapipeline_spike_spark.operators.graph import (
        hits_hub_authority,
        host_link_graph,
    )
    from datapipeline_spike_spark.operators.similarity import (
        knn_graph_edges,
    )
    from datapipeline_spike_spark.operators.text_stats import (
        min_k_prob_profile,
    )

    docs = load(spark, SF, "documents")

    hits = _plan_of(hits_hub_authority(host_link_graph(docs)))
    assert "CartesianProduct" not in hits
    assert "ExistingRDD" in hits  # the iteration barriers
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "Window"):
        assert node not in hits, node

    knn = _plan_of(knn_graph_edges(load(spark, SF, "embeddings"), dim=64))
    assert "CartesianProduct" not in knn
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in knn, node
    assert all(g >= 1 for g in _window_groups(knn))

    mk = _plan_of(min_k_prob_profile(docs))
    assert "CartesianProduct" not in mk
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in mk, node
    groups = _window_groups(mk)
    assert groups and all(g >= 1 for g in groups)
