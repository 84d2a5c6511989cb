"""r18 staged operators, WAVE 10 (register r19/r20 per the rotation
budget): DuckDB differential tests + planted-property checks + plan
pins for nn_descent_refine (Dong 2011 NN-Descent over a multi-probe
LSH seed — the kNN-graph refinement knn_graph_edges' substrate was
built for), exact_substr_char_runs (Lee 2022's EXACT byte/char-grain
ExactSubstr — the k-gram form is registered; this one marks the
maximal corpus-duplicated character spans themselves), and
epoch_aware_domain_weights (the DoReMi multiplicative-weights loop
made iterative through Muennighoff 2023's repeated-epoch value decay
— the loss signal responds to the current allocation each round) —
the same pre-registration gauntlet every staged cohort runs (oracle
parity proven HERE, so registration is a catalog-entry move).

Registration notes (MEASURED on these staged plans at sf0.001):
- nn_descent_refine: BNLJ x8 rendered — all the SAME 1-row
  corpus-count cross for the auto plane mask (the
  knn_graph_edges/hard_negative_pairs precedent), repeated per
  InMemoryTableScan reference of the persist()ed coded frame (the
  r16 cached-plan rendering rule) -> BNLJ_OK at registration;
  CartesianProduct 0; top-k windows PARTITIONED by src_id;
  ExistingRDD barrier per refinement round; zero Python nodes.
- exact_substr_char_runs: clean audit — keyed aggregate + content
  equi-join (BHJ at toy scale, SMJ+AQE-skew at corpus scale) +
  document-PARTITIONED islands windows (x2: running max + cumsum);
  integers only, no Python, no crosses.
- epoch_aware_domain_weights: clean audit — keyed aggregate into the
  1-row assembled-array row (the doremi_domain_weights posture,
  which also carries no allowlist entry); BNLJ 0, windows 0, no
  Python.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _drain_cache(spark):
    """nn_descent_refine persist()s its coded/edge frames by design;
    three of them per test across this module holds enough shuffle
    files to exhaust the fd budget for the later DuckDB connects.
    Dogfood the r18 release mechanism between tests."""
    yield
    from datapipeline_spike_spark.cache import unpersist_all

    unpersist_all(spark)


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# --- nn_descent_refine -----------------------------------------------------------

from datapipeline_spike_spark.plans.catalog_r9 import (  # noqa: E402
    _AUTO_MAX_PLANES,
    _AUTO_MIN_PLANES,
    _AUTO_TARGET_BUCKET,
    _SQL_BUCKET16,
)
from datapipeline_spike_spark.plans.catalog_ml import (  # noqa: E402
    _sql_plane_literal,
)

# the second (probe) plane family: the same splitmix planes at seeds
# 101..116 — MUST track nn_descent_refine's probe_seed_offset=100
_SQL_BUCKET16_B = " + ".join(
    f"(CASE WHEN list_inner_product(embedding::DOUBLE[], "
    f"{_sql_plane_literal(100 + p + 1)}) >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(_AUTO_MAX_PLANES)
)

SQL_NN_DESCENT = f"""
    WITH np AS (
      SELECT least({_AUTO_MAX_PLANES}, greatest({_AUTO_MIN_PLANES},
             CAST(ceil(log2(count(*) / {float(_AUTO_TARGET_BUCKET)}))
                  AS INT))) AS n
      FROM embeddings
    ),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             ({_SQL_BUCKET16}) & ((1 << n) - 1) AS ba,
             ({_SQL_BUCKET16_B}) & ((1 << n) - 1) AS bb
      FROM embeddings, np
    ),
    c0 AS (
      SELECT a.vec_id AS src_id, c.vec_id AS dst_id,
             round(list_cosine_similarity(a.ev, c.ev), 6) AS cos_sim
      FROM v a JOIN v c ON a.ba = c.ba WHERE a.vec_id != c.vec_id
      UNION
      SELECT a.vec_id, c.vec_id,
             round(list_cosine_similarity(a.ev, c.ev), 6)
      FROM v a JOIN v c ON a.bb = c.bb WHERE a.vec_id != c.vec_id
    ),
    e0 AS (
      SELECT src_id, dst_id, cos_sim FROM
        (SELECT *, row_number() OVER (PARTITION BY src_id
                   ORDER BY cos_sim DESC, dst_id) AS rnk FROM c0)
      WHERE rnk <= 5
    ),
    und AS (SELECT src_id AS node, dst_id AS nb FROM e0
            UNION SELECT dst_id, src_id FROM e0),
    cand AS (
      SELECT DISTINCT p.nb AS src_id, q.nb AS dst_id
      FROM und p JOIN und q ON p.node = q.node WHERE p.nb != q.nb
    ),
    s1 AS (
      SELECT c.src_id, c.dst_id,
             round(list_cosine_similarity(a.ev, b.ev), 6) AS cos_sim
      FROM cand c JOIN v a ON a.vec_id = c.src_id
                  JOIN v b ON b.vec_id = c.dst_id
      UNION
      SELECT src_id, dst_id, cos_sim FROM e0
    ),
    e1 AS (
      SELECT * FROM
        (SELECT *, row_number() OVER (PARTITION BY src_id
                   ORDER BY cos_sim DESC, dst_id) AS rnk FROM s1)
      WHERE rnk <= 5
    )
    SELECT e.src_id, e.dst_id, e.cos_sim, CAST(e.rnk AS INT) AS rank,
           (r.src_id IS NOT NULL) AS is_mutual
    FROM e1 e LEFT JOIN e1 r
      ON r.src_id = e.dst_id AND r.dst_id = e.src_id
"""


def test_nn_descent_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import (
        nn_descent_refine,
    )

    got = {
        (r["src_id"], r["rank"]): r.asDict()
        for r in nn_descent_refine(
            load(spark, SF, "embeddings"), dim=64, k=5, rounds=1
        ).collect()
    }
    want = _con().execute(SQL_NN_DESCENT).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["src_id"], w["rank"])]
        assert g["dst_id"] == w["dst_id"]
        assert g["cos_sim"] == pytest.approx(w["cos_sim"], abs=1.5e-6)
        assert g["is_mutual"] == bool(w["is_mutual"])


def test_nn_descent_monotone_refinement(spark):
    """The NN-Descent contract: each vector's top-k cosine mass is
    monotone non-decreasing in rounds, and the refined graph is
    no-worse than the single-bucketing knn_graph_edges everywhere
    (the seed already contains a second probe, the round only adds)."""
    from datapipeline_spike_spark.operators.similarity import (
        knn_graph_edges,
        nn_descent_refine,
    )

    emb = load(spark, SF, "embeddings")

    def mass(df):
        return {
            r["src_id"]: r["s"]
            for r in df.groupBy("src_id")
            .agg(F.sum("cos_sim").alias("s"))
            .collect()
        }

    m0 = mass(nn_descent_refine(emb, dim=64, k=5, rounds=0))
    m1 = mass(nn_descent_refine(emb, dim=64, k=5, rounds=1))
    mk = mass(knn_graph_edges(emb, dim=64, k=5))
    assert set(m0) == set(m1) == set(mk)
    for s in m1:
        assert m1[s] >= m0[s] - 1e-9, s
        assert m1[s] >= mk[s] - 1e-9, s
    # the refinement must actually find something at this corpus size
    assert sum(1 for s in m1 if m1[s] > mk[s] + 1e-9) > len(m1) // 2


def test_nn_descent_bridges_a_bucket_split(spark):
    """The planted cross-bucket recovery: v and w are tiny
    perturbations of a common u along each family's OWN first plane —
    v flips an A-bit (invisible to bucketing A's seed pairs with u),
    w flips a B-bit. The construction is verified IN-test against the
    actual plane signs; the refined graph must hold the (v, w) edge
    with cosine ~1 even though v and w share no bucket under either
    family, because u bridges them in the local join."""
    from datapipeline_spike_spark.operators.similarity import (
        _plane,
        nn_descent_refine,
    )

    dim = 64
    pa = _plane(dim, 1)       # family A, first plane (bit 0 of ba)
    pb = _plane(dim, 101)     # family B, first plane (bit 0 of bb)

    def dot(x, y):
        return sum(a * b for a, b in zip(x, y))

    # base vector, orthogonalized against both first planes, then
    # nudged slightly POSITIVE along both (the Gram-Schmidt residual
    # sign is float noise ~1e-16; the 1e-6 nudge pins it)
    r = [1.0 if d % 7 in (0, 2) else -0.8 for d in range(dim)]
    u = list(r)
    for p in (pa, pb):
        c = dot(u, p) / dot(p, p)
        u = [ui - c * pi for ui, pi in zip(u, p)]
    u = [ui + 1e-6 * (ai + bi) for ui, ai, bi in zip(u, pa, pb)]
    # perturbation directions orthogonalized against the OTHER
    # family's plane, so each flip touches exactly one family's bit
    ca = dot(pa, pb) / dot(pb, pb)
    da = [ai - ca * bi for ai, bi in zip(pa, pb)]  # _|_ pb
    cb = dot(pb, pa) / dot(pa, pa)
    db = [bi - cb * ai for ai, bi in zip(pa, pb)]  # _|_ pa
    eps = 0.05
    v = [ui - eps * di for ui, di in zip(u, da)]   # flips A bit 0 vs u
    w = [ui - eps * di for ui, di in zip(u, db)]   # flips B bit 0 vs u
    # in-test construction check: the planted signs hold on the real
    # planes (deterministic — if it holds once it holds forever)
    assert dot(u, pa) >= 0 > dot(v, pa) and dot(w, pa) >= 0
    assert dot(u, pb) >= 0 > dot(w, pb) and dot(v, pb) >= 0
    for q in range(1, 16):   # no accidental flips on any other plane
        for fam_seed in (0, 100):
            p = _plane(dim, fam_seed + q + 1)
            assert (dot(u, p) >= 0) == (dot(v, p) >= 0) == (dot(w, p) >= 0)

    # distant filler so buckets are non-trivial and k is satisfiable
    filler = [
        (100 + i, [(-1.0 if (d + i) % 3 else 0.5) for d in range(dim)])
        for i in range(6)
    ]
    rows = [(0, u), (1, v), (2, w)] + filler
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got0 = nn_descent_refine(df, dim=dim, k=2, rounds=0).collect()
    got1 = nn_descent_refine(df, dim=dim, k=2, rounds=1).collect()
    pairs0 = {(r["src_id"], r["dst_id"]) for r in got0}
    pairs1 = {(r["src_id"], r["dst_id"]) for r in got1}
    # seed: u bridges to both (A finds u-w, B finds u-v), but v-w is
    # invisible to both bucketings...
    assert (1, 0) in pairs1 and (2, 0) in pairs1
    assert (1, 2) not in pairs0 and (2, 1) not in pairs0
    # ...until the local join over the shared neighbor u recovers it
    assert (1, 2) in pairs1 and (2, 1) in pairs1
    byk = {(r["src_id"], r["dst_id"]): r for r in got1}
    assert byk[(1, 2)]["cos_sim"] > 0.99
    assert byk[(1, 2)]["is_mutual"]


def test_nn_descent_rejects_negative_rounds(spark):
    from datapipeline_spike_spark.operators.similarity import (
        nn_descent_refine,
    )

    df = spark.createDataFrame(
        [(1, [0.1] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        nn_descent_refine(df, dim=64, rounds=-1)


# --- exact_substr_char_runs ------------------------------------------------------

SQL_CHAR_RUNS = """
    WITH w AS (
      SELECT doc_id, u AS pos, substring(text, u, 30) AS win
      FROM (SELECT doc_id, text, unnest(range(1, len(text) - 30 + 2)) AS u
            FROM documents WHERE len(text) >= 30)
    ),
    dup AS (SELECT win FROM w GROUP BY 1 HAVING count(*) >= 2),
    m AS (SELECT doc_id, pos, pos + 29 AS e FROM w JOIN dup USING (win)),
    i AS (SELECT doc_id, pos, e,
            CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id
                 ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
                 1 PRECEDING), -1) + 1 THEN 1 ELSE 0 END AS nw
          FROM m),
    r AS (SELECT doc_id, pos, e,
            sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS run
          FROM i)
    SELECT doc_id, CAST(run AS BIGINT) AS run_idx,
           CAST(min(pos) AS BIGINT) AS run_start,
           CAST(max(e) AS BIGINT) AS run_end,
           CAST(max(e) - min(pos) + 1 AS BIGINT) AS run_len
    FROM r GROUP BY doc_id, run
"""


def test_char_runs_match_duckdb(spark):
    from datapipeline_spike_spark.operators.dedup import (
        exact_substr_char_runs,
    )

    got = {
        (r["doc_id"], r["run_idx"]): r.asDict()
        for r in exact_substr_char_runs(
            load(spark, SF, "documents"), min_len=30
        ).collect()
    }
    want = _con().execute(SQL_CHAR_RUNS).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[(w["doc_id"], w["run_idx"])]
        assert g["run_start"] == int(w["run_start"])
        assert g["run_end"] == int(w["run_end"])
        assert g["run_len"] == int(w["run_len"])


def test_char_runs_planted(spark):
    """Hand corpus: a shared 44-char span surfaces at each document's
    own offset; an intra-document repeat counts (the paper's corpus
    semantics); a document with no duplicated window emits nothing;
    a shared span shorter than min_len is invisible."""
    from datapipeline_spike_spark.operators.dedup import (
        exact_substr_char_runs,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # 44 chars
    rows = [
        (1, shared + " PLUS unique tail one"),
        (2, "prefix two " + shared + " suffix two"),
        (3, "entirely different content with no overlap at all here"),
        (4, "selfrepeat " * 6),                 # intra-doc repeat
        (5, "tiny shared bit A plus unrelated padding text 1"),
        (6, "tiny shared bit B plus other padding entirely 22"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in exact_substr_char_runs(df, min_len=20).collect()
    }
    # the maximal span is shared + the following space — BOTH docs
    # continue with ' ' after "dog", so the duplicated region extends
    # one char past the planted string (exactly the maximality the
    # suffix-array form would report)
    assert got[1]["run_start"] == 1 and got[1]["run_len"] == len(shared) + 1
    assert got[2]["run_start"] == 12 and got[2]["run_len"] == len(shared) + 1
    assert 3 not in got         # no duplicated window
    assert 4 in got             # self-repeat detected
    assert 5 not in got and 6 not in got  # 17-char share < min_len


def test_char_runs_min_len_boundary(spark):
    """A shared span of exactly min_len chars is one exact-length run;
    min_len-1 shared chars produce nothing; short docs are skipped."""
    from datapipeline_spike_spark.operators.dedup import (
        exact_substr_char_runs,
    )

    exact = "0123456789abcdefghij"  # 20 chars
    rows = [
        (1, "XX" + exact + "YYYYYYYYYY"),
        (2, "QQQQ" + exact + "ZZZZZZ"),
        (3, "AA" + exact[:-1] + "WWWWWWWWWWW"),  # 19 shared chars only
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in exact_substr_char_runs(df, min_len=20).collect()
    }
    assert got[1]["run_len"] == 20 and got[1]["run_start"] == 3
    assert got[2]["run_len"] == 20 and got[2]["run_start"] == 5
    assert 3 not in got and 4 not in got
    with pytest.raises(ValueError):
        exact_substr_char_runs(df, min_len=1)


# --- epoch_aware_domain_weights ---------------------------------------------------


def _sql_epoch_iter(iters: int, budget: float, eta: float, decay: float) -> str:
    """w0 -> w{iters} CTE layers replaying
    operators.sampling.epoch_aware_domain_weights: per round the 6dp
    epoch/effective-loss re-pins, the max-shifted MW update, and the
    6dp renormalization."""
    # every layer is AS MATERIALIZED: the default CTE inlining
    # duplicates each doubly-referenced layer per reference, which is
    # 2^iters expansions of the base scan (the r7 exponential-plan
    # lesson, DuckDB edition — measured as an fd-exhaustion blowup)
    parts = [
        "per AS MATERIALIZED (SELECT source AS d, count(*) AS n,"
        " round(avg(l), 6) AS loss,"
        " CAST(sum(tk) AS DOUBLE) AS tok FROM src GROUP BY 1)",
        "dd AS MATERIALIZED (SELECT round(1.0 / count(*), 6) AS w FROM per)",
        "w0 AS MATERIALIZED (SELECT d, dd.w AS w FROM per, dd)",
    ]
    for t in range(iters):
        parts += [
            f"e{t} AS MATERIALIZED (SELECT p.d,"
            f" round(w.w * {budget!r} / p.tok, 6) AS ep"
            f" FROM per p JOIN w{t} w USING (d))",
            f"f{t} AS MATERIALIZED (SELECT p.d, round(p.loss * pow({decay!r},"
            f" greatest(e.ep - 1.0, 0.0)), 6) AS f"
            f" FROM per p JOIN e{t} e USING (d))",
            f"m{t} AS MATERIALIZED (SELECT max(f) AS mx FROM f{t})",
            f"u{t} AS MATERIALIZED (SELECT f.d,"
            f" w.w * exp({eta!r} * (f.f - m.mx)) AS u"
            f" FROM f{t} f JOIN w{t} w USING (d), m{t} m)",
            f"s{t} AS MATERIALIZED (SELECT sum(u) AS s FROM u{t})",
            f"w{t + 1} AS MATERIALIZED (SELECT d, round(u / s.s, 6) AS w"
            f" FROM u{t}, s{t} s)",
        ]
    parts += [
        f"ef AS MATERIALIZED (SELECT p.d,"
        f" round(w.w * {budget!r} / p.tok, 6) AS ep"
        f" FROM per p JOIN w{iters} w USING (d))",
        f"ff AS MATERIALIZED (SELECT p.d, round(p.loss * pow({decay!r},"
        f" greatest(e.ep - 1.0, 0.0)), 6) AS f FROM per p JOIN ef e USING (d))",
    ]
    return ",\n".join(parts)


EPOCH_BUDGET = 300_000.0

SQL_EPOCH_WEIGHTS = f"""
    WITH src AS (SELECT source, round(len(text) / 1000.0, 6) AS l,
                        len(text) AS tk FROM documents),
    {_sql_epoch_iter(8, EPOCH_BUDGET, 0.1, 0.5)}
    SELECT per.d AS source, CAST(per.n AS BIGINT) AS n_docs,
           CAST(per.tok AS BIGINT) AS tokens, per.loss AS mean_loss,
           ef.ep AS epochs, ff.f AS eff_loss, w8.w AS weight
    FROM per JOIN ef USING (d) JOIN ff USING (d) JOIN w8 USING (d)
"""


def _epoch_input(spark):
    docs = load(spark, SF, "documents")
    return docs.select(
        "source",
        F.round(F.length("text") / F.lit(1000.0), 6).alias("loss"),
        F.length("text").alias("tokens"),
    )


def test_epoch_weights_match_duckdb(spark):
    from datapipeline_spike_spark.operators.sampling import (
        epoch_aware_domain_weights,
    )

    got = {
        r["source"]: r.asDict()
        for r in epoch_aware_domain_weights(
            _epoch_input(spark), "source", "loss", "tokens",
            budget_tokens=EPOCH_BUDGET,
        ).collect()
    }
    want = _con().execute(SQL_EPOCH_WEIGHTS).df()
    assert len(got) == len(want) > 0
    for _, w in want.iterrows():
        g = got[w["source"]]
        assert g["n_docs"] == int(w["n_docs"])
        assert g["tokens"] == int(w["tokens"])
        for c in ("mean_loss", "epochs", "eff_loss", "weight"):
            assert g[c] == pytest.approx(w[c], abs=1.5e-6), (c, w["source"])
    # weights renormalize to 1 at 6dp tolerance x |domains|
    assert sum(g["weight"] for g in got.values()) == pytest.approx(
        1.0, abs=len(got) * 1e-6
    )


def test_epoch_weights_decay_one_is_doremi(spark):
    """decay=1 makes the decay term identically 1, so the loop IS the
    registered doremi_domain_weights update sequence — the reduction
    that anchors the new operator to the proven one."""
    from datapipeline_spike_spark.operators.sampling import (
        doremi_domain_weights,
        epoch_aware_domain_weights,
    )

    inp = _epoch_input(spark)
    got = {
        r["source"]: r["weight"]
        for r in epoch_aware_domain_weights(
            inp, "source", "loss", "tokens",
            budget_tokens=EPOCH_BUDGET, decay=1.0,
        ).collect()
    }
    want = {
        r["source"]: r["weight"]
        for r in doremi_domain_weights(inp, "source", "loss").collect()
    }
    assert got == want and len(got) > 1


def test_epoch_weights_self_limiting(spark):
    """The data-constrained mechanism: a tiny high-loss domain that
    static DoReMi would concentrate on is throttled once its implied
    allocation over-epochs — its weight lands strictly below the
    static answer, and the freed mass goes to the domain that can
    absorb tokens."""
    from datapipeline_spike_spark.operators.sampling import (
        doremi_domain_weights,
        epoch_aware_domain_weights,
    )

    rows = [
        ("web", 3.2, 1_000_000), ("web", 3.0, 900_000),
        ("web", 3.1, 1_100_000),
        ("code", 2.1, 50_000), ("code", 2.3, 60_000),
        ("tiny_hard", 4.5, 2_000), ("tiny_hard", 4.4, 1_500),
    ]
    df = spark.createDataFrame(rows, "domain string, loss double, tokens long")
    dyn = {
        r["domain"]: r.asDict()
        for r in epoch_aware_domain_weights(
            df, "domain", "loss", "tokens", budget_tokens=3_000_000.0
        ).collect()
    }
    static = {
        r["domain"]: r["weight"]
        for r in doremi_domain_weights(df, "domain", "loss").collect()
    }
    assert static["tiny_hard"] > 0.5            # static DoReMi piles on
    assert dyn["tiny_hard"]["weight"] < static["tiny_hard"] / 4
    assert dyn["web"]["weight"] > static["web"]
    # the throttle is the epoch count: tiny_hard's implied allocation
    # is multi-epoch even after the rebalance
    assert dyn["tiny_hard"]["epochs"] > 1.0
    assert dyn["web"]["epochs"] < 1.5


def test_epoch_weights_validations(spark):
    from datapipeline_spike_spark.operators.sampling import (
        epoch_aware_domain_weights,
    )

    df = spark.createDataFrame(
        [("a", 1.0, 10)], "domain string, loss double, tokens long"
    )
    for kw in (
        {"iters": 0},
        {"decay": 0.0},
        {"decay": 1.5},
        {"budget_tokens": 0.0},
    ):
        args = {"budget_tokens": 100.0}
        args.update(kw)
        with pytest.raises(ValueError):
            epoch_aware_domain_weights(df, "domain", "loss", "tokens", **args)


# --- plan pins ---------------------------------------------------------------------

from tests.test_r14_staging_wave2 import (  # noqa: E402
    _plan_of,
    _window_groups,
)


def test_wave10_plan_shapes(spark):
    """nn_descent: bucket/id equi-joins + partitioned top-k windows +
    the 1-row auto-plane cross, ExistingRDD round barrier, no Python,
    no cartesian; char_runs: keyed aggregate + equi-join + partitioned
    islands window only; epoch weights: the 1-row assembled-array
    posture, no windows, no Python."""
    from datapipeline_spike_spark.operators.dedup import (
        exact_substr_char_runs,
    )
    from datapipeline_spike_spark.operators.sampling import (
        epoch_aware_domain_weights,
    )
    from datapipeline_spike_spark.operators.similarity import (
        nn_descent_refine,
    )

    nn = _plan_of(
        nn_descent_refine(load(spark, SF, "embeddings"), dim=64, rounds=1)
    )
    assert "CartesianProduct" not in nn
    assert "ExistingRDD" in nn  # the per-round checkpoint barrier
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in nn, node
    assert all(g >= 1 for g in _window_groups(nn))

    cr = _plan_of(
        exact_substr_char_runs(load(spark, SF, "documents"), min_len=30)
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in cr, node
    assert all(g >= 1 for g in _window_groups(cr))

    ep = _plan_of(
        epoch_aware_domain_weights(
            _epoch_input(spark), "source", "loss", "tokens",
            budget_tokens=EPOCH_BUDGET,
        )
    )
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "CartesianProduct", "Window"):
        assert node not in ep, node
