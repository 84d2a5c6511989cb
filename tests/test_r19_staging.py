"""r19 staged operators, WAVE 11 (register r20+ if the budget funds
it — r20's head is already budgeted for wave 10 + the documented r20
queue, so this wave's value is the staged gauntlet itself: the
VERDICT r18 item-4 north-star compositions over the registered
substrates): DuckDB differential tests + planted-property checks +
plan pins for knn_prune_assignment (SemDeDup-style pruning driven by
the registered kNN graph — its is_mutual edges ARE the cluster-keep
signal; Abbas 2023 over Dong 2011) and membership_triage (the
Min-K% Prob text signal joined with the kNN-graph embedding signal
into one routing decision — the cross-signal contamination triage a
curation stack actually runs; Shi 2023 x Abbas 2023).

Both oracles are COMPOSED from the registered single-source SQL
(catalog_r18's SQL_KNN_GRAPH / SQL_MIN_K wrapped as CTEs), so the
composites can never drift from the substrates they claim to ride —
the same never-drift rule the catalog/staging import direction
enforces for whole queries.

Registration notes (measured on these staged plans at sf0.001):
- knn_prune_assignment: inherits knn_graph_edges' plan wholesale
  (auto-plane 1-row corpus-count cross -> the BNLJ_OK precedent;
  rank window PARTITIONED by src_id) + one keyed aggregate and one
  vector-grain left join -> same allowlist posture as the registered
  knn_graph_edges, nothing new.
- membership_triage: union of the two substrates' postures (min_k's
  1-row smoothing-totals cross + knn's corpus-count cross, all
  windows PARTITIONED) + one doc-grain left join + a map-only CASE
  -> BNLJ_OK under the existing precedents, no new classes.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.plans.catalog_r18 import (
    SQL_KNN_GRAPH,
    SQL_MIN_K,
)
from datapipeline_spike_spark.plans.registry import load

SF = "/root/testdata/sf0.001"

# routing bands: the registered-grain defaults, measured non-degenerate
# at both sf0.001 and sf0.01 (see the operator docstrings)
DUP_T = 0.35
GAP_LO = 0.035
GAP_HI = 0.055


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# --- knn_prune_assignment --------------------------------------------------------

SQL_KNN_PRUNE = f"""
    WITH g AS ({SQL_KNN_GRAPH}),
    dup AS (
      SELECT src_id, min(dst_id) AS dup_of, max(cos_sim) AS best_dup_sim
      FROM g
      WHERE is_mutual AND cos_sim >= {DUP_T} AND dst_id < src_id
      GROUP BY 1
    )
    SELECT e.vec_id, d.dup_of, d.best_dup_sim,
           (d.dup_of IS NULL) AS kept
    FROM (SELECT vec_id FROM embeddings) e
    LEFT JOIN dup d ON e.vec_id = d.src_id
"""


def test_knn_prune_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.similarity import (
        knn_prune_assignment,
    )

    got = {
        r["vec_id"]: r.asDict()
        for r in knn_prune_assignment(
            load(spark, SF, "embeddings"), dim=64, k=5, threshold=DUP_T
        ).collect()
    }
    want = _con().execute(SQL_KNN_PRUNE).df()
    assert len(got) == len(want) > 0
    pruned = 0
    for _, w in want.iterrows():
        g = got[w["vec_id"]]
        assert g["kept"] == bool(w["kept"]), w["vec_id"]
        if not g["kept"]:
            pruned += 1
            assert g["dup_of"] == w["dup_of"]
            assert g["best_dup_sim"] == pytest.approx(
                w["best_dup_sim"], abs=1.5e-6
            )
        else:
            assert g["dup_of"] is None and g["best_dup_sim"] is None
    # the threshold must actually split the corpus for the
    # differential to be informative
    assert 0 < pruned < len(want)


def test_knn_prune_planted_clusters(spark):
    """Scaled copies of a vector (cosine exactly 1.0, same LSH bucket)
    prune down to the lowest id per cluster; a lone vector is kept;
    a threshold above any cosine keeps everything."""
    from datapipeline_spike_spark.operators.similarity import (
        knn_prune_assignment,
    )

    base_a = [1.0 if d % 3 == 0 else -0.5 for d in range(64)]
    base_b = [-1.0 if d % 5 == 0 else 0.75 for d in range(64)]
    rows = []
    for i, scale in enumerate((1.0, 2.0, 3.0)):
        rows.append((i, [x * scale for x in base_a]))
        rows.append((10 + i, [x * scale for x in base_b]))
    rows.append((99, [(-1.0) ** d * (d + 1.0) for d in range(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {r["vec_id"]: r for r in knn_prune_assignment(df, dim=64, k=3).collect()}
    assert set(got) == {0, 1, 2, 10, 11, 12, 99}
    # cluster survivors: the lowest id of each planted cluster + the loner
    assert got[0]["kept"] and got[10]["kept"] and got[99]["kept"]
    for v, head in ((1, 0), (2, 0), (11, 10), (12, 10)):
        assert not got[v]["kept"], v
        assert got[v]["dup_of"] == head
        assert got[v]["best_dup_sim"] == pytest.approx(1.0, abs=1e-6)
    # threshold above 1.0: nothing qualifies, everything kept
    allkept = knn_prune_assignment(df, dim=64, k=3, threshold=1.01).collect()
    assert all(r["kept"] for r in allkept)


def test_knn_prune_mutual_gate(spark):
    """mutual_only=True is the hub guard: with k=1, a chain of
    vectors descending in similarity produces one-directional edges
    (each points at its nearer neighbor, which prefers someone else);
    only reciprocated pairs may prune. The planted pair (identical
    vectors) reciprocates; with mutual_only=False the one-directional
    qualifying edges prune too, so the keep set can only shrink."""
    from datapipeline_spike_spark.operators.similarity import (
        knn_prune_assignment,
    )

    base = [1.0 if d % 3 == 0 else -0.5 for d in range(64)]
    near = [x + (0.001 if d == 1 else 0.0) for d, x in enumerate(base)]
    rows = [(0, base), (1, base), (2, near)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    strict = {
        r["vec_id"]: r
        for r in knn_prune_assignment(df, dim=64, k=1, threshold=0.9).collect()
    }
    loose = {
        r["vec_id"]: r
        for r in knn_prune_assignment(
            df, dim=64, k=1, threshold=0.9, mutual_only=False
        ).collect()
    }
    # the identical pair (0,1) reciprocates at k=1 -> 1 prunes to 0
    assert strict[0]["kept"] and not strict[1]["kept"]
    assert strict[1]["dup_of"] == 0
    # keep set under mutual_only=False is a subset of the strict one
    kept_strict = {v for v, r in strict.items() if r["kept"]}
    kept_loose = {v for v, r in loose.items() if r["kept"]}
    assert kept_loose <= kept_strict


# --- membership_triage -----------------------------------------------------------

SQL_TRIAGE = f"""
    WITH mk AS ({SQL_MIN_K}),
    g AS ({SQL_KNN_GRAPH}),
    top AS (
      SELECT src_id, cos_sim AS top_cos_sim, is_mutual AS top_is_mutual
      FROM g WHERE rank = 1
    )
    SELECT mk.doc_id, mk.n_tokens, mk.avg_logprob, mk.min_k_avg_logprob,
           round(mk.avg_logprob - mk.min_k_avg_logprob, 6) AS tail_gap,
           t.top_cos_sim, t.top_is_mutual,
           CASE WHEN t.top_is_mutual AND t.top_cos_sim >= {DUP_T}
                  THEN 'near_dup'
                WHEN round(mk.avg_logprob - mk.min_k_avg_logprob, 6)
                  <= {GAP_LO} THEN 'member_risk'
                WHEN round(mk.avg_logprob - mk.min_k_avg_logprob, 6)
                  >= {GAP_HI} THEN 'template'
                ELSE 'clean' END AS triage
    FROM mk LEFT JOIN top t ON mk.doc_id = t.src_id
"""


def test_membership_triage_matches_duckdb(spark):
    from datapipeline_spike_spark.operators.curation import membership_triage

    got = {
        r["doc_id"]: r.asDict()
        for r in membership_triage(
            load(spark, SF, "documents"),
            load(spark, SF, "embeddings"),
            dim=64,
            k=5,
            dup_threshold=DUP_T,
            gap_lo=GAP_LO,
            gap_hi=GAP_HI,
        ).collect()
    }
    want = _con().execute(SQL_TRIAGE).df()
    assert len(got) == len(want) > 0
    routes = set()
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        assert g["triage"] == w["triage"], w["doc_id"]
        routes.add(g["triage"])
        assert g["n_tokens"] == int(w["n_tokens"])
        assert g["tail_gap"] == pytest.approx(w["tail_gap"], abs=1.5e-6)
        assert g["top_cos_sim"] == pytest.approx(
            w["top_cos_sim"], abs=1.5e-6
        )
    # the bands must actually route (measured: all four non-empty at
    # both SFs with the registered-grain defaults)
    assert routes == {"near_dup", "member_risk", "template", "clean"}


def test_membership_triage_planted_routes(spark):
    """Each route reachable by construction: identical embeddings ->
    near_dup regardless of token stats; an all-one-token doc has
    tail_gap exactly 0 -> member_risk; a doc mixing one very common
    with one very rare token maximizes the gap -> template; routing
    precedence puts near_dup above the text routes."""
    from datapipeline_spike_spark.operators.curation import membership_triage

    # corpus LM: token 'a' dominates, 'zz' is rare
    docs = [
        (0, "a a a a a a a a a a a a"),       # thin tail: gap 0
        (1, "a a a a a a a a a a a a"),       # same text, dup embedding
        (2, "a a a a a a a a a a a zz"),      # heavy tail: common+rare mix
        (3, "a a a a a a a a a a a a"),       # gap 0 but unique embedding
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    base = [1.0 if d % 3 == 0 else -0.5 for d in range(64)]
    other = [(-1.0) ** d * (d + 1.0) for d in range(64)]
    third = [1.0 if d % 7 == 0 else -0.25 for d in range(64)]
    edf = spark.createDataFrame(
        [(0, base), (1, base), (2, other), (3, third)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["doc_id"]: r
        for r in membership_triage(
            ddf, edf, dim=64, k=1, gap_lo=0.01, gap_hi=0.05
        ).collect()
    }
    # identical embeddings reciprocate at k=1 -> near_dup wins even
    # though both docs' tail_gap is 0 (precedence)
    assert got[0]["triage"] == "near_dup"
    assert got[1]["triage"] == "near_dup"
    assert got[0]["tail_gap"] == 0.0
    # unique embedding + zero gap -> member_risk
    assert got[3]["triage"] == "member_risk"
    # the common+rare mix carries the corpus's biggest tail gap
    assert got[2]["tail_gap"] > got[3]["tail_gap"]
    assert got[2]["triage"] == "template"


# --- plan pins -------------------------------------------------------------------

# one home for the nontrivial plan-text parsers (review r17: a second
# copy would drift when a Spark upgrade changes node rendering)
from tests.test_r14_staging_wave2 import (  # noqa: E402
    _plan_of,
    _window_groups,
)


def test_wave11_plan_shapes(spark):
    """Both composites inherit their substrates' audited postures and
    add ONLY keyed joins/aggregates + map-only projection: no
    cartesian, no Python stages, every window PARTITIONED. The 1-row
    broadcast crosses (knn's corpus count, min_k's smoothing totals)
    are the inherited BNLJ_OK precedents."""
    from datapipeline_spike_spark.operators.curation import membership_triage
    from datapipeline_spike_spark.operators.similarity import (
        knn_prune_assignment,
    )

    kp = _plan_of(
        knn_prune_assignment(load(spark, SF, "embeddings"), dim=64, k=5)
    )
    tr = _plan_of(
        membership_triage(
            load(spark, SF, "documents"), load(spark, SF, "embeddings")
        )
    )
    for plan, name in ((kp, "knn_prune"), (tr, "triage")):
        assert "CartesianProduct" not in plan, name
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert node not in plan, (name, node)
        groups = _window_groups(plan)
        assert all(g >= 1 for g in groups), (name, groups)
