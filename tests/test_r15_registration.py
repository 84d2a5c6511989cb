"""r15 registration gate: the eight r14-staged operators are now
REGISTRY entries (plans/catalog_r15). This keeps running the SAME
differential comparison the pre-handoff gate uses
(tools/check_oracle.compare) — against the REGISTRY entries, so the
local evidence survives the move (the r9/r11/r12/r13 precedent) —
plus rotation/head invariants for the r15 rotation (the eight lead,
then the dhash changed-code slot) and registered-form sanity floors
(the audio slice must produce real same-family pairs; BT strengths
must be normalized and rank-consistent with the planted truth; the
substr quote plant must surface long runs)."""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

from datapipeline_spike_spark.plans import (  # noqa: F401  (imports catalog_r15)
    REGISTRY,
    rotation_preflight,
)
from datapipeline_spike_spark.plans import _R15_CHANGED, _R15_NEW
from datapipeline_spike_spark.plans.catalog_r15 import R15_REGISTERED
from datapipeline_spike_spark.plans.registry import TABLES


def _compare_fn():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("check_oracle", mod)
    spec.loader.exec_module(mod)
    return mod.compare


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_r15_moves_are_all_registered():
    assert len(R15_REGISTERED) == 8
    assert tuple(R15_REGISTERED) == _R15_NEW
    missing = [n for n in R15_REGISTERED if n not in REGISTRY]
    assert not missing, missing


def test_r15_moves_remain_placed_by_the_rotation():
    """The r15 'head leads with the eight + dhash' pin retired with the
    r16 rotation (the r13-gate precedent); what must stay true forever:
    all nine remain registered, placed, and the rotation is sound."""
    placed = set(REGISTRY)
    assert set(_R15_NEW) | set(_R15_CHANGED) <= placed
    assert rotation_preflight() == []


@pytest.mark.parametrize("name", sorted(R15_REGISTERED))
def test_registered_query_matches_oracle(spark, sf_dir, oracle_con, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, sf_dir).toPandas()
    assert q.oracle is not None  # all eight ship full-value oracles
    odf = oracle_con.execute(q.oracle).df()
    problems = _compare_fn()(name, sdf, odf)
    assert not problems, problems


def test_audio_registered_slice_is_not_vacuous(spark, sf_dir):
    """The doc_id % 5 = 3 slice must still contain planted
    same-(family, jitter) byte-identical clips (hamming 0) — an empty
    registered result would pass the oracle compare trivially while
    verifying nothing."""
    rows = REGISTRY["audio_fingerprint_neardup"].spark(spark, sf_dir).collect()
    assert rows
    assert any(r["hamming"] == 0 for r in rows)
    for r in rows:  # the energy-contour plant never bridges families
        assert r["id_a"] % 16 == r["id_b"] % 16, r
        if (r["id_a"] // 16) % 4 == (r["id_b"] // 16) % 4:
            assert r["hamming"] == 0, r


def test_bradley_terry_registered_strengths_are_sane(spark, sf_dir):
    """Normalized to 1; rank order matches the planted truth (item i's
    true strength is proportional to i + 1, so m7 > m0 by a wide
    margin on any non-degenerate draw)."""
    rows = REGISTRY["bradley_terry_strengths"].spark(spark, sf_dir).collect()
    by_item = {r["item"]: r["strength"] for r in rows}
    assert len(by_item) == 8
    assert sum(by_item.values()) == pytest.approx(1.0, abs=1e-4)
    assert by_item["m7"] > by_item["m0"]


def test_substr_registered_plant_produces_quote_runs(spark, sf_dir):
    """The quoting plant (doc_id % 7 == 3 embeds its predecessor) must
    surface as long runs between consecutive doc ids."""
    rows = REGISTRY["exact_substr_runs"].spark(spark, sf_dir).collect()
    assert rows
    quote_runs = [
        r
        for r in rows
        if r["doc_id_b"] - r["doc_id_a"] == 1 and r["doc_id_b"] % 7 == 3
    ]
    assert quote_runs
    assert max(r["run_tokens"] for r in quote_runs) >= 10


def test_boilerplate_registered_plant_strips_everywhere(spark, sf_dir):
    """Every lined page carries the corpus banner + its 5-group promo
    line — both are over the df threshold at any sf, so every doc
    removes >= 2 lines."""
    rows = REGISTRY["boilerplate_line_removal"].spark(spark, sf_dir).collect()
    assert rows
    assert all(r["n_removed"] >= 2 for r in rows)


def test_url_registered_grid_collapses_variants(spark, sf_dir):
    rows = REGISTRY["url_canonical_dedup"].spark(spark, sf_dir).collect()
    assert rows
    assert any(r["group_size"] > 1 for r in rows)
    reps = sum(1 for r in rows if r["is_canonical"])
    groups = len({r["canonical_url"] for r in rows})
    assert reps == groups  # exactly one survivor per group
