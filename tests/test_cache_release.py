"""The session-level cache release path (VERDICT r17 item 4 / ADVICE
r16-b): registered queries that deliberately persist() shared frames
or localCheckpoint loop state release ALL pinned storage through
datapipeline_spike_spark.cache, with no operator code change and no
change to any answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from datapipeline_spike_spark.cache import (
    _persistent_rdd_ids,
    scoped_cache,
    unpersist_all,
)
from datapipeline_spike_spark.plans import REGISTRY


def _run(spark, sf_dir, name):
    rows = REGISTRY[name].spark(spark, sf_dir).collect()
    assert rows
    return rows


def test_unpersist_all_releases_persisting_queries(spark, sf_dir):
    """knn_graph_edges persist()s its edge frame; pagerank
    localCheckpoints per-iteration state; exact_substr_runs persist()s
    its posting frame. After materialization the session holds pinned
    RDDs; one unpersist_all releases every one of them."""
    unpersist_all(spark)  # isolate from earlier tests in the session
    assert _persistent_rdd_ids(spark) == set()

    for name in ("knn_graph_edges", "pagerank_host_authority",
                 "exact_substr_runs"):
        _run(spark, sf_dir, name)
    assert _persistent_rdd_ids(spark), "expected pinned frames to exist"

    unpersist_all(spark)
    assert _persistent_rdd_ids(spark) == set()
    # the SQL-cache bookkeeping is drained too, not just the storage
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


def test_unpersist_all_changes_no_answers(spark, sf_dir):
    """The release is semantics-free: a query re-run after the drain
    recomputes and returns the identical result set."""
    name = "knn_graph_edges"
    before = {tuple(r) for r in _run(spark, sf_dir, name)}
    unpersist_all(spark)
    after = {tuple(r) for r in _run(spark, sf_dir, name)}
    assert before == after
    unpersist_all(spark)


def test_scoped_cache_releases_only_the_blocks_pins(spark, sf_dir):
    """A frame pinned BEFORE the block survives the block's exit; the
    block's own pins are gone."""
    unpersist_all(spark)
    keeper = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("twice")
    ).persist()
    keeper.count()
    pre = _persistent_rdd_ids(spark)
    assert pre

    with scoped_cache(spark):
        _run(spark, sf_dir, "knn_graph_edges")
        assert _persistent_rdd_ids(spark) - pre, "block should pin frames"

    assert _persistent_rdd_ids(spark) == pre
    # the keeper is still genuinely cached (storage intact)
    assert keeper.storageLevel.useMemory
    keeper.unpersist()
    unpersist_all(spark)


def _cached_entry_count(spark) -> int:
    it = (
        spark._jsparkSession.sharedState().cacheManager().cachedData().iterator()
    )
    n = 0
    while it.hasNext():
        it.next()
        n += 1
    return n


def test_scoped_cache_warm_path_drops_blocks_cache_entries(spark, sf_dir):
    """ADVICE r18 (warm path): with a PRE-EXISTING pin, exiting the
    scope must drop the block's own CacheManager ENTRIES — not just
    their RDD storage — or a later query with a matching analyzed plan
    silently re-materializes the dead entry outside any scope and the
    metadata accumulates. The pre-existing entry keeps registration
    AND storage."""
    unpersist_all(spark)
    keeper = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3).alias("thrice")
    ).persist()
    keeper.count()
    assert _cached_entry_count(spark) == 1

    with scoped_cache(spark):
        _run(spark, sf_dir, "knn_graph_edges")
        assert _cached_entry_count(spark) > 1, "block should register entries"

    # registration drained back to exactly the keeper's entry
    assert _cached_entry_count(spark) == 1
    assert keeper.storageLevel.useMemory
    # and a re-run of the same query re-registers fresh (no dead-entry
    # re-materialization path left behind)
    with scoped_cache(spark):
        _run(spark, sf_dir, "knn_graph_edges")
    assert _cached_entry_count(spark) == 1
    keeper.unpersist()
    unpersist_all(spark)


def test_drain_keep_checkpoints_preserves_held_results(spark, sf_dir):
    """ADVICE r18 (safety contract): a held DataFrame from an
    iterative operator sits on localCheckpoint blocks with truncated
    lineage — a full drain makes its next action raise
    'Checkpoint block not found' instead of recomputing. The
    hold-across-drain shape passes keep_checkpoints=True: the
    recomputable storage is released, the checkpoint blocks survive,
    and the held result stays collectable."""
    unpersist_all(spark)
    held = REGISTRY["pagerank_host_authority"].spark(spark, sf_dir)
    before = {tuple(r) for r in held.collect()}
    assert before
    assert _persistent_rdd_ids(spark), "iteration should pin checkpoints"

    unpersist_all(spark, keep_checkpoints=True)
    # the checkpoint population survives; the held frame still answers
    after = {tuple(r) for r in held.collect()}
    assert after == before
    # a later full drain (result consumed, frame dropped) clears it all
    unpersist_all(spark)
    assert _persistent_rdd_ids(spark) == set()


def test_scoped_cache_keep_checkpoints(spark, sf_dir):
    """The same hold-across-exit shape at the scope grain."""
    unpersist_all(spark)
    with scoped_cache(spark, keep_checkpoints=True):
        held = REGISTRY["pagerank_host_authority"].spark(spark, sf_dir)
        before = {tuple(r) for r in held.collect()}
    after = {tuple(r) for r in held.collect()}
    assert after == before
    unpersist_all(spark)


def test_scoped_cache_cold_entry_drains_bookkeeping(spark, sf_dir):
    """Entering with a cold cache (the long-lived-worker shape) exits
    with BOTH storage and CacheManager empty."""
    unpersist_all(spark)
    with scoped_cache(spark):
        _run(spark, sf_dir, "exact_substr_runs")
    assert _persistent_rdd_ids(spark) == set()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
