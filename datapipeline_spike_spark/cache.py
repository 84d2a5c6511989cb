"""Session-level cache release for the deliberate persist() pins
(VERDICT r17 item 4 / ADVICE r16-b).

Several operators deliberately ``persist()`` a shared frame so two
consumers read one materialization instead of recomputing an expensive
subtree per branch (the LSH edge frame in
``similarity.knn_graph_edges``, the posting frame in
``dedup.exact_substr_runs``, the graph edge frames in
``graph.pagerank`` / LPA / triangles, ...), and the iterative
operators ``localCheckpoint()`` loop state to truncate lineage (the r7
exponential-plan lesson). Both pin executor storage for the life of
the SparkSession: the right trade inside bench's
fresh-session-per-round cadence and for any bounded batch job, but a
LONG-LIVED session composing many operators accumulates pinned frames
with no release path — the documented cache-leak class.

This module is that release path, deliberately OUTSIDE the operators:

- the operators stay session-rebuild-simple (no unpersist bookkeeping
  threaded through every return value, no behavior change to any
  registered plan — the r18 design decision: a mechanism at the
  SESSION grain, not handles at the operator grain);
- :func:`unpersist_all` is the "between jobs" drain — it clears the
  SQL cache (every ``DataFrame.persist`` goes through the
  CacheManager, so ``spark.catalog.clearCache()`` both drops the
  InMemoryRelation entries and frees their storage) and then
  unpersists any REMAINING persistent RDDs, which is exactly the
  ``localCheckpoint`` population (checkpoint RDDs are pinned at the
  RDD layer and invisible to the SQL cache);
- :func:`scoped_cache` bounds ONE unit of work: frames pinned inside
  the ``with`` block are released at exit, frames pinned before it
  survive — so a long-lived session can wrap each query/operator call
  and never accumulate.

Correctness note: releasing a frame is always safe AFTER the actions
that consumed it have run — an unpersisted frame recomputes on the
next action instead of reading cache (Spark semantics), so the worst
case is recomputation cost, never wrong answers. Releasing a
localCheckpoint'd RDD mid-loop WOULD break the loop's lineage
truncation, which is why the drain lives at the session/work-unit
grain rather than inside operators.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently pinned to storage (persist()ed
    DataFrames once materialized, localCheckpoint RDDs, raw persisted
    RDDs)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(jid) for jid in jmap.keySet().toArray()}


def _unpersist_rdd_ids(
    spark: SparkSession, ids: set[int], blocking: bool = False
) -> int:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for jid in list(jmap.keySet().toArray()):
        if int(jid) in ids:
            jmap.get(jid).rdd().unpersist(blocking)
            released += 1
    return released


def unpersist_all(spark: SparkSession, blocking: bool = False) -> int:
    """Release EVERY pinned frame in the session: the SQL cache (all
    persist()ed DataFrames/tables, dropped from the CacheManager so
    plans stop compiling to InMemoryTableScan) and any remaining
    persistent RDDs (the localCheckpoint population). Returns the
    number of storage-pinned RDDs that were released. Call between
    jobs in a long-lived session, or at teardown; every operator
    result remains valid and recomputable afterward."""
    before = _persistent_rdd_ids(spark)
    spark.catalog.clearCache()
    _unpersist_rdd_ids(spark, _persistent_rdd_ids(spark), blocking)
    return len(before)


@contextmanager
def scoped_cache(
    spark: SparkSession, blocking: bool = False
) -> Iterator[None]:
    """Bound one unit of work: any frame pinned DURING the block
    (operator persist(), localCheckpoint, manual cache()) is released
    at exit; frames pinned BEFORE the block survive untouched.

    When the session enters the block with a cold cache (the common
    long-lived-worker shape: drain after every unit), exit also clears
    the SQL-cache bookkeeping outright so CacheManager entries don't
    accumulate as dead metadata; with pre-existing cache entries it
    releases only the block's own RDD storage — the pre-existing
    entries keep their cache semantics."""
    before = _persistent_rdd_ids(spark)
    try:
        yield
    finally:
        if before:
            _unpersist_rdd_ids(
                spark, _persistent_rdd_ids(spark) - before, blocking
            )
        else:
            spark.catalog.clearCache()
            _unpersist_rdd_ids(spark, _persistent_rdd_ids(spark), blocking)
