"""Driver-contract smoke: entry() returns rows, every query runs at
sf0.001, and the queries()/oracle_sql() key sets are consistent."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 2


def test_queries_run(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs
    for name, sql in entrymod.oracle_sql().items():
        assert sql.strip(), name


def test_rotation_head_invariants():
    """The driver samples the FIRST 50 registry entries; the rotation
    contract requires: exactly 50 head slots, every changed/new r8
    query in the head, the r9 queue disjoint from the head and
    immediately after it, and no duplicates anywhere."""
    from datapipeline_spike_spark.plans import (
        REGISTRY,
        _HEAD,
        _QUEUED_FOR_NEXT_HEAD,
        _R8_CHANGED,
    )

    names = list(REGISTRY)
    assert len(_HEAD) == 50 and len(set(_HEAD)) == 50
    assert names[:50] == [n for n in _HEAD if n in REGISTRY]
    assert set(_R8_CHANGED) <= set(_HEAD)
    assert not (set(_QUEUED_FOR_NEXT_HEAD) & set(_HEAD))
    queue_live = [n for n in _QUEUED_FOR_NEXT_HEAD if n in REGISTRY]
    assert names[50 : 50 + len(queue_live)] == queue_live
    assert len(set(names)) == len(names)
