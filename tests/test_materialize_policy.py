"""The config-gated materialization policy (r20, VERDICT r19 item 3):
every operator barrier routes through cache.materialize_barrier, and
``spark.datapipeline.materialize`` switches localCheckpoint (local
default) / persist (cluster-safe, recomputable) / checkpoint (reliable,
lineage-truncating) WITHOUT changing any computed value."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipeline_spike_spark.cache import (
    materialize_barrier,
    unpersist_all,
)

CONF = "spark.datapipeline.materialize"


@pytest.fixture()
def _clean_mode(spark):
    yield
    spark.conf.unset(CONF)
    unpersist_all(spark)


def _values(df):
    return sorted(tuple(r) for r in df.collect())


def test_default_mode_is_local_checkpoint(spark, _clean_mode):
    df = spark.range(50).select("id", (F.col("id") % 7).alias("k"))
    out = materialize_barrier(df)
    # lineage truncated to an RDD scan — the pre-r20 behavior exactly
    assert "ExistingRDD" in out._jdf.queryExecution().optimizedPlan().toString() or \
        "LogicalRDD" in out._jdf.queryExecution().optimizedPlan().toString()
    assert _values(out) == _values(df)


def test_persist_mode_keeps_lineage_and_values(spark, _clean_mode):
    spark.conf.set(CONF, "persist")
    df = spark.range(50).select("id", (F.col("id") % 7).alias("k"))
    out = materialize_barrier(df)
    # cluster-safe: the frame is a persisted view of the SAME plan —
    # storage pinned, lineage kept (recomputable on executor loss)
    assert out.storageLevel.useMemory and out.storageLevel.useDisk
    assert _values(out) == _values(df)


def test_checkpoint_mode_reliable(spark, tmp_path, _clean_mode):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(CONF, "checkpoint")
    df = spark.range(50).select("id", (F.col("id") % 7).alias("k"))
    out = materialize_barrier(df)
    assert _values(out) == _values(df)


def test_operator_identical_under_persist_mode(spark, _clean_mode):
    """An iterative operator (pagerank: barriers inside the loop) must
    produce bit-identical rows under the cluster-safe mode."""
    from datapipeline_spike_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0)],
        "src long, dst long",
    )
    base = _values(pagerank(edges, n_iter=3))
    unpersist_all(spark)
    spark.conf.set(CONF, "persist")
    alt = _values(pagerank(edges, n_iter=3))
    assert alt == base
