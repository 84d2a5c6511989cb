"""bench.py failure-isolation contract (VERDICT r3 item 2): a raising
query must cost only its own row, never the round's numbers."""

from __future__ import annotations

import bench
from datapipeline_spike_spark.plans.registry import REGISTRY, EngineQuery


def test_bench_isolates_a_failing_query(spark, sf_dir):
    def boom(spark_, sf):
        raise RuntimeError("synthetic failure")

    name = "_synthetic_failing_query"
    REGISTRY[name] = EngineQuery(name=name, spark=boom, oracle=None)
    try:
        timings, runs, errors = bench.run_queries(
            spark, [name, "downsample_1h"], sf_dir, n_runs=1
        )
        assert name in errors and "synthetic failure" in errors[name]
        assert name not in timings
        assert "downsample_1h" in timings and timings["downsample_1h"] > 0
    finally:
        del REGISTRY[name]
