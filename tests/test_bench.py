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


def test_bench_output_contract_is_frozen():
    """The driver keeps the TAIL of stdout (BENCH_r08-r10 lost their
    headlines to a truncated mega-line), so the compact line must stay
    small and last. Pin the static facts that keep it parseable: the
    headline list is FROZEN at 18 queries (the size bound the <=1536B
    assert in main() relies on), every curation-headline member is
    actually timed (HEADLINE or EXTRAS), and the extras chunking that
    de-noises the sweep stays enabled."""
    assert len(bench.HEADLINE) == 18  # frozen — grow EXTRAS instead
    timed = set(bench.HEADLINE) | set(bench.EXTRAS)
    missing = [n for n in bench.CURATION_HEADLINE if n not in timed]
    assert not missing, missing
    assert 1 <= bench.EXTRAS_CHUNK <= 25  # restart cadence stays real
    # every benched name must exist in the registry (a typo here would
    # silently drop a query from the round's evidence)
    ghosts = [n for n in timed if n not in REGISTRY]
    assert not ghosts, ghosts
