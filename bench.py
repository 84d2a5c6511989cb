"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced with the noop sink (full computation, no driver
collect, no result materialization cost)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_spike_spark.plans import REGISTRY  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402

# Secondary set: timed and reported under "extras" but NOT in the
# headline total — the headline list is frozen so round-over-round
# totals stay comparable.
EXTRAS = [
    "incremental_ingest_dedup",
    "quality_filter_decision",
    "ann_recall_at_k",
    "minhash_jaccard_estimate",
    "corpus_mixture_plan",
    "audio_header_meta",
    # round 5 additions
    "incremental_dedup_steady_state",
    "winnowing_fingerprints",
    "decontamination_span_removal",
    "url_host_dedup",
    "scd2_user_state_history",
    "near_dup_cluster_stats",
    "repeated_substring_profile",
    "bloom_filter_profile",
    "prefix_filter_jaccard_join",
]

HEADLINE = [
    "vibration_features",      # flagship windowed feature extraction
    "record_envelope_flat",    # full record pipeline: batches -> envelope -> OLAP row
    "downsample_1h",
    "pricing_summary",         # TPC-H Q1 shape
    "revenue_by_segment",      # 3-way join
    "order_size_histogram",    # outer join + two-level agg
    "top_orders_per_customer", # window top-k
    "purchase_asof_signup",    # as-of join
    "sessionization",          # lag + cumsum sessions
    "dedup_latest_state",
    "doc_fingerprint_dedup",   # exact dedup
    "minhash_lsh_candidates",  # LSH banding
    "simhash_signatures",
    "dedup_corpus_assignment", # end-to-end dedup incl. connected components
    "embedding_topk_cosine",   # similarity search
    "ann_lsh_bucket",          # LSH-bucketed ANN + multiprobe
    "spectral_energy",         # FFT pandas-udf path
    "text_quality_profile",
]


def run_queries(
    spark, names: list[str], sf_dir: str, n_runs: int = 2
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, str]]:
    """Time each query with PER-QUERY failure isolation: one broken
    query must never zero the whole round's bench (round-3 lesson —
    sessionization raised, rc=1, BENCH_r03 had no numbers at all).
    Returns (steady-state timings, all run pairs, errors); the caller
    always emits its JSON line with whatever survived."""
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in names:
        fn = REGISTRY[name].spark
        pair = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                pair.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
            continue
        runs[name] = pair
        timings[name] = pair[-1]
    return timings, runs, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session("bench")
    # JVM/codegen warmup on a trivial action so query 1 isn't charged for it
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Python-worker + Arrow warmup so the first pandas-UDF query isn't
    # charged for the worker fork
    from pyspark.sql import functions as F

    from datapipeline_spike_spark.functions.spectral import spectral_energy_fft

    spark.range(100).select(
        spectral_energy_fft(F.array(F.col("id").cast("double")))
    ).collect()

    # steady-state measurement: run each query twice and report the
    # SECOND time. The first run pays one-off costs that are not query
    # cost (codegen compilation, parquet footer reads, JVM JIT warmup,
    # Python-worker forks) and this host's wall-times swing 2-4x
    # run-to-run — the second run is the reproducible number a cluster
    # would see in steady state. Both runs are reported ("runs") so the
    # host's noise floor is visible next to the headline number.
    timings, runs, errors = run_queries(spark, HEADLINE, sf_dir)

    extras: dict[str, float] = {}
    for name in EXTRAS:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name].spark
        try:
            pair = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                pair.append(round(time.perf_counter() - t0, 3))
            extras[name] = pair[-1]
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    spreads = [max(p) / min(p) for p in runs.values() if min(p) > 0]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "extras": extras,
        "max_run_spread": round(max(spreads), 2) if spreads else None,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
