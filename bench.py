"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

OUTPUT CONTRACT (r11, VERDICT r10 item 1 — third-strike fix): stdout
carries EXACTLY ONE compact JSON line (<= ~1 KB), emitted LAST, after
everything else this process does. The driver's capture keeps the TAIL
of stdout (BENCH_r08/r09/r10 all stored tail fragments of a large
line-2 detail object and recorded "parsed": null), so the only robust
shape is: no detail on stdout at all — the full detail object (per-run
timings, minima, extras, errors, spreads) is written ONLY to the
committed sidecar file BENCH_DETAIL_LOCAL.json. Progress and errors go
to stderr.

The compact line is
  {"metric", "value", "unit", "value_min", "queries", "sf",
   "curation_headline_runtime"}
where "queries" holds the 18 frozen headline steady-state timings
(fixed size — the headline list never grows) and
"curation_headline_runtime" is the second frozen total tracking the
LLM-curation flagships round-over-round (VERDICT r10 item 8).

NOISE CONTROL (VERDICT r10 item 3): the extras sweep grew to ~70
queries and accumulated JVM/executor state inflated late-sweep timings
2-6x on unchanged code (r10 driver extras vs quiet-host local run).
Extras now run in chunks of EXTRAS_CHUNK with a full SparkSession
restart between chunks, so no query is measured more than ~20 queries
deep into one JVM's accumulated state.

Execution is forced with the noop sink (full computation, no driver
collect, no result materialization cost)."""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_spike_spark.cache import unpersist_all  # noqa: E402
from datapipeline_spike_spark.plans import REGISTRY  # noqa: E402
from datapipeline_spike_spark.session import get_session  # noqa: E402

# Secondary set: timed and reported under "extras" in the sidecar but
# NOT in the headline total — the headline list is frozen so
# round-over-round totals stay comparable.
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
    # round 6 additions
    "scd2_steady_state",
    "bm25_ranked_retrieval",
    "source_overlap_matrix",
    "pq_distortion_profile",
    "pq_adc_recall_at_k",
    "audio_pcm_features",
    "image_pixel_features",
    "session_campaign_overlap",
    "bpe_merge_training",
    # round 7 additions
    "image_jpeg_pixel_features",
    "maintenance_window_overlap",
    "quality_classifier_score",
    "bpe_encoded_corpus_stats",
    "sq8_recall_at_k",
    "video_frame_features",
    "cluster_balanced_sample",
    "local_supplier_volume",
    "returned_item_losses",
    "priority_shipping_lag",
    "bpe_fertility_by_lang",
    "fuzzy_contamination",
    "snapshot_delta",
    # round 8 additions
    "semdedup_assignment",
    "dsir_importance_weights",
    # round 9 registrations, curation funnel first
    "curation_stage_profile",
    "paragraph_dedup_profile",
    "approx_percentile_bands",
    "gopher_quality_rules",
    "c4_line_filters",
    "domain_cap_sample",
    "shuffle_shard_plan",
    "weighted_doc_sample",
    "skipgram_pmi",
    "budget_selected_docs",
    "dedup_survivor_policy",
    "html_extract_profile",
    "bigram_fluency",
    "perplexity_bucket_profile",
    "encoding_quality_profile",
    "hard_negative_pairs",
    "hamming_recall_at_k",
    "random_projection_profile",
    "ngram_jaccard_pairs",
    "candidate_edit_distance",
    # round 10 additions (the six TPC-H shapes)
    "forecast_revenue_change",
    "volume_shipping",
    "market_share",
    "customer_distribution",
    "waiting_suppliers",
    "global_sales_opportunity",
    "product_type_profit",
    "top_supplier_revenue",
    "supplier_part_types",
    # round 11 registrations (the r10 staged corpus-statistics ops)
    "zipf_profile",
    "ngram_novelty_profile",
    "kneser_ney_bigram_score",
    "verdict_agreement_matrix",
    "dedup_span_removal",
    "temperature_mixture_plan",
    # round 12 registrations (the r11 staged ops)
    "reliability_calibration_bins",
    "token_distribution_drift",
    "rouge_ngram_eval",
    "embedding_centroid_drift",
    "hubness_profile",
    "ivfpq_recall_at_k",
    # round 14 registrations (the r12 staged ops) — steady-state minima
    # recorded here are the r15 regression floor for the cohort
    "watermark_greenlist_score",
    "quality_rank_normalize",
    "ngram_containment_pairs",
    "dhash_neardup_pairs",
    "sequence_packing_plan",
    "doremi_domain_weights",
    # round 15 registrations (the r14 staged ops) — steady-state minima
    # recorded here are the r16 regression floor for the cohort
    "exact_substr_runs",
    "cdc_chunk_dedup",
    "boilerplate_line_removal",
    "url_canonical_dedup",
    "audio_fingerprint_neardup",
    "bradley_terry_strengths",
    "oov_rate_profile",
    "char_entropy_profile",
    # round 16 registrations (the r14 wave-2 staged ops) — steady-state
    # minima recorded here are the r17 regression floor for the cohort
    "pagerank_host_authority",
    "code_detect_profile",
    "license_detect_profile",
    "matryoshka_recall_at_k",
    "audio_vad_segments",
    "curriculum_phase_plan",
    # round 17 registrations (the r14 waves 3-7 staged ops) —
    # steady-state minima recorded here are the r18 regression floor
    "video_scene_cuts",
    "crawl_frontier_priority",
    "anchor_text_stats",
    "span_corruption_plan",
    "label_propagation_communities",
    "vocab_overlap_matrix",
    "minhash_band_tuning",
    "triangle_clustering",
    "hybrid_rrf_retrieval",
    "chat_turn_stats",
    "dpo_pair_plan",
    # round 18 registrations (the r17 wave-8 staged ops) —
    # steady-state minima recorded here are the r19 regression floor
    "hits_hub_authority",
    "knn_graph_edges",
    "min_k_prob_profile",
    # round 19 registrations (the r17 wave-9 staged ops) —
    # steady-state minima recorded here are the r20 regression floor
    "kcore_membership",
    "distinct_ngram_diversity",
    "best_of_n_selection",
]

# After this many extras the SparkSession is stopped and rebuilt so
# accumulated executor/GC state can't inflate late-sweep timings.
EXTRAS_CHUNK = 20

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

# FROZEN (r11): the LLM-curation flagship total reported as
# "curation_headline_runtime" in the compact line — the north-star
# workload gets its own round-over-round number the r4-era headline
# can't provide. Members must appear in HEADLINE or EXTRAS; the total
# sums their steady-state timings wherever they were measured.
CURATION_HEADLINE = [
    "curation_stage_profile",   # the 8-stage funnel (the product)
    "doc_fingerprint_dedup",    # exact dedup
    "minhash_lsh_candidates",   # near-dup banding
    "dedup_corpus_assignment",  # end-to-end dedup + components
    "semdedup_assignment",      # semantic dedup
    "embedding_topk_cosine",    # similarity search baseline
    "ann_lsh_bucket",           # similarity search scale path
    "hard_negative_pairs",      # contrastive mining
    "text_quality_profile",     # quality scoring
]


def run_queries(
    spark, names: list[str], sf_dir: str, n_runs: int = 3
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, str]]:
    """Time each query with PER-QUERY failure isolation: one broken
    query must never zero the whole round's bench (round-3 lesson —
    sessionization raised, rc=1, BENCH_r03 had no numbers at all).
    Returns (steady-state timings, all run timings, errors); the caller
    always emits its JSON line with whatever survived. n_runs=3 (r6):
    the extra run feeds the per-query best-of-N minima — on this noisy
    shared host a single inflated run can manufacture a fake
    regression, and the minimum is the number robust to that."""
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
        # release per-query state between queries: several operators
        # localCheckpoint/persist shared frames at plan-build; left in
        # place they pile executor memory across the sweep and inflate
        # later queries' timings (r8: semdedup measured 10.5 s inside
        # the sweep vs 3.1 s standalone — GC pressure, not plan).
        # unpersist_all (r19) also drains the localCheckpoint RDD
        # population clearCache() cannot see; safe here because the
        # noop write consumed the result before the drain
        # (consume-then-drain, the documented contract).
        unpersist_all(spark)
        gc.collect()
    return timings, runs, errors


def _fresh_session(tag: str):
    """Build a warmed SparkSession (JVM codegen + Python-worker/Arrow
    warmup) so the first query after a restart isn't charged for
    one-off costs."""
    spark = get_session(f"bench-{tag}")
    # Silence WindowExec's "No Partition Defined" WARN in the bench
    # tail (VERDICT r16 item 8): every unpartitioned window in the
    # registry is a WINDOW_OK bounded-grain form (plan-grain schedule /
    # histogram windows) verified by tools/plan_audit.py — the AUDIT is
    # the unpartitioned-window guard, and leaving the ambient WARNs in
    # place would let a real regression hide in expected noise. Scoped
    # to the one logger, bench sessions only.
    try:
        cfgr = spark._jvm.org.apache.logging.log4j.core.config.Configurator
        lvl = spark._jvm.org.apache.logging.log4j.Level.ERROR
        cfgr.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec", lvl
        )
    except Exception as exc:  # noqa: BLE001
        print(f"bench: WindowExec log pin skipped ({exc})", file=sys.stderr)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    from datapipeline_spike_spark.functions.spectral import spectral_energy_fft

    spark.range(100).select(
        spectral_energy_fft(F.array(F.col("id").cast("double")))
    ).collect()
    return spark


def _restart_session(spark, tag: str):
    try:
        spark.stop()
    except Exception as exc:  # noqa: BLE001
        print(f"bench: session stop failed ({exc}); continuing", file=sys.stderr)
    gc.collect()
    return _fresh_session(tag)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = _fresh_session("headline")

    # steady-state measurement: run each query n_runs times and report
    # the LAST time. The first run pays one-off costs that are not query
    # cost (codegen compilation, parquet footer reads, JVM JIT warmup,
    # Python-worker forks) and this host's wall-times swing 2-4x
    # run-to-run — the last run is the reproducible number a cluster
    # would see in steady state. All runs land in the sidecar so the
    # host's noise floor is visible next to the headline number.
    timings, runs, errors = run_queries(spark, HEADLINE, sf_dir)

    # extras in chunks of EXTRAS_CHUNK with a session restart between
    # chunks (VERDICT r10 item 3): accumulated JVM state across a ~70
    # query sweep inflated unchanged queries 2-6x in r10's driver run.
    extras: dict[str, float] = {}
    extras_min: dict[str, float] = {}
    live_extras = [n for n in EXTRAS if n in REGISTRY]
    for i in range(0, len(live_extras), EXTRAS_CHUNK):
        chunk = live_extras[i : i + EXTRAS_CHUNK]
        spark = _restart_session(spark, f"extras-{i // EXTRAS_CHUNK}")
        ex_timings, ex_runs, ex_errors = run_queries(spark, chunk, sf_dir, n_runs=2)
        extras.update(ex_timings)
        extras_min.update({n: min(p) for n, p in ex_runs.items()})
        errors.update(ex_errors)

    total = round(sum(timings.values()), 3)
    queries_min = {n: min(p) for n, p in runs.items()}
    total_min = round(sum(queries_min.values()), 3)
    spreads = [max(p) / min(p) for p in runs.values() if min(p) > 0]
    merged = {**extras, **timings}
    curation_members = [n for n in CURATION_HEADLINE if n in merged]
    curation_total = round(sum(merged[n] for n in curation_members), 3)

    compact = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "value_min": total_min,
        "queries": timings,
        "curation_headline_runtime": curation_total,
        "sf": sf,
    }
    if errors:
        compact["errors_count"] = len(errors)
    detail = {
        **compact,
        "queries_min": queries_min,
        "runs": runs,
        "extras": extras,
        "extras_min": extras_min,
        "extras_chunk": EXTRAS_CHUNK,
        "curation_headline_queries": curation_members,
        "max_run_spread": round(max(spreads), 2) if spreads else None,
    }
    if errors:
        detail["errors"] = errors
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL_LOCAL.json"
    )
    with open(sidecar, "w") as fh:
        json.dump(detail, fh, indent=1)
    # THE one stdout line, last thing this process writes: a
    # tail-keeping capture always ends with this complete JSON object.
    # Never abort here (ADVICE r11: an assert would suppress the line —
    # the exact failure the output contract exists to prevent, and it
    # vanishes under -O): oversize trims per-query detail to the sidecar
    # and still prints a complete, parseable object.
    line = json.dumps(compact)
    if len(line) >= 1536:
        print(
            f"bench: compact line grew to {len(line)} bytes; trimming "
            "queries to the sidecar",
            file=sys.stderr,
        )
        trimmed = {k: v for k, v in compact.items() if k != "queries"}
        trimmed["queries"] = {}
        trimmed["queries_in_sidecar"] = len(timings)
        line = json.dumps(trimmed)
    sys.stdout.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
