"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 is registered here as (Spark callable, DuckDB oracle SQL).
``__spark_entry__`` at the repo root re-exports this registry."""

from datapipeline_spike_spark.plans.registry import REGISTRY, EngineQuery, register  # noqa: F401
from datapipeline_spike_spark.plans import catalog  # noqa: F401  (populates REGISTRY)
from datapipeline_spike_spark.plans import catalog_relational  # noqa: F401
from datapipeline_spike_spark.plans import catalog_events  # noqa: F401
from datapipeline_spike_spark.plans import catalog_extensions  # noqa: F401
from datapipeline_spike_spark.plans import catalog_ml  # noqa: F401

# The driver's per-round correctness harness samples the FIRST 50
# registry entries, so raw registration order (module import order, new
# queries appended at the tail) silently starves the newest queries of
# driver verification. Rotate each round: (1) queries repaired this
# round, (2) queries not sampled last round (the r2-only tail — none
# may go 2 rounds unverified), (3) new queries; the most recently
# driver-green block rotates to the tail.
_VERIFY_FIRST = (
    # --- code changed in round 4/5 but not driver-re-verified since ---
    "dedup_corpus_assignment",      # r4: size-gated driver union-find
    "minhash_lsh_candidates",       # r4: shared MinHash signature pass
    "simhash_signatures",           # r4: shared signature pass
    "simhash_neardup_pairs",
    "embedding_dedup_assignment",   # uses connected components (r4 change)
    "ngram_jaccard_pairs",
    "unigram_logprob_score",        # r5: plan-build collect removed
    "tfidf_top_terms",              # r5: same fix — derive N in-plan
    # --- perf-weak, needs a fresh driver timing + hash ---
    "spectral_energy",
    "dominant_frequency",
    # --- last driver-verified in r2, longest-unverified block ---
    "ann_lsh_bucket",
    "ann_ivf_flat",
    "kmeans_centroids",
    "ann_ivf_kmeans",
    "embedding_neardup_pairs",
    "embedding_topk_cosine",
    "pca_reduce",
    "text_quality_profile",
    "language_id",
    "token_frequencies",
    "token_counting_methods",
    "doc_rolling_hash",
    "kmv_distinct_ngrams",
    "heavy_hitter_tokens",
    "document_chunks",
    "benchmark_contamination",
    "leakage_safe_split",
    "stratified_sample",
    "pii_redaction",
    "segment_dedup_profile",
    "context_pack_stats",
    "doc_fingerprint_dedup",
    "dedup_latest_state",
    "outlier_gate",
    "quality_metrics",
    "rolling_baseline",
    "sliding_window_load",
    "purchase_asof_signup",
    "shipping_priority",
    "late_shipment_priority",
    "small_quantity_revenue",
    "table_profile",
    "image_header_meta",
    "video_header_meta",
    # --- new in round 5 — never driver-verified ---
    "incremental_dedup_steady_state",
    "dominant_frequency_verified",  # r5: de-vacuated at sf0.001
    "url_host_dedup",
    "decontamination_span_removal",
    "winnowing_fingerprints",
    "near_dup_cluster_stats",
)
# Registered after the 50-slot head filled (preflight-green at both
# scales; vanilla-smoked): MUST lead the r6 rotation.
_QUEUED_FOR_NEXT_HEAD = (
    "scd2_user_state_history",
    "repeated_substring_profile",
    "bloom_filter_profile",
    "prefix_filter_jaccard_join",
)
# Driver-green in round 4 (CORRECTNESS_r04.json, 50/50); rotate to the
# tail so the 50-query window covers the unverified head first.
_STABLE_TAIL = (
    "minhash_jaccard_estimate",
    "corpus_mixture_plan",
    "ann_recall_at_k",
    "audio_header_meta",
    "incremental_ingest_dedup",
    "quality_filter_decision",
    "customer_value_ranks",
    "ivf_recall_at_k",
    "fixed_size_sample",
    "source_quality_rollup",
    "candidate_edit_distance",
    "lineitem_scalar_lab",
    "referential_integrity_audit",
    "props_variant_stats",
    "robust_outlier_mad",
    "event_funnel_transitions",
    "cohort_retention",
    "monthly_revenue_growth",
    "value_histogram",
    "sessionization",
    "repetition_profile",
    "embedding_label_stats",
    "multimodal_shard_meta",
    "pricing_summary",
    "revenue_by_segment",
    "customers_per_region",
    "customers_with_orders",
    "customers_without_orders",
    "order_size_histogram",
    "part_size_bands",
    "top_orders_per_customer",
    "customer_order_running",
    "lineitem_rollup",
    "orders_cube",
    "top_lineitems_global",
    "segment_symmetric_difference",
    "supplier_distinct_parts",
    "quantity_quantiles",
    "order_scalar_lab",
    "orders_grouping_sets",
    "daily_status_pivot",
    "json_props_profile",
    "machine_stream_union",
    "vibration_features",
    "downsample_1h",
    "record_envelope_flat",
    "envelope_reduced_features",
    "status_route_counts",
)


def _reorder() -> None:
    head = [n for n in _VERIFY_FIRST if n in REGISTRY]
    tail = [n for n in _STABLE_TAIL if n in REGISTRY]
    mid = [n for n in REGISTRY if n not in _VERIFY_FIRST and n not in _STABLE_TAIL]
    snapshot = {n: REGISTRY[n] for n in head + mid + tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
