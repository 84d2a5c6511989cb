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
    # --- r6 head, slot 1: the 4 queries registered late in r5 that have
    # NEVER had a driver CORRECTNESS row (judge-local PASS only).  The r5
    # sample was exactly the previous head, so these MUST lead or they
    # starve a second round (VERDICT r5 finding 1 / advice item 1). ---
    "scd2_user_state_history",
    "repeated_substring_profile",
    "bloom_filter_profile",
    "prefix_filter_jaccard_join",
    # --- r6 head, slot 2: queries whose code changes in round 6 are
    # appended here as they land (rotation rule: changed code must be
    # driver-re-hashed the same round). ---
    # (populated during r6; see _R6_CHANGED below)
    # --- r6 head, slot 3: last driver-verified in round 4 (rotated out
    # of the r5 sample) — oldest-first fill of the 50-slot window.  Any
    # overflow past 50 lands at the start of the r7 head. ---
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
    "machine_stream_union",
    "vibration_features",
    "downsample_1h",
    "record_envelope_flat",
    "envelope_reduced_features",
    "status_route_counts",
    "json_props_profile",
    "daily_status_pivot",
    "orders_grouping_sets",
    "order_scalar_lab",
    "quantity_quantiles",
    "supplier_distinct_parts",
    "segment_symmetric_difference",
    "top_lineitems_global",
    "orders_cube",
    "lineitem_rollup",
    "customer_order_running",
    "top_orders_per_customer",
    "part_size_bands",
    "order_size_histogram",
    "customers_without_orders",
    "customers_with_orders",
    "customers_per_region",
    "revenue_by_segment",
    "pricing_summary",
)
# Changed/new in round 6 — spliced in right after the never-verified
# block so the driver re-hashes them this round.
_R6_CHANGED = (
    "scd2_steady_state",               # NEW r6: stored-table SCD2 MERGE fold
    "incremental_dedup_steady_state",  # r6: per-pid index tmp dir (advice)
    "embedding_topk_cosine",           # r6: fan_out dropped (fixed-overhead fix)
    "ann_recall_at_k",                 # r6: shares brute_force_topk + lsh planes
    "ivf_recall_at_k",                 # r6: shares brute_force_topk + ivf cmat
    "ann_ivf_flat",                    # r6: centroid matrix via one F.expr
    "ann_ivf_kmeans",                  # r6: same (trained-centroid path)
    "ann_lsh_bucket",                  # r6: lsh planes via one F.expr
    "embedding_neardup_pairs",         # r6: shares lsh_bucket_assign
    "embedding_dedup_assignment",      # r6: shares lsh_bucket_assign
    "simhash_signatures",              # r6: string-expr plan build
    "simhash_neardup_pairs",           # r6: shares simhash64
    "bm25_ranked_retrieval",           # NEW r6: BM25 ranked retrieval
    "source_overlap_matrix",           # NEW r6: cross-source overlap matrix
    "pq_distortion_profile",           # NEW r6: product-quantization codebooks
    "pq_adc_recall_at_k",              # NEW r6: ADC top-k recall audit
    "audio_pcm_features",              # NEW r6: full-decode audio features
    "image_pixel_features",            # NEW r6: full-decode image features
    "session_campaign_overlap",        # NEW r6: bucketized interval-overlap join
    "text_quality_profile",            # r6: tokenize-once named column
    "bpe_merge_training",              # NEW r6: on-engine BPE tokenizer training
    "record_envelope_flat",            # r6: PCA projections via one parsed expr
    "envelope_reduced_features",       # r6: same (shares enrich_records)
)
# Head overflow past the driver's 50-slot sample window: these r4-green
# relational queries spill to round 7 if _R6_CHANGED grows.  (The four
# r5-queued queries now LEAD _VERIFY_FIRST — consumed, per the rule.)
_QUEUED_FOR_NEXT_HEAD = (
    # slots 50-70 after the 23 _R6_CHANGED splices — outside the
    # driver's 50-query window this round; r4-green queries, the
    # lowest-risk spill class (changed code MUST verify this round;
    # these wait one). MUST lead the r7 rotation.
    "downsample_1h",
    "status_route_counts",
    "json_props_profile",
    "daily_status_pivot",
    "orders_grouping_sets",
    "order_scalar_lab",
    "quantity_quantiles",
    "supplier_distinct_parts",
    "segment_symmetric_difference",
    "top_lineitems_global",
    "orders_cube",
    "lineitem_rollup",
    "customer_order_running",
    "top_orders_per_customer",
    "part_size_bands",
    "order_size_histogram",
    "customers_without_orders",
    "customers_with_orders",
    "customers_per_region",
    "revenue_by_segment",
    "pricing_summary",
)
# Driver-green in round 4 (CORRECTNESS_r04.json, 50/50); rotate to the
# tail so the 50-query window covers the unverified head first.
# Driver-green in round 5 (CORRECTNESS_r05.json, 50/50): rotate to the
# tail so the 50-query window covers the r4-green + never-verified head.
_STABLE_TAIL = (
    "dedup_corpus_assignment",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "embedding_dedup_assignment",
    "ngram_jaccard_pairs",
    "unigram_logprob_score",
    "tfidf_top_terms",
    "spectral_energy",
    "dominant_frequency",
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
    "incremental_dedup_steady_state",
    "dominant_frequency_verified",
    "url_host_dedup",
    "decontamination_span_removal",
    "winnowing_fingerprints",
    "near_dup_cluster_stats",
)


def _reorder() -> None:
    ordered = list(_VERIFY_FIRST[:4]) + [
        n for n in _R6_CHANGED if n not in _VERIFY_FIRST[:4]
    ] + [n for n in _VERIFY_FIRST[4:] if n not in _R6_CHANGED]
    head = [n for n in ordered if n in REGISTRY]
    tail = [n for n in _STABLE_TAIL if n in REGISTRY]
    mid = [n for n in REGISTRY if n not in _VERIFY_FIRST and n not in _STABLE_TAIL]
    snapshot = {n: REGISTRY[n] for n in head + mid + tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
