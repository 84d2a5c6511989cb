"""Driver-facing query catalog: every implemented operator from
SURVEY.md §2 is registered here as (Spark callable, DuckDB oracle SQL).
``__spark_entry__`` at the repo root re-exports this registry."""

from datapipeline_spike_spark.plans.registry import REGISTRY, EngineQuery, register  # noqa: F401
from datapipeline_spike_spark.plans import catalog  # noqa: F401  (populates REGISTRY)
from datapipeline_spike_spark.plans import catalog_relational  # noqa: F401
from datapipeline_spike_spark.plans import catalog_events  # noqa: F401
from datapipeline_spike_spark.plans import catalog_extensions  # noqa: F401
from datapipeline_spike_spark.plans import catalog_ml  # noqa: F401
from datapipeline_spike_spark.plans import catalog_r9  # noqa: F401  (r8 staged -> registered)
from datapipeline_spike_spark.plans import catalog_curation  # noqa: F401  (r9 curation funnel)

# The driver's per-round correctness harness samples the FIRST 50
# registry entries, so raw registration order (module import order, new
# queries appended at the tail) silently starves the newest queries of
# driver verification. Rotate each round: (1) queries whose code changed
# this round (MUST re-hash the same round), (2) the queue documented by
# the previous round, (3) the oldest-driver-verified remainder; the most
# recently driver-green block rotates to the tail.

# --- r9 head, slot 1: the r8 verification debt — the four queued
# lsh-consumer re-verifies documented by the r8 rotation contract
# (plans/__init__ r8: "They lead the r9 head regardless"), then the 12
# r8-staged operators now registered via plans/catalog_r9 ---
_R9_DEBT = (
    "near_dup_cluster_stats",
    "minhash_jaccard_estimate",
    "ngram_jaccard_pairs",
    "candidate_edit_distance",
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
)
# --- r9 head, slot 2: code changed in round 9 (MUST re-hash this
# round): the last two SF-scaling forced-broadcast removals (VERDICT r8
# What's-wrong item 1) ---
_R9_CHANGED = (
    "local_supplier_volume",        # r9: forced supplier broadcast hint dropped
    "referential_integrity_audit",  # r9: broadcast customer-key-set hint dropped
)
# --- r9 head, slot 3: NEW r9 registrations (each gets its driver slot
# this round per the rotation contract; appended as built) ---
_R9_NEW = (
    "curation_stage_profile",       # end-to-end curate_corpus funnel (VERDICT item 3)
    "paragraph_dedup_profile",      # last r8 library op without a registry row
    "approx_percentile_bands",      # registered scale path for customer_value_ranks
    "gopher_quality_rules",         # Rae 2021 heuristic quality gate
    "c4_line_filters",              # Raffel 2020 line-grain cleaning profile
    "domain_cap_sample",            # per-domain frequency cap (crawl curation)
    "forecast_revenue_change",      # TPC-H Q6 shape
    "volume_shipping",              # TPC-H Q7 shape
    "market_share",                 # TPC-H Q8 shape
    "customer_distribution",        # TPC-H Q13 shape
    "waiting_suppliers",            # TPC-H Q21 shape
    "global_sales_opportunity",     # TPC-H Q22 shape
)

# --- r8 head (now history; kept as the r9 rotation tail source) ---
_R8_CHANGED = (
    "dsir_importance_weights",      # landed late-r7: the ONLY never-driver-checked query — leads
    "pca_variance_profile",         # NEW r8: fixed-axis variance-explained oracle twin of pca_reduce
    "promo_revenue_share",          # NEW r8: TPC-H Q14 shape
    "large_volume_orders",          # NEW r8: TPC-H Q18 shape (aggregate-then-join)
    "branded_quantity_bands",       # NEW r8: TPC-H Q19 shape (disjunctive pushdown)
    "revenue_by_segment",           # r8: forced broadcast(customer) hint removed
    "shipping_priority",            # r8: same (also heads the r5-green queue)
    "local_supplier_volume",        # r8: same
    "returned_item_losses",         # r8: same
    "fixed_size_sample",            # r8: salted two-phase bottom-k replaces per-lang window
    "cluster_balanced_sample",      # r8: rewired onto the shared bottom_k_per_group helper
    "snapshot_delta",               # r8: shiftright floor-division parity fix
    "quality_classifier_score",     # r8: split into column-preserving core + projection
    "semdedup_assignment",          # r8: typed-empty id-type fix (shared k-means path)
    "minhash_lsh_candidates",       # r8: lsh_candidate_pairs streaming guard + materialize flag
    "simhash_neardup_pairs",        # r8: same guard/flag on the simhash builder
    "dedup_corpus_assignment",      # r8: end-to-end consumer of the changed lsh builder
)
# --- r8 head, slot 2: the r7-documented queue (r5-green queries rotated
# out of the r7 sample — the rotation contract says these MUST lead the
# r8 head; shipping_priority is already in slot 1) ---
_R8_HEAD_QUEUED = (
    "doc_rolling_hash",
    "kmeans_centroids",
    "spectral_energy",
    "tfidf_top_terms",
    "unigram_logprob_score",
    "language_id",
    "token_frequencies",
    "token_counting_methods",
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
    "late_shipment_priority",
    "small_quantity_revenue",
    "table_profile",
    "image_header_meta",
    "video_header_meta",
    "dominant_frequency_verified",
    "url_host_dedup",
    "decontamination_span_removal",
    "winnowing_fingerprints",
)
# Nothing queued for the r10 head: every operator registered this round
# has a driver slot this round (r9 head <= 50), and no registered
# query's code was touched without a head slot.
_QUEUED_FOR_NEXT_HEAD: tuple[str, ...] = ()
# Tail = most-recently driver-green first: the r8-green block
# (CORRECTNESS_r08.json, 50/50 hash — _R8_CHANGED + _R8_HEAD_QUEUED
# below), then the r7/r6-green remainder that has sat in the tail since
# r8. Anything unlisted keeps its registration order in the middle.
_STABLE_TAIL = (
    "maintenance_window_overlap",
    "image_jpeg_pixel_features",
    "simhash_signatures",
    "bpe_merge_training",
    "audio_pcm_features",
    "image_pixel_features",
    "bm25_ranked_retrieval",
    "session_campaign_overlap",
    "bpe_encoded_corpus_stats",
    "sq8_recall_at_k",
    "video_frame_features",
    "priority_shipping_lag",
    "bpe_fertility_by_lang",
    "fuzzy_contamination",
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
    "pricing_summary",
    "dominant_frequency",
    "pca_reduce",
    "scd2_user_state_history",
    "repeated_substring_profile",
    "bloom_filter_profile",
    "prefix_filter_jaccard_join",
    "scd2_steady_state",
    "incremental_dedup_steady_state",
    "embedding_topk_cosine",
    "ann_recall_at_k",
    "ivf_recall_at_k",
    "ann_ivf_flat",
    "ann_ivf_kmeans",
    "ann_lsh_bucket",
    "embedding_neardup_pairs",
    "embedding_dedup_assignment",
    "source_overlap_matrix",
    "pq_distortion_profile",
    "pq_adc_recall_at_k",
    "text_quality_profile",
    "record_envelope_flat",
    "envelope_reduced_features",
    "corpus_mixture_plan",
    "audio_header_meta",
    "incremental_ingest_dedup",
    "quality_filter_decision",
    "customer_value_ranks",
    "fixed_size_sample",
    "source_quality_rollup",
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
)


_HEAD = list(_R9_DEBT) + list(_R9_CHANGED) + list(_R9_NEW)
assert len(_HEAD) <= 50 and len(set(_HEAD)) == len(_HEAD), len(_HEAD)

# the r8-green 50 rotate to the tail front (most recently driver-green
# first), ahead of the older r7/r6-green block
_R9_TAIL = (
    [n for n in list(_R8_CHANGED) + list(_R8_HEAD_QUEUED) if n not in _HEAD]
    + [n for n in _STABLE_TAIL if n not in _HEAD]
)


def _reorder() -> None:
    ordered = _HEAD + [n for n in _QUEUED_FOR_NEXT_HEAD if n not in _HEAD]
    head = [n for n in ordered if n in REGISTRY]
    seen_tail: list[str] = []
    for n in _R9_TAIL:
        if n in REGISTRY and n not in ordered and n not in seen_tail:
            seen_tail.append(n)
    mid = [n for n in REGISTRY if n not in ordered and n not in seen_tail]
    snapshot = {n: REGISTRY[n] for n in head + mid + seen_tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
