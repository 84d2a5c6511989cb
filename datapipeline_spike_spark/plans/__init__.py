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
# driver verification. Rotate each round: (1) queries whose code changed
# this round (MUST re-hash the same round), (2) the queue documented by
# the previous round, (3) the oldest-driver-verified remainder; the most
# recently driver-green block rotates to the tail.

# --- r7 head, slot 1: changed/new code in round 7 ---
_R7_CHANGED = (
    "maintenance_window_overlap",   # NEW r7: auto-width interval-overlap join
    "image_jpeg_pixel_features",    # NEW r7: baseline JPEG full decode
    "quality_classifier_score",     # NEW r7: linear quality-classifier inference
    "minhash_lsh_candidates",       # r7: hot-bucket chunked-join guard
    "dedup_corpus_assignment",      # r7: same guard via dedup_corpus
    "near_dup_cluster_stats",       # r7: shares lsh_candidate_pairs
    "minhash_jaccard_estimate",     # r7: shares lsh_candidate_pairs (sig path)
    "ngram_jaccard_pairs",          # r7: shares lsh_candidate_pairs
    "simhash_signatures",           # r7: quotable-id selectExpr fix
    "simhash_neardup_pairs",        # r7: hot-bucket salted-join guard
    "bpe_merge_training",           # r7: bounded-depth lineage (checkpoint_every)
    "audio_pcm_features",           # r7: malformed-payload NULL degradation
    "image_pixel_features",         # r7: same
    "bm25_ranked_retrieval",        # r7: doc-text fix (advice) — re-hash anyway
    "session_campaign_overlap",     # r7: interval_overlap_join signature/validation
    "candidate_edit_distance",      # r7: shares lsh_candidate_pairs
    "bpe_encoded_corpus_stats",     # NEW r7: BPE encode step (train->apply)
    "sq8_recall_at_k",              # NEW r7: int8 scalar-quantization recall audit
    "video_frame_features",         # NEW r7: MJPEG sample-table full decode
    "local_supplier_volume",        # NEW r7: TPC-H Q5 shape
    "returned_item_losses",         # NEW r7: TPC-H Q10 shape
    "priority_shipping_lag",        # NEW r7: TPC-H Q12 shape
    "cluster_balanced_sample",      # NEW r7: diversity-balanced sampling
    "bpe_fertility_by_lang",        # NEW r7: tokenizer fertility by language
    "fuzzy_contamination",          # NEW r7: MinHash-band cross-corpus decontamination
    "snapshot_delta",               # NEW r7: crawl-snapshot full-outer diff
    "semdedup_assignment",          # NEW r7: SemDeDup embedding-cluster dedup
)
# --- r7 head, slot 2: the r6-documented queue (r4-green relational
# queries rotated out of the r6 sample — the rotation contract says
# these MUST lead the r7 head) ---
_R7_HEAD_QUEUED = (
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
# --- r7 head, slot 3: the 2 rows-only-by-contract queries (last driver
# row r5) get their periodic rows-only refresh ---
_R7_ROWS_ONLY_REFRESH = ("dominant_frequency", "pca_reduce")
# --- r7 head, slot 4: oldest (r5-green) fill to exactly 50 ---
# (emptied late-r7: the fill slot went to the new semdedup_assignment —
# new code MUST be driver-hashed the round it lands; doc_rolling_hash is
# r5-green and moves to the front of the r8 queue, still within the
# nothing->3-rounds-unverified contract: gap rounds r6+r7, row in r8.)
_R7_OLDEST_FILL = ()
# Remaining r5-green queries outside the 50-slot window this round —
# MUST lead the r8 head (none of these is older than r5-green, and
# nothing in the registry goes >3 rounds without a driver row).
_QUEUED_FOR_NEXT_HEAD = (
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
    "shipping_priority",
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
# Driver-green in round 6 (CORRECTNESS_r06.json, 50/50) and not
# re-changed in r7: rotate to the tail.
_STABLE_TAIL = (
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

_HEAD = (
    list(_R7_CHANGED)
    + list(_R7_HEAD_QUEUED)
    + list(_R7_ROWS_ONLY_REFRESH)
    + list(_R7_OLDEST_FILL)
)
assert len(_HEAD) == 50 and len(set(_HEAD)) == 50, len(_HEAD)


def _reorder() -> None:
    ordered = _HEAD + [n for n in _QUEUED_FOR_NEXT_HEAD if n not in _HEAD]
    head = [n for n in ordered if n in REGISTRY]
    tail = [n for n in _STABLE_TAIL if n in REGISTRY and n not in ordered]
    mid = [n for n in REGISTRY if n not in ordered and n not in tail]
    snapshot = {n: REGISTRY[n] for n in head + mid + tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
