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

# --- r8 head, slot 1: changed/new code in round 8 ---
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
# Touched-but-not-re-hashed this round, documented per the rotation
# contract: these four consume lsh_candidate_pairs, whose r8 change is
# an ADDITIVE parameter (materialize flag, default unchanged) plus a
# fail-fast streaming guard — the default-path physical plan is
# byte-identical, all four are r7 driver-green, and all four were
# re-verified against the DuckDB oracle locally this round (0 failures).
# They lead the r9 head regardless.
_QUEUED_FOR_NEXT_HEAD = (
    "near_dup_cluster_stats",
    "minhash_jaccard_estimate",
    "ngram_jaccard_pairs",
    "candidate_edit_distance",
)
# Library operators built in r8 WITHOUT registry queries (the rotation
# contract forbids registering code that cannot get a driver slot the
# same round; the r8 head was exactly full). Each is tested and
# documented; r9 must register them (with oracles) and splice the new
# queries into the r9 head alongside the four queued above:
#   operators/ranks.py::approx_percentile_bands   (percent_rank scale path)
#   operators/quality.py::perplexity_buckets      (CCNet head/middle/tail)
#   operators/sampling.py::deterministic_shuffle  (training-shard assignment)
#   operators/dedup.py::paragraph_dedup           (paragraph-grain dedup)
#   operators/quality.py::bigram_logprob_score    (word-order LM fluency)
#   sources/multimodal.py::decode_audio_band_ratios (audio spectral tier)
#   sources/hdf5_native.py                        (S1 native decode tier; test-checked, no oracle by contract)
#   operators/cooccurrence.py::pmi_scores         (skip-gram co-occurrence + PMI, embedding-training prep)
#   operators/sampling.py::weighted_sample        (Efraimidis-Spirakis weighted k w/o replacement)
#   operators/sampling.py::budget_select          (token-budget curation cut, histogram threshold)
#   operators/dedup.py::select_canonical          (keep-best-copy survivor policy over assignments)
#   operators/html.py::html_to_text               (web front door: HTML->text + link-density boilerplate gate)
#   operators/curation.py::curate_corpus          (end-to-end assembly: html->paragraphs->quality->dedup-best->redact->budget->shards)
# Tail = most-recently driver-green first: the r7-green block
# (CORRECTNESS_r07.json, 48/50 hash + 2 rows-only-by-contract), then the
# r6-green block that has sat in the tail since r7 — none re-changed in
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


_HEAD = list(_R8_CHANGED) + list(_R8_HEAD_QUEUED)
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
