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
from datapipeline_spike_spark.plans import catalog_r11  # noqa: F401  (r10 staged -> registered)

# The driver's per-round correctness harness samples the FIRST 50
# registry entries, so raw registration order (module import order, new
# queries appended at the tail) silently starves the newest queries of
# driver verification. Rotate each round: (1) queries whose code changed
# this round (MUST re-hash the same round), (2) new registrations,
# (3) the queue documented by the previous round, (4) the
# oldest-driver-verified remainder; the most recently driver-green
# block rotates to the tail. rotation_preflight() (run by the test
# suite and tools/rotation_preflight.py) mechanically enforces that
# every head name exists, the head is exactly at capacity, and the
# documented queue fits the next head — the r9 failure mode (six
# claimed-but-never-built names, a 30-entry head) cannot recur
# silently.

DRIVER_SAMPLE = 50

# --- r11 head, slot 1: NEW r11 registrations — the six r10-staged
# corpus-statistics / curation operators, registered in
# plans/catalog_r11 with the staging tests' DuckDB oracles verbatim ---
_R11_NEW = (
    "zipf_profile",                 # rank-frequency OLS distribution health
    "ngram_novelty_profile",        # leave-one-out trigram novelty
    "kneser_ney_bigram_score",      # interpolated-KN LM fluency
    "verdict_agreement_matrix",     # filter-calibration kappa matrix
    "dedup_span_removal",           # ExactSubstr duplicate-span scrubbing
    "temperature_mixture_plan",     # mT5/UNIMAX p ~ n^tau mixture
)
# --- r11 head, slot 2: code changed in round 11 (MUST re-hash) ---
_R11_CHANGED = (
    "hard_negative_pairs",          # r11: n_planes now data-derived in-plan
                                    # (VERDICT r10 item 4 — was pinned at 4)
    "curation_stage_profile",       # r11: stopped-context guard on the cache
                                    # free (results identical; re-hash per the
                                    # mechanical changed-code contract)
)
# --- r11 head, slot 3: the documented r11 queue — the r7-green
# remainder plus the two r6-greens displaced from the r10 head fill
# (oldest first, 38 names) — then the five OLDEST r8-greens, filling
# the head to exactly DRIVER_SAMPLE. ---
_R11_REFRESH = (
    # r7-green remainder + 2 displaced r6-greens (the r10 queue, verbatim)
    "multimodal_shard_meta",
    "machine_stream_union",
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
    # oldest r8-greens (head fill to capacity; pii_redaction was
    # displaced to the r12 queue front by the late-r11
    # curation_stage_profile changed-code slot)
    "document_chunks",
    "benchmark_contamination",
    "leakage_safe_split",
    "stratified_sample",
)

# r12 registration checklist (the r10->r11 staging pattern): SIX
# operators are STAGED with green DuckDB differential tests in
# tests/test_r11_staging.py — operators/quality.py
# (reliability_calibration_bins), operators/text_stats.py
# (token_distribution_drift, rouge_ngram_eval), and
# operators/similarity.py (embedding_centroid_drift, hubness_profile,
# ivfpq_topk — the IVF-PQ composite whose oracle composes the SHARED
# catalog_ml._sql_pq_ctes chain over a residual prelude).
# Their oracle SQL exists verbatim in the staging tests; registration
# is a catalog move: lift the SQL, alias columns identically, give
# each a head slot. Allowlist notes: reliability_calibration_bins and
# token_distribution_drift each carry a 1-row totals broadcast-cross
# (BNLJ_OK, the corpus_mixture_plan pattern); hubness_profile rides
# hard_negative_mining's auto-plane 1-row count cross (same BNLJ_OK
# argument); ivfpq_topk needs the kmeans_centroids-style note (corpus
# joins <= k broadcast codebook rows); rouge_ngram_eval /
# embedding_centroid_drift need none. Head-budget note: queue(43) +
# 6 new = 49, leaving ONE changed-code slot — if r12 changes more than
# one registered query, slide the queue's tail r9-greens (stale only 3
# rounds at r12) to the r13 queue to make room.

# --- r12 queue: the r8-green remainder (stale 4 rounds by r12 — all
# must refresh) followed by the oldest r9-greens, leaving ~8 head slots
# for r12 new/changed registrations ---
_QUEUED_FOR_NEXT_HEAD = (
    # displaced from the r11 head fill by the curation_stage_profile
    # changed-code slot
    "pii_redaction",
    # r8-green remainder (18)
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
    # oldest r9-greens (24 of 48; the rest stay in the tail)
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
    "hamming_recall_at_k",
    "random_projection_profile",
    "local_supplier_volume",
    "referential_integrity_audit",
    "paragraph_dedup_profile",
    "gopher_quality_rules",
    "c4_line_filters",
    "domain_cap_sample",
    "dsir_importance_weights",
    "pca_variance_profile",
    "promo_revenue_share",
)
# --- tail: most recently driver-green LAST-checked blocks — newest
# last is irrelevant to sampling (only the first 50 are hashed); kept
# ordered r9-green remainder then r10-green so the next rotation can be
# read off the file. ---
_R9_GREEN_TAIL = (
    "large_volume_orders",
    "branded_quantity_bands",
    "revenue_by_segment",
    "shipping_priority",
    "returned_item_losses",
    "fixed_size_sample",
    "cluster_balanced_sample",
    "snapshot_delta",
    "quality_classifier_score",
    "minhash_lsh_candidates",
    "simhash_neardup_pairs",
    "dedup_corpus_assignment",
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
)
_R10_GREEN_TAIL = (
    # the full r10 head (50/50 green in CORRECTNESS_r10), freshest block
    "forecast_revenue_change",
    "volume_shipping",
    "market_share",
    "customer_distribution",
    "waiting_suppliers",
    "global_sales_opportunity",
    "product_type_profit",
    "top_supplier_revenue",
    "supplier_part_types",
    "approx_percentile_bands",
    "semdedup_assignment",
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
    "source_quality_rollup",
    "lineitem_scalar_lab",
    "props_variant_stats",
    "robust_outlier_mad",
    "event_funnel_transitions",
    "cohort_retention",
    "monthly_revenue_growth",
    "value_histogram",
    "sessionization",
    "repetition_profile",
    "embedding_label_stats",
    "vibration_features",
)

_HEAD = list(_R11_NEW) + list(_R11_CHANGED) + list(_R11_REFRESH)
_R11_TAIL = list(_QUEUED_FOR_NEXT_HEAD) + [
    n
    for n in list(_R9_GREEN_TAIL) + list(_R10_GREEN_TAIL)
    if n not in _HEAD
]


def rotation_preflight(
    head: list[str] | None = None,
    queued: tuple[str, ...] | None = None,
    tail: list[str] | None = None,
) -> list[str]:
    """Mechanical rotation-capacity check (VERDICT r8 item 7 / r9 item
    4). Returns a list of human-readable problems; empty == sound. Run
    by the test suite (tests/test_entry.py) and by
    tools/rotation_preflight.py, so a head that lists unbuilt queries
    or misses capacity fails the build the same day it is written.
    The injectable parameters exist so the suite can prove each failure
    mode actually trips (the r9 head would have produced two problems);
    production callers pass nothing and check the live rotation."""
    _HEAD = head if head is not None else globals()["_HEAD"]
    _QUEUED_FOR_NEXT_HEAD = (
        queued if queued is not None else globals()["_QUEUED_FOR_NEXT_HEAD"]
    )
    _R11_TAIL = tail if tail is not None else globals()["_R11_TAIL"]
    problems: list[str] = []
    phantom = [n for n in _HEAD if n not in REGISTRY]
    if phantom:
        problems.append(f"head names not in REGISTRY (phantom): {phantom}")
    if len(set(_HEAD)) != len(_HEAD):
        dupes = sorted({n for n in _HEAD if _HEAD.count(n) > 1})
        problems.append(f"duplicate head names: {dupes}")
    want = min(DRIVER_SAMPLE, len(REGISTRY))
    live = [n for n in _HEAD if n in REGISTRY]
    if len(live) != want:
        problems.append(
            f"head capacity: {len(live)} live entries, driver samples {want}"
        )
    ghost_queue = [n for n in _QUEUED_FOR_NEXT_HEAD if n not in REGISTRY]
    if ghost_queue:
        problems.append(f"queued names not in REGISTRY: {ghost_queue}")
    overlap = set(_QUEUED_FOR_NEXT_HEAD) & set(_HEAD)
    if overlap:
        problems.append(f"queue/head overlap: {sorted(overlap)}")
    if len(_QUEUED_FOR_NEXT_HEAD) > DRIVER_SAMPLE:
        problems.append(
            f"queue ({len(_QUEUED_FOR_NEXT_HEAD)}) exceeds next head capacity"
        )
    ordered = set(_HEAD) | set(_R11_TAIL)
    unlisted = [n for n in REGISTRY if n not in ordered]
    listed_gone = [n for n in _R11_TAIL if n not in REGISTRY]
    if listed_gone:
        problems.append(f"tail names not in REGISTRY: {listed_gone}")
    if unlisted:
        problems.append(f"registered but unplaced by the rotation: {unlisted}")
    return problems


def _reorder() -> None:
    head = [n for n in _HEAD if n in REGISTRY]
    seen_tail: list[str] = []
    for n in _R11_TAIL:
        if n in REGISTRY and n not in head and n not in seen_tail:
            seen_tail.append(n)
    mid = [n for n in REGISTRY if n not in head and n not in seen_tail]
    snapshot = {n: REGISTRY[n] for n in head + mid + seen_tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
