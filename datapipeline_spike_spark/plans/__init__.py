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
from datapipeline_spike_spark.plans import catalog_r12  # noqa: F401  (r11 staged -> registered)
from datapipeline_spike_spark.plans import catalog_r13  # noqa: F401  (r12 staged -> registered r14)
from datapipeline_spike_spark.plans import catalog_r15  # noqa: F401  (r14 staged -> registered r15)
from datapipeline_spike_spark.plans import catalog_r16  # noqa: F401  (r14 wave-2 staged -> registered r16)
from datapipeline_spike_spark.plans import catalog_r17  # noqa: F401  (r14 waves 3-7 staged -> registered r17)
from datapipeline_spike_spark.plans import catalog_r18  # noqa: F401  (r17 wave-8 staged -> registered r18)
from datapipeline_spike_spark.plans import catalog_r19  # noqa: F401  (r17 wave-9 staged -> registered r19)

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

# --- r19 head, slot 1: NEW r19 registrations — the three r17-staged
# WAVE 9 operators, registered in plans/catalog_r19 with the staging
# tests' DuckDB oracles (tests/test_r17_staging.py — the oracle SQL
# now single-sourced in catalog_r19 and imported BACK by the staging
# module so the two can never drift; differential-green at both
# sf0.001 and sf0.01 via tools/staged_preflight.py). The wave's
# tie-break/NULL-guard hardening landed BEFORE this hash freeze per
# the rule: the ADVICE r17 string-id fix in r18 and the ADVICE r18
# NULL-score -inf coalesce in r19 itself (best_of_n_selection's
# min_by struct — a NULL-score candidate can never win best_id).
# Audit notes MEASURED at r17 staging: kcore is allowlist-CLEAN
# (ExistingRDD peel barriers + documented driver-side 1-row
# convergence counts; no BNLJ, no windows, no Python); diversity and
# best-of-n are pure keyed aggregates (clean — no allowlist
# entries). ---
_R19_NEW = (
    "kcore_membership",         # Seidman 1983 k=4 peel, 21/64 split
    "distinct_ngram_diversity", # Li 2016 distinct-1/distinct-2
    "best_of_n_selection",      # rejection-sampling argmax + pool stats
)
# --- r19 head, slot 2: the documented r19 queue (50 names, zero
# spare) minus its three tail names (machine_stream_union,
# maintenance_window_overlap, image_jpeg_pixel_features) slid to the
# r20 queue to fund the wave-9 slots per the budget rule (the
# r17/r18 precedent). No registered-query code changed this round
# outside the wave-9 registrations themselves (the ADVICE r18 fixes:
# the best_of_n NULL guard freezes WITH its first registration here;
# cache.py and streaming/observability.py are plan-neutral — no
# registered plan bytes change), so there is no changed-code slot.
# After r19 no registered name's latest driver-green is older than
# r15 (exactly four r15-greens remain: the three slid tails +
# simhash_signatures, heading the r20 queue). ---
_R19_REFRESH = (
    # slid from the r18 queue + the r14-green past the r18 budget
    "ann_recall_at_k",
    "ivf_recall_at_k",
    "video_frame_features",
    "audio_pcm_features",
    # r15-green stale block (r15 head minus r16/r17 re-hashes), oldest
    # 43 in head order
    "cdc_chunk_dedup",
    "boilerplate_line_removal",
    "url_canonical_dedup",
    "bradley_terry_strengths",
    "oov_rate_profile",
    "char_entropy_profile",
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
    "zipf_profile",
    "ngram_novelty_profile",
    "kneser_ney_bigram_score",
    "verdict_agreement_matrix",
    "dedup_span_removal",
    "temperature_mixture_plan",
    "hard_negative_pairs",
    "curation_stage_profile",
    "multimodal_shard_meta",
)

# --- r18 head (r18 driver-green block, now the freshest tail; kept
# verbatim as the rotation history) ---
# --- r18 head, slot 1: NEW r18 registrations — the three r17-staged
# WAVE 8 operators, registered in plans/catalog_r18 with the staging
# tests' DuckDB oracles (tests/test_r17_staging.py — the oracle SQL
# now single-sourced in catalog_r18 and imported BACK by the staging
# module so the two can never drift; differential-green at both
# sf0.001 and sf0.01 via tools/staged_preflight.py, 0 failures / 31
# re-verified this round after the ADVICE r17 edge-case hardening of
# min_k_prob_profile's k_frac domain). Allowlist entries were MEASURED
# at r17 staging and are inherited, not re-derived (BNLJ_OK all three:
# hits' per-half-step 1-row L1-total crosses, knn's auto-plane 1-row
# corpus count, min_k's 1-row smoothing totals; knn/min_k windows
# PARTITIONED, hits windowless; see tools/plan_audit.py). ---
_R18_NEW = (
    "hits_hub_authority",   # Kleinberg 1999 L1-normalized half-steps, K=3
    "knn_graph_edges",      # corpus-wide mutual-kNN over auto-plane LSH
    "min_k_prob_profile",   # Shi 2023 Min-K% Prob, integer-ranked tail
)
# --- r18 head, slot 2: the documented r18 queue (plans/__init__ r17
# edition, 50 names, zero spare) minus its three tail names
# (ann_recall_at_k, ivf_recall_at_k, video_frame_features) slid to the
# r19 queue to fund the wave-8 slots per the budget rule (the r17
# precedent). No registered-query code changed this round outside the
# wave-8 registrations themselves (the ADVICE fixes touched only
# staged operators; the unpersist mechanism is a NEW helper that
# leaves every registered query's plan byte-identical), so there is no
# changed-code slot. After r18 no registered name's latest
# driver-green is older than r15. ---
_R18_REFRESH = (
    "pca_variance_profile",
    "promo_revenue_share",
    "image_pixel_features",
    "watermark_greenlist_score",
    "quality_rank_normalize",
    "sequence_packing_plan",
    "doremi_domain_weights",
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
)


# --- r17 head, slot 1: NEW r17 registrations — the eleven r14-staged
# WAVE 3-7 operators, registered in plans/catalog_r17 with the staging
# tests' DuckDB oracles (tests/test_r14_staging_wave2.py,
# differential-green at both sf0.001 and sf0.01 via
# tools/staged_preflight.py — re-verified 0 failures / 25 in r16 —
# plus physical-plan shape pins applied at staging time). Allowlist
# entries were MEASURED at r16 staging and are inherited, not
# re-derived (PANDAS_OK video decode; BNLJ_OK frontier/vocab/
# band-tuning one each, rrf two; anchor/span/LPA/triangles/chat/dpo
# clean; see tools/plan_audit.py). ---
_R17_NEW = (
    "video_scene_cuts",              # MP4 walk + JPEG decode, shot islands
    "crawl_frontier_priority",       # pagerank x (1-dup)/depth schedule
    "anchor_text_stats",             # inbound anchor aggregation + top-k
    "span_corruption_plan",          # Raffel 2020 T5 length arithmetic
    "label_propagation_communities", # Raghavan 2007 synchronous LPA
    "vocab_overlap_matrix",          # pairwise source top-V Jaccard
    "minhash_band_tuning",           # LRU ch.3 S-curve design table
    "triangle_clustering",           # oriented a<b<c triangle counts
    "hybrid_rrf_retrieval",          # Cormack 2009 reciprocal-rank fusion
    "chat_turn_stats",               # SFT transcript structural gates
    "dpo_pair_plan",                 # Rafailov 2023 preference pairs
)
# --- r17 head, slot 2: the r17 changed-code slots (MEASURED r16, the
# ngram persist mechanism): the two remaining lazy-localCheckpoint
# sites converted to persist() — exact_substr_runs' kept frame
# (isolate chain: 6 -> 0 plan-build jobs) and dhash_neardup_pairs'
# hash frame (2 -> 0); the dhash edit also re-shapes
# sharded_neardup_pairs' cross passes to the asymmetric
# probe(i) x band(j) join over the NEW shared band/probe builders
# (_dhash_bands/_dhash_probes — total candidate volume now equals the
# monolithic join; full-recall equivalence property re-green), and
# audio_fingerprint_neardup reuses dhash_neardup_pairs so it re-hashes
# with it. Per the documented budget rule the queue's three tail names
# (pca_variance_profile, promo_revenue_share, image_pixel_features)
# slid to the r18 queue to fund these slots. ---
_R17_CHANGED = (
    "exact_substr_runs",
    "dhash_neardup_pairs",
    "audio_fingerprint_neardup",
)
# --- r17 head, slot 3: the documented r17 queue (the 39-name r13-stale
# block, mechanically derived in r16) minus the three tail names slid
# to the r18 queue to fund the changed-code slots ---
_R17_REFRESH = (
    "outlier_gate",
    # r12/r13-green remainder (35 of 38; the 3 tail names slid to r18)
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
)

# --- r16 head (r16 driver-green block, now the freshest tail; kept
# verbatim as the rotation history) ---
# --- r16 head, slot 1: NEW r16 registrations — the six r14-staged
# WAVE-2 operators, registered in plans/catalog_r16 with the staging
# tests' DuckDB oracles (tests/test_r14_staging_wave2.py,
# differential-green at both sf0.001 and sf0.01 via
# tools/staged_preflight.py before the move, physical-plan shape pins
# applied at staging time). Allowlist entries measured at registration
# (BNLJ_OK pagerank 1-row count/dangling crosses + matryoshka
# broadcast query-set baseline, PANDAS_OK audio VAD decode, WINDOW_OK
# curriculum plan-grain schedule window; see tools/plan_audit.py). ---
_R16_NEW = (
    "pagerank_host_authority",   # Page 1999 damped power iteration, K=3
    "code_detect_profile",       # keyword/symbol-density code routing
    "license_detect_profile",    # SPDX/copyleft-first license gate
    "matryoshka_recall_at_k",    # Kusupati 2022 truncation recall audit
    "audio_vad_segments",        # RIFF decode + energy-gated islands
    "curriculum_phase_plan",     # Bengio 2009 per-source ntile schedule
)
# --- r16 head, slot 2: the r16 changed-code slot.
# ngram_containment_pairs' shared kept-frame localCheckpoint(eager)
# moved to persist() this round — MEASURED root cause: under AQE even
# a LAZY localCheckpoint fires every upstream shuffle stage at
# plan-construction time (toRdd finalizes the adaptive plan), so the
# r15 eager->lazy pattern never actually removed the plan-build job;
# persist() does (0 build jobs, EXPLAIN free, one materialization
# shared by all four branches as InMemoryTableScan). Behavior
# unchanged, oracle re-hashed in this head. The same conversion is
# the measured r17 changed-code candidate for the two remaining
# lazy-checkpoint sites (exact_substr_runs, dhash_neardup_pairs —
# the latter re-hashes audio_fingerprint_neardup too). Per the
# documented budget rule the queue's tail r12-green (outlier_gate)
# slid to the r17 queue to fund this slot. ---
_R16_CHANGED = ("ngram_containment_pairs",)
# --- r16 head, slot 3: the documented r16 queue, verbatim from the
# r15 rotation minus the slid outlier_gate (bpe_merge_training — slid
# in r15 to fund the dhash slot — then bm25, the full r11-green
# remainder, then the 12 oldest r12/r13-greens) ---
_R16_REFRESH = (
    "bpe_merge_training",
    "bm25_ranked_retrieval",
    # r11-green remainder (30, the oldest-green block by r16)
    "session_campaign_overlap",
    "bpe_encoded_corpus_stats",
    "sq8_recall_at_k",
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
    "document_chunks",
    "benchmark_contamination",
    "leakage_safe_split",
    "stratified_sample",
    # oldest r12/r13-greens (11 of the 12 queued by r15; outlier_gate
    # slid to the r17 queue to fund the changed-code slot)
    "reliability_calibration_bins",
    "token_distribution_drift",
    "rouge_ngram_eval",
    "embedding_centroid_drift",
    "hubness_profile",
    "ivfpq_recall_at_k",
    "pii_redaction",
    "segment_dedup_profile",
    "context_pack_stats",
    "doc_fingerprint_dedup",
    "dedup_latest_state",
)

# --- r15 head (r15 driver-green block, now the freshest tail; kept
# verbatim as the rotation history) ---
# --- r15 head, slot 1: NEW r15 registrations — the eight r14-staged
# operators, registered in plans/catalog_r15 with the staging tests'
# DuckDB oracles (tests/test_r14_staging.py, differential-green at
# both sf0.001 and sf0.01 via tools/staged_preflight.py before the
# move). Registered corpora reuse the staging plants; allowlist
# entries measured at registration (BNLJ_OK boilerplate +
# bradley-terry 1-row crosses, PANDAS_OK audio decode; see
# tools/plan_audit.py). ---
_R15_NEW = (
    "exact_substr_runs",          # Lee 2022 ExactSubstr, gaps-and-islands
    "cdc_chunk_dedup",            # FastCDC-at-token-grain chunk dedup
    "boilerplate_line_removal",   # CCNet/RefinedWeb corpus-frequency lines
    "url_canonical_dedup",        # RFC-3986-flavored canonical groups
    "audio_fingerprint_neardup",  # WAV decode + generic banded-Hamming join
    "bradley_terry_strengths",    # Hunter 2004 MM pairwise strengths
    "oov_rate_profile",           # top-V vocabulary coverage
    "char_entropy_profile",       # char-bigram Shannon entropy gate
)
# --- r15 head, slot 2: the r15 changed-code slot. dhash_neardup_pairs'
# banded join was rewritten this round (8x8-bit bands -> 16-bit
# multi-probe, closing the r13/r14 n^2/32 candidate fan-out ceiling;
# output proven identical on the planted corpora and the registered
# slice, 30.1x candidate reduction measured in DHASH_PROBE_r15.json)
# — the mechanical contract says changed registered code re-hashes the
# same round. Per the documented r15 budget rule the queue's freshest
# r11-green (bpe_merge_training) slid to the r16 queue front to fund
# this slot. ---
_R15_CHANGED = ("dhash_neardup_pairs",)
# --- r15 head, slot 3: the documented r15 queue, verbatim from the
# r14 rotation minus the slid bpe_merge_training (the two displaced
# r14 fills, the 26 r10-greens — stale five rounds — then the 13
# oldest r11-greens) ---
_R15_REFRESH = (
    "ann_ivf_flat",
    "ann_ivf_kmeans",
    # r10-green remainder (26)
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
    # oldest r11-greens (13; bpe_merge_training slid to the r16 queue)
    "zipf_profile",
    "ngram_novelty_profile",
    "kneser_ney_bigram_score",
    "verdict_agreement_matrix",
    "dedup_span_removal",
    "temperature_mixture_plan",
    "hard_negative_pairs",
    "curation_stage_profile",
    "multimodal_shard_meta",
    "machine_stream_union",
    "maintenance_window_overlap",
    "image_jpeg_pixel_features",
    "simhash_signatures",
)

# --- r14 head (r14 driver-green block, now the freshest tail; kept
# verbatim as the rotation history) ---
# --- r14 head, slot 1: NEW r14 registrations — the six r12-staged
# operators, registered in plans/catalog_r13 with the staging tests'
# DuckDB oracles (hardened r13/r14 pre-freeze: dhash 8x8-band
# complete recall, doremi log-sum-exp shift, containment floor<=max
# validation). ngram_containment_pairs and dhash_neardup_pairs changed
# in r13 while staged, doremi_domain_weights changed in r14 while
# staged — their registration here satisfies the changed-code re-hash
# contract in one move. ---
_R14_NEW = (
    "watermark_greenlist_score",  # Kirchenbauer 2023 green-list z-score
    "quality_rank_normalize",     # per-source mid-rank quantile transform
    "ngram_containment_pairs",    # Broder containment, df-capped index
    "dhash_neardup_pairs",        # perceptual-hash image dedup, 8-band
    "sequence_packing_plan",      # two-phase-cumsum concat-and-chunk
    "doremi_domain_weights",      # Xie 2023 multiplicative weights
)
# --- r14 head, slot 2: the documented r13/r14 queue, verbatim from the
# r12 rotation (large_volume_orders displaced fill, the 21 r9-greens —
# stale five rounds — then the 20 oldest r10-greens), plus the TWO head
# fills (no registered-query code outside the six changed this round:
# the r14 HDF5/kafka-double hardening touches no registry entry, and
# the c4_line_filters fix is oracle-text-only with c4 already queued
# below) — the next two r10-greens slide up per the documented rule ---
_R14_REFRESH = (
    "large_volume_orders",
    # r9-green remainder (21)
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
    # oldest r10-greens (20 of 48)
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
    # r14 changed-code slot (wave 3): synthetic_mjpeg_mp4's container
    # assembly was extracted into the shared _mp4_from_jpeg_frames so
    # the scene-cut synth reuses it — byte-identical output (decode
    # regression asserted), but the registered video_frame_features
    # code path changed, so the mechanical contract gives it this
    # round's re-hash. The fill it displaced (ann_ivf_flat) slides to
    # the r15 queue front per the documented rule.
    "video_frame_features",
    # r14 changed-code slot: decode_audio_pcm_features moved from the
    # find(b"data") first-byte-match to the wav_data_offset chunk walk
    # (r14 review — results identical on chunk-clean WAVs, but the
    # mechanical contract says changed code re-hashes the same round).
    # The fill it displaced (ann_ivf_kmeans) slides to the r15 queue
    # front per the documented rule.
    "audio_pcm_features",
)

# --- r12 head (r12+r13 driver-green block, now the freshest tail; kept
# verbatim as the rotation history) ---
_R12_NEW = (
    "reliability_calibration_bins",  # Guo 2017 reliability-diagram table
    "token_distribution_drift",      # unigram KL/JS between snapshots
    "rouge_ngram_eval",              # Lin 2004 clipped-bigram ROUGE-N
    "embedding_centroid_drift",      # per-label centroid cosine/L2 shift
    "hubness_profile",               # Radovanovic 2010 k-occurrence skew
    "ivfpq_recall_at_k",             # Jegou 2011 IVF-PQ vs exact recall@5
)
# --- r12 head, slot 2: the documented r12 queue, verbatim from the
# r11 rotation (pii_redaction displaced from the r11 fill, the r8-green
# remainder — stale 4 rounds — then the 24 oldest r9-greens) ---
_R12_REFRESH = (
    "pii_redaction",
    # r8-green remainder (18). NOTE: image_header_meta and
    # video_header_meta below also satisfy the r12 changed-code
    # contract in place — decode_media gained the untrusted-dimension
    # guard this round (r12 fuzz; results identical on well-formed
    # media, oracles re-checked PASS at sf0.01)
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
    # oldest r9-greens (24)
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
    # the r12 changed-code slot (fills the head to exactly
    # DRIVER_SAMPLE): image_pixel_features' decoder gained the
    # short-scanline truncation guard this round (r12 review — results
    # identical on well-formed input, but the mechanical contract says
    # changed code re-hashes the same round). The queue fill it
    # displaced (large_volume_orders) slides to the r13 queue front
    # per the documented rule.
    "image_pixel_features",
)

# dominant_frequency / pca_reduce are PINNED to the permanent rotation
# tail (VERDICT r11 item 3): they are rows-only by declared contract
# (no oracle SQL), the driver's harness records only `err: no_oracle`
# for them, so a head slot spent there produces zero verification
# information. Their correctness evidence is carried by the oracle-green
# differential twins dominant_frequency_verified (r8, requeued above)
# and pca_variance_profile (r8, requeued above). They must never appear
# in a head or queue again.
_NO_ORACLE_PIN = (
    "dominant_frequency",
    "pca_reduce",
)

# r14 rotation status: the r12-staged six REGISTERED this round
# (plans/catalog_r13, oracle SQL lifted from tests/test_r12_staging.py
# with identical aliases; allowlist entries landed in
# tools/plan_audit.py — WINDOW_OK sequence_packing_plan, BNLJ_OK
# ngram_containment_pairs, PANDAS_OK dhash_neardup_pairs). Pre-freeze
# hardening: doremi log-sum-exp shift (ADVICE r12 overflow), dhash
# oracle twin ported to the 8x8-band layout + scattered-bit recall
# proof + max_hamming contract test, containment floor<=max
# validation. SCALE_PROBE_r12 baselines to hold (BENCH_DETAIL):
# watermark 23k, rank_normalize 43k, containment 5.2k, packing 7.9k,
# doremi 17.8k, dhash 1.96k docs/s at 10x.

# r15 rotation status: the r14-staged eight REGISTERED this round
# (plans/catalog_r15, oracle SQL lifted from tests/test_r14_staging.py
# with identical aliases; allowlist entries measured and landed in
# tools/plan_audit.py). Pre-freeze hardening: the dhash/audio shared
# banded join moved to 16-bit multi-probe (identical output, ~30x
# fewer candidates — DHASH_PROBE_r15.json), and chat_turn_stats'
# zero-token share semantics were pinned before the wave-7 hash
# freezes (ADVICE r14). The original staging checklist follows as
# history:
#
# r15 registration checklist (the r12->r13->r14 staging pattern): EIGHT
# operators are STAGED with green DuckDB differential tests in
# tests/test_r14_staging.py — operators/dedup.py (exact_substr_runs —
# Lee 2022 ExactSubstr via df-capped positional postings + diagonal
# islands; cdc_chunk_dedup — FastCDC-at-token-grain chunk dedup
# profile), operators/quality.py (boilerplate_line_removal — CCNet/
# RefinedWeb corpus-frequency line stripping), operators/html.py
# (url_canonical_dedup — RFC-3986-flavored canonicalization + dedup
# groups), sources/multimodal.py + operators/dedup.dhash_neardup_pairs
# reused generically (audio fingerprint near-dup pairs — name the
# registered query audio_fingerprint_neardup), and
# operators/preference.py (bradley_terry_strengths — Hunter 2004 MM),
# plus operators/text_stats.py (oov_rate_profile — top-V vocabulary
# coverage with a deterministic (count desc, token asc) boundary;
# char_entropy_profile — character-bigram Shannon entropy garbage
# gate). Oracle SQL exists verbatim in the staging tests; registration
# is a catalog move: lift the SQL, alias columns identically, give
# each a head slot. Allowlist notes (MEASURED on the staged plans at
# sf0.001): boilerplate_line_removal and bradley_terry_strengths plan
# BroadcastNestedLoopJoin (1-row corpus-count / pair-list broadcast
# cross) -> BNLJ_OK entries; audio_fingerprint_neardup plans
# MapInPandas (decode) -> PANDAS_OK; exact_substr_runs' scale-derived
# cap cross planned WITHOUT BNLJ at sf0.001 (re-check at registration
# — add BNLJ_OK only if the registered corpus plans one); cdc/substr
# windows are PARTITIONED (no WINDOW_OK); url/oov/entropy clean.
# SCALE_PROBE_r14 rates all rise at 10x (substr 643->4.3k, cdc
# 1.5k->5.5k, boilerplate 4.3k->11.4k, url 4.1k->9.1k, audio
# 1.2k->2.0k, bradley-terry 1.1k->8.7k docs/s). For the registered
# corpora reuse the staging plants (quote pages for substr, lined
# pages for boilerplate, deterministic URLs, doc_id-sliced audio
# families — consider the dhash doc_id%5=3 slice if pair volume at
# sf0.1 needs bounding).

# r16 rotation status: the r14-staged WAVE-2 six REGISTERED this round
# (plans/catalog_r16, oracle SQL lifted verbatim from
# tests/test_r14_staging_wave2.py with identical aliases; allowlist
# entries measured at registration and landed in tools/plan_audit.py).
# The changed-code slot went to ngram_containment_pairs' kept-frame
# localCheckpoint -> persist() (operators/dedup.py — behavior
# unchanged; kept-frame barrier 6 -> 0 plan-build jobs, end-to-end
# registered construction 10 -> 2, the residual 2 being load-boundary
# schema probes; see the r16 head slot-2 comment for the AQE-toRdd
# root cause that also corrects the r15 lazy-checkpoint claim). The
# original staging checklist follows as history:
#
# r16 staging pipeline (WAVE 2, staged r14 — the r15 head is full, so
# these six register in r16): tests/test_r14_staging_wave2.py holds
# green DuckDB differentials + planted-property tests for
# pagerank_host_authority (operators/graph.py — K=3 damped power
# iterations, dangling-mass redistribution, skewed deterministic host
# graph; oracle = unrolled 3-layer WITH chain), code_detect_profile +
# license_detect_profile (operators/detectors.py — map-only regex/
# translate batteries; corpora planted: code gate doc_id%7==2 with
# snippet family doc_id%3 — NOT %9, which is 0 mod 3 and starves two
# families; license gate doc_id%11 in (1,4,8) with license doc_id%5),
# matryoshka_recall (operators/similarity.py — registered-name
# suggestion matryoshka_recall_at_k; dims (8,16), vec_id<5 queries),
# audio_vad_segments (sources/multimodal.py — gated-WAV synth, real
# RIFF decode, exact int frame energies, islands), and
# curriculum_phase_plan (operators/curation.py — per-source ntile(4),
# bounded plan-grain interleave window). Oracle SQL verbatim in the
# staging tests. Allowlist notes (to re-measure at registration):
# pagerank_host_authority's 1-row count/dangling crosses -> BNLJ_OK;
# matryoshka/vad should ride the existing ANN/PANDAS precedents;
# curriculum's schedule window is plan-grain (sources x phases) ->
# WINDOW_OK with that bound documented. SCALE_PROBE_r14 wave-2 rows:
# all six rise at 10x (pagerank 707->8.2k, code 2.6k->100k, license
# 7.6k->78k, matryoshka 1.0k->8.7k vecs/s, vad 406->33.6k, curriculum
# 2.7k->8.2k docs/s). The streaming twin for the r14-staged
# boilerplate pass also landed (streaming/pipeline.
# boilerplate_stripped_stream + operators/quality.
# boilerplate_line_index; batch-twin test in tests/test_streaming.py).
#
# WAVE 3 (same file, same gauntlet — differentials + planted
# properties + plan pins + probes): video_scene_cuts
# (sources/multimodal.py — scene-gated MJPEG synth via the shared
# _mp4_from_jpeg_frames assembler, real sample-table walk + baseline
# JPEG decode, per-frame diff rows, running-cut shots),
# crawl_frontier_priority (operators/graph.py — pagerank x (1 -
# dup_rate) / mean_depth at host grain; dup via min-doc_id-per-path
# broadcast, no data-grain window), anchor_text_stats
# (operators/graph.py — inbound anchor aggregation, vocabulary-bounded
# count shuffle + partitioned top-k window), span_corruption_plan
# (operators/packing.py — T5 denoising length arithmetic, map-only,
# explicit floor(x+0.5) half-up on both engines). Registration notes,
# MEASURED r16 on the staging corpora at sf0.001 (all eleven staged
# plans run through the plan_audit rules; zero unpartitioned windows
# anywhere, so NO new WINDOW_OK class): video_scene_cuts MapInPandas
# -> PANDAS_OK (decode precedent); crawl_frontier_priority BNLJ x1
# (pagerank's final-iteration 1-row N/dangling cross — the earlier
# iterations' crosses now sit inside the checkpoint barriers) ->
# BNLJ_OK; vocab_overlap_matrix BNLJ x1 (bounded sources x sources
# pair cross) -> BNLJ_OK; minhash_band_tuning BNLJ x1 (generated-grid
# cross, no input table) -> BNLJ_OK; hybrid_rrf_retrieval BNLJ x2
# (broadcast query-set baseline per retriever branch,
# ann_recall_at_k precedent) -> BNLJ_OK; anchor_text_stats,
# span_corruption_plan, label_propagation_communities,
# triangle_clustering, chat_turn_stats, dpo_pair_plan all CLEAN (no
# allowlist entries).
#
# WAVE 4 (same file, same gauntlet): label_propagation_communities
# (operators/graph.py — synchronous LPA, smallest-label ties, per
# round one keyed join + a max_by argmax with NO window; the spam-farm
# companion to pagerank), vocab_overlap_matrix
# (operators/text_stats.py — pairwise source top-V vocabulary Jaccard,
# partitioned rank window on the vocabulary grain, bounded
# sources x sources pair cross), minhash_band_tuning
# (operators/sketches.py — the LSH S-curve design table over every
# (bands, rows) factorization; pure generated-grid projection, no
# input table; its queries() entry would take (spark, sf_dir) and
# ignore sf_dir — precedent for analytic tables).
#
# WAVE 5: triangle_clustering (operators/graph.py — oriented a<b<c
# triangle enumeration, two equi self-joins, per-vertex count +
# clustering coefficient; completes the web-graph family). A
# streaming license admission gate also landed
# (streaming/pipeline.license_gated_stream — the quality_gated_stream
# compliance sibling, stateless map-only, twin-tested).
#
# WAVE 6: rrf_fuse + hybrid_rrf_retrieval (operators/similarity.py —
# reciprocal-rank fusion over bounded top-k frames; the registered
# composition fuses the 8-dim Matryoshka prefix retriever with the
# exact full-width path).
#
# WAVE 7: chat_turn_stats + dpo_pair_plan (operators/sft.py — the
# instruction-tuning data family: transcript structural validation
# and DPO preference-pair construction; both windows partitioned,
# no self-joins).
#
# r16 REGISTRATION BUDGET (written r15, EXECUTED r16 — wave 2 is
# registered above; waves 3-7 remain staged for r17): 17 operators
# were staged across waves 2-7. A 50-slot head cannot absorb 17
# registrations + the r16 queue (bm25_ranked_retrieval front + the
# by-then-stale tail blocks) in one round — REGISTER IN TWO COHORTS,
# oldest-staged first: r16 takes the six wave-2 names + the r16 queue;
# r17 takes waves 3-7 (video_scene_cuts, crawl_frontier_priority,
# anchor_text_stats, span_corruption_plan,
# label_propagation_communities, vocab_overlap_matrix,
# minhash_band_tuning, triangle_clustering, hybrid_rrf_retrieval,
# chat_turn_stats, dpo_pair_plan).
# Every staged operator already carries its oracle SQL in
# tests/test_r14_staging_wave2.py; each cohort is the documented
# catalog move.
#
# r16 changed-code slot CANDIDATE — TAKEN in r16, with a measured
# correction: the planned eager=True -> eager=False move does NOT
# remove the plan-build job (AQE's toRdd executes upstream shuffle
# stages for a lazy localCheckpoint too); ngram_containment_pairs'
# kept frame moved to persist() instead (0 build jobs, measured).
# The other eager sites are inside iterative loops (BPE, dedup
# components) where checkpoint lineage-truncation is REQUIRED (the r7
# exponential-plan lesson) — do not blanket-convert.

# r17 rotation status: the r14-staged WAVE 3-7 eleven REGISTERED this
# round (plans/catalog_r17, oracle SQL lifted verbatim from
# tests/test_r14_staging_wave2.py with identical aliases; the
# plan-audit allowlist entries measured at r16 staging inherited, not
# re-derived). The changed-code slots went to the two remaining
# lazy-localCheckpoint sites, converted to persist() per the r16
# measured mechanism (exact_substr_runs kept frame 6 -> 0 plan-build
# jobs; dhash_neardup_pairs hash frame 2 -> 0 — re-hashing
# audio_fingerprint_neardup with it), and the dhash slot also carried
# the scheduled sharded-pass hoist: band/probe expressions now live in
# the shared _dhash_bands/_dhash_probes builders and
# sharded_neardup_pairs' cross passes join probe(i) x band(j)
# asymmetrically (total candidate volume now EQUALS the monolithic
# join; full-recall equivalence property tests re-green; the internal
# shard column is collision-guarded per ADVICE r16). Head budget: 11
# new + 3 changed + 36 queue = 50, zero spare — the queue's three tail
# names slid to the r18 queue per the documented rule. After r17 no
# registered name's latest driver-green is older than r14.
#
# r18 staging pipeline (WAVE 8, staged r17): tests/test_r17_staging.py
# holds green DuckDB differentials + planted-property tests + plan
# pins for hits_hub_authority (operators/graph.py — Kleinberg 1999
# L1-normalized half-steps, K=3, the hub/authority split PageRank
# conflates; oracle = unrolled 6-layer-per-iteration WITH chain over
# the shared _SQL_PR_GRAPH), knn_graph_edges
# (operators/similarity.py — corpus-wide approximate kNN graph over
# the auto-plane LSH buckets with per-edge mutuality, the SemDeDup/
# NN-Descent substrate; oracle replays the hard_negative_pairs
# auto-plane derivation), and min_k_prob_profile
# (operators/text_stats.py — Shi 2023 Min-K% Prob under the corpus
# add-one unigram LM; bottom-k selection ranked on INTEGER
# (count, token, position) so no float enters the ORDER BY). Both-SF
# preflight: pytest at sf0.001 + tools/staged_preflight.py at sf0.01,
# 0 failures / 28. Allowlist notes (MEASURED on the staged plans):
# all three plan the 1-row broadcast crosses only -> BNLJ_OK entries
# at registration (pagerank / hard_negative_pairs /
# unigram_logprob_score precedents, respectively); knn/min_k windows
# PARTITIONED; hits windows: none. The r18 head is fully budgeted by
# the 50-name queue, so registering wave 8 in r18 slides 3 queue
# tails to the r19 queue per the budget rule (the r17 precedent).
#
# WAVE 9 (same file, same gauntlet — register r19): kcore_membership
# (operators/graph.py — Seidman 1983 iterative peeling to a stable
# fixpoint with the connected-components driver-count convergence
# guard and KCoreNotConverged past the round budget; register at k=4
# on the host graph — k=3 keeps all 64 hosts, k=4 splits 21/64 with
# fixpoint in 4 rounds, measured; the staging oracle unrolls 8 rounds
# and the differential equality proves convergence within the
# unroll), distinct_ngram_diversity (operators/text_stats.py — Li
# 2016 distinct-1/distinct-2 per source, the synthetic-data
# mode-collapse detector; exact integer counts, two vocabulary-
# bounded aggregates), and best_of_n_selection (operators/sft.py —
# rejection-sampling stats: argmax by (rounded score, smallest
# NUMERIC id), pool mean/stddev_pop, selection gap; singletons kept,
# unlike DPO). Allowlist notes (measured at staging): kcore clean
# (ExistingRDD barriers, driver-side 1-row convergence counts —
# documented bounded collects); diversity and best-of-n clean (pure
# keyed aggregates). Wave 9's tie-break/NULL-guard hardening landed
# r18 (ADVICE r17) — BEFORE the r19 hash freeze, per the rule.
#
# WAVE 10 (staged r18 in tests/test_r18_staging.py, same gauntlet —
# REGISTRATION DECIDED r19 per VERDICT r18 item 3: wave 10 registers
# r20. The r19 queue carried 50 names with ZERO spare slots, so the
# queue math does NOT fund more than wave 9's three new slots this
# round; registering six would have displaced three additional
# r15-green queue names past the horizon unverified. r20's head is
# budgeted below as the r20 queue (50 names) minus the three tails
# its wave-10 slots will slide — since r20 is the final round that
# slide is recorded in the queue comment, not re-queued. Oracle SQL
# single-sources from tests/test_r18_staging.py into a
# plans/catalog_r20.py at the move; nn_descent needs BNLJ_OK per the
# measured note below; mind the AS MATERIALIZED oracle rule.):
# nn_descent_refine (operators/similarity.py — Dong 2011
# NN-Descent local joins over a MULTI-PROBE two-family LSH seed; a
# single-bucketing seed can never cross buckets, so the second
# splitmix plane family at seeds 101.. is load-bearing — the planted
# bridge test proves a pair split by BOTH bucketings is recovered
# through a shared neighbor; monotone-refinement property vs
# knn_graph_edges, 494/500 vectors strictly improved at sf0.001),
# exact_substr_char_runs (operators/dedup.py — Lee 2022's EXACT
# byte/char-grain ExactSubstr via stride-1 window counting + the
# gaps-and-islands merge; the oracle replays it content-grain with no
# hash prefilter, proving the engine's count-then-verify pipeline
# content-exact), and epoch_aware_domain_weights
# (operators/sampling.py — the DoReMi MW loop iterated through
# Muennighoff 2023 repeated-epoch value decay; decay=1 reduces
# EXACTLY to the registered doremi_domain_weights sequence, pinned by
# a staged equality test; the over-epoch self-limiting property is
# planted). Both-SF preflight: 0 failures / 34. Allowlist notes
# (MEASURED at r18 staging): nn_descent BNLJ x8 rendered — all the
# same 1-row auto-plane corpus-count cross repeated per
# InMemoryTableScan reference of the persisted coded frame ->
# BNLJ_OK at registration; char_runs and epoch_weights clean (keyed
# aggregate + equi-join + partitioned windows / 1-row assembled-array
# posture). Oracle NOTE: the epoch oracle's CTE chain must stay AS
# MATERIALIZED — default DuckDB CTE inlining duplicates each
# doubly-referenced layer per reference = 2^iters base-scan
# expansions (the r7 exponential-plan lesson, oracle edition).

# --- r20 queue (50 names, ZERO spare slots — wave 10 registers r20,
# so its three new names slide the queue's 3 tail names off the
# budget per the rule; since r20 is the final round the slide is
# recorded, not re-queued). Order: mechanically derived from the
# rotation history this round (latest-green per name across the
# r14..r19 heads, oldest-green first, block order within a round):
# the 3 names slid from the r19 queue + the single r15-green past
# the r19 budget (simhash_signatures) are the only r15-greens left,
# then the r16-green block (the r16 head in head order), truncated
# at 50 — the r16-green tail (segment_dedup_profile onward) stays in
# the rotation tail. ---
_QUEUED_FOR_NEXT_HEAD = (
    # slid from the r19 queue + the r15-green past the r19 budget
    "machine_stream_union",
    "maintenance_window_overlap",
    "image_jpeg_pixel_features",
    "simhash_signatures",
    # r16-green stale block (the r16 head in head order), oldest 46
    "pagerank_host_authority",
    "code_detect_profile",
    "license_detect_profile",
    "matryoshka_recall_at_k",
    "audio_vad_segments",
    "curriculum_phase_plan",
    "ngram_containment_pairs",
    "bpe_merge_training",
    "bm25_ranked_retrieval",
    "session_campaign_overlap",
    "bpe_encoded_corpus_stats",
    "sq8_recall_at_k",
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
    "document_chunks",
    "benchmark_contamination",
    "leakage_safe_split",
    "stratified_sample",
    "reliability_calibration_bins",
    "token_distribution_drift",
    "rouge_ngram_eval",
    "embedding_centroid_drift",
    "hubness_profile",
    "ivfpq_recall_at_k",
    "pii_redaction",
)
# --- tail: most recently driver-green blocks, oldest first (only the
# first 50 are hashed; the order documents the next rotations). The
# r10/r11 names promoted into the r15 queue above are filtered out of
# these blocks at assembly time. ---
_R10_GREEN_TAIL = (
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
_R11_GREEN_TAIL = (
    # the full r11 head minus the two no-oracle pins (48/48 hash-green
    # in CORRECTNESS_r11), freshest block
    "zipf_profile",
    "ngram_novelty_profile",
    "kneser_ney_bigram_score",
    "verdict_agreement_matrix",
    "dedup_span_removal",
    "temperature_mixture_plan",
    "hard_negative_pairs",
    "curation_stage_profile",
    "multimodal_shard_meta",
    "machine_stream_union",
    "maintenance_window_overlap",
    "image_jpeg_pixel_features",
    "simhash_signatures",
    "bpe_merge_training",
    "audio_pcm_features",
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
    "document_chunks",
    "benchmark_contamination",
    "leakage_safe_split",
    "stratified_sample",
)

_HEAD = list(_R19_NEW) + list(_R19_REFRESH)
# tail: the r20 queue first (the documented next head), then every
# remaining block oldest-green first (the r16-green tail past the
# r20 budget — segment_dedup_profile onward — surfaces first, then
# the r17/r18-green blocks), pins last
_TAIL = list(_QUEUED_FOR_NEXT_HEAD) + [
    n
    for n in list(_R10_GREEN_TAIL)
    + list(_R11_GREEN_TAIL)
    + list(_R12_NEW)
    + list(_R12_REFRESH)
    + list(_R14_NEW)
    + list(_R14_REFRESH)
    + list(_R15_NEW)
    + list(_R15_CHANGED)
    + list(_R15_REFRESH)
    + list(_R16_NEW)
    + list(_R16_CHANGED)
    + list(_R16_REFRESH)
    + list(_R17_NEW)
    + list(_R17_CHANGED)
    + list(_R17_REFRESH)
    + list(_R18_NEW)
    + list(_R18_REFRESH)
    if n not in _HEAD
] + list(_NO_ORACLE_PIN)


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
    _TAIL = tail if tail is not None else globals()["_TAIL"]
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
    pinned_resurfaced = (set(_NO_ORACLE_PIN) & set(_HEAD)) | (
        set(_NO_ORACLE_PIN) & set(_QUEUED_FOR_NEXT_HEAD)
    )
    if pinned_resurfaced:
        problems.append(
            "no-oracle queries pinned to the permanent tail appear in the "
            f"head/queue: {sorted(pinned_resurfaced)}"
        )
    ordered = set(_HEAD) | set(_TAIL)
    unlisted = [n for n in REGISTRY if n not in ordered]
    listed_gone = [n for n in _TAIL if n not in REGISTRY]
    if listed_gone:
        problems.append(f"tail names not in REGISTRY: {listed_gone}")
    if unlisted:
        problems.append(f"registered but unplaced by the rotation: {unlisted}")
    return problems


def _reorder() -> None:
    head = [n for n in _HEAD if n in REGISTRY]
    seen_tail: list[str] = []
    for n in _TAIL:
        if n in REGISTRY and n not in head and n not in seen_tail:
            seen_tail.append(n)
    mid = [n for n in REGISTRY if n not in head and n not in seen_tail]
    snapshot = {n: REGISTRY[n] for n in head + mid + seen_tail}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder()
