"""Entry-point A — the reference's main record path, assembled
(SURVEY.md §3.1): triaxial sample-batch records -> validity gate ->
time-domain + frequency-domain features -> PCA reduced features ->
quality metrics -> the nested enrichment envelope of
reference/README.md:501-539, field-for-field:

    raw_data / outlier_check / features.{time_domain,frequency_domain}
    / reduced_features.principal_components (3 values,
    reference/README.md:472-483,529) / quality_metrics (which carries
    processing_version + processing_timestamp inside it,
    reference/README.md:535-537).

One Column-expression chain shared by batch and streaming (the twin
rule, SURVEY §7.4.5): ``enrich_records`` works identically on a static
DataFrame and a streaming one, because every stage is a stateless
projection/filter. All per-record math runs on the embedded sample
arrays with higher-order functions — no explode, no shuffle. The ONLY
Python is the FFT pandas UDF behind ``include_frequency_domain``; the
OLAP flatten path disables it, so the warehouse projection plans zero
EvalPython nodes (three per-axis Arrow round-trips saved — Catalyst
cannot prune a Python UDF out of an unused struct field).

Engine-defined formulas (reference leaves the bodies unspecified,
SURVEY §7.4.1): validity = per-record crest-factor sanity (an impulsive
spike makes peak >> rms) plus non-empty batches; outlier_score =
min(max_axis_crest / 10, 1); quality = 0.5*completeness +
0.3*(1-outlier_score) + 0.2*consistency; applyPCA = projection of the
per-record feature vector onto 3 fixed orthonormal axes (a pretrained
quantizer — the reference's applyPCA body is a one-line call with no
training procedure, README.md:477). Features are quantized to their
wire precision before projection so the reduced features are
bit-reproducible across engines (and DuckDB-oracle-checkable).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipeline_spike_spark.functions import features as feat
from datapipeline_spike_spark.functions.spectral import dominant_frequency_bin
from datapipeline_spike_spark.operators.similarity import _plane

AXES = ("x", "y", "z")
PROCESSING_VERSION = "1.0"
CREST_VALID_MAX = 6.0  # |crest| above this flags an impulsive outlier record
N_OPERATIONS = 14  # OP01..OP14 (reference/TechSpikeDataPipeline.md:87-94)
PCA_K = 3  # reference/README.md:529 — 3 principal components
# per-axis quantized feature vector feeding the PCA projection:
# (rms, peak, peak_to_peak, crest_factor, kurtosis, mean_power) x 3 axes
PCA_DIM = 18


def _pca_loadings(k: int = PCA_K, dim: int = PCA_DIM) -> list[list[float]]:
    """The engine's 'pretrained' PCA axes: splitmix-hash pseudo-random
    vectors orthonormalized by QR, dominant loading forced positive.
    Deterministic at import (no RNG state) so the DuckDB oracle inlines
    the identical literals and replays the projection bit-for-bit."""
    raw = np.array([_plane(dim, seed=101 + i) for i in range(k)], dtype=np.float64)
    q, _ = np.linalg.qr(raw.T)  # columns are orthonormal
    comps = q.T[:k].copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return [[float(x) for x in row] for row in comps]


PCA_LOADINGS = _pca_loadings()

def principal_components(feats: list[Column]) -> Column:
    """array<double> of PCA_K projections of the quantized PCA_DIM
    feature vector onto PCA_LOADINGS. Left-associated multiply-add so
    the oracle's SQL evaluates the identical IEEE-754 op sequence."""
    pcs = []
    for loading in PCA_LOADINGS:
        acc = F.lit(loading[0]) * feats[0]
        for w, f in zip(loading[1:], feats[1:]):
            acc = acc + F.lit(w) * f
        pcs.append(F.round(acc, 4))
    return F.array(*pcs)


def principal_components_expr(feat_names: list[str]) -> Column:
    """String-expression twin of :func:`principal_components` over NAMED
    feature columns — ONE JVM parse instead of ~160 py4j Column calls
    (0.34 s of driver time per envelope build, r6). The SQL string is
    the same left-associated multiply-add chain (SQL + is
    left-associative; CAST from repr round-trips each weight exactly),
    so the op sequence — and every 4dp-rounded projection — is
    bit-identical to the Column form."""
    pcs = []
    for loading in PCA_LOADINGS:
        chain = " + ".join(
            f"CAST('{w!r}' AS DOUBLE) * {f}"
            for w, f in zip(loading, feat_names)
        )
        pcs.append(f"round({chain}, 4)")
    return F.expr("array(" + ", ".join(pcs) + ")")


def enrich_records(
    records: DataFrame,
    drop_invalid: bool = True,
    include_frequency_domain: bool = True,
) -> DataFrame:
    """records: one row per machine-window with ``vibration_{x,y,z}_batch``
    array columns, ``ts``, ``machine`` (optionally ``operation``),
    ``status_code``. Returns the nested envelope
    (reference/README.md:501-539). Invalid records are dropped when
    ``drop_invalid`` (the reference stops them at the gate,
    README.md:74-79).

    ``include_frequency_domain=False`` omits ``features.frequency_domain``
    — the only pandas-UDF (ArrowEvalPython) expression in the envelope —
    for consumers that never read it (the OLAP flatten path): the
    frequency struct is not prunable by Catalyst once planned, so opting
    out is the difference between a codegen-only stage and three
    per-axis Python round-trips. ``reduced_features`` stays in both
    modes (its spectral input is the HOF energy twin, not the FFT).

    Plan shape: the expensive per-axis array statistics are hoisted
    into a FLAT projection first and the envelope structs assemble from
    those columns in a second projection. Flat columns prune reliably
    (Catalyst does not trim unused fields out of a created struct, so
    the single-projection form made a downstream rms/peak/kurtosis
    flatten still pay for crest/peak_to_peak), each statistic is
    computed exactly once (crest reuses the hoisted rms and peak
    instead of re-deriving both), and CollapseProject leaves the split
    alone because the hoisted aliases are non-trivial and multiply
    referenced."""
    batches = {a: f"vibration_{a}_batch" for a in AXES}
    key_cols = [c for c in ("ts", "machine", "operation") if c in records.columns]

    stat_cols: list[Column] = []
    for a, c in batches.items():
        stat_cols += [
            feat.arr_rms(c).alias(f"_rms_{a}"),
            feat.arr_peak(c).alias(f"_peak_{a}"),
            feat.arr_peak_to_peak(c).alias(f"_p2p_{a}"),
            feat.arr_kurtosis(c).alias(f"_kurt_{a}"),
        ]
        if include_frequency_domain:
            stat_cols.append(feat.arr_energy(c).alias(f"_energy_{a}"))
    stats = records.select(
        *key_cols, *batches.values(), "status_code", *stat_cols
    )

    def crest(a: str) -> Column:
        return F.when(F.col(f"_rms_{a}") > 0, F.col(f"_peak_{a}") / F.col(f"_rms_{a}"))

    max_crest = F.greatest(*[F.coalesce(crest(a), F.lit(0.0)) for a in AXES])
    nonempty = [F.size(F.coalesce(F.col(c), F.array())) > 0 for c in batches.values()]
    is_valid = nonempty[0] & nonempty[1] & nonempty[2] & (max_crest <= CREST_VALID_MAX)
    outlier_score = F.least(max_crest / 10.0, F.lit(1.0))

    completeness = (
        sum(F.col(c).isNotNull().cast("int") for c in batches.values()).cast("double") / 3.0
    )
    consistency = (
        (F.size(F.coalesce(F.col(batches["x"]), F.array()))
         == F.size(F.coalesce(F.col(batches["y"]), F.array())))
        & (F.size(F.coalesce(F.col(batches["y"]), F.array()))
           == F.size(F.coalesce(F.col(batches["z"]), F.array())))
    )
    quality = (
        0.5 * completeness
        + 0.3 * (1.0 - outlier_score)
        + 0.2 * consistency.cast("double")
    )

    def axis_time_domain(a: str) -> Column:
        return F.struct(
            F.col(f"_rms_{a}").alias("rms"),
            F.col(f"_peak_{a}").alias("peak"),
            F.col(f"_p2p_{a}").alias("peak_to_peak"),
            crest(a).alias("crest_factor"),
            F.col(f"_kurt_{a}").alias("kurtosis"),
        )

    def axis_freq_domain(a: str) -> Column:
        return F.struct(
            dominant_frequency_bin(
                F.col(batches[a]).cast("array<double>")
            ).alias("dominant_bin"),
            F.col(f"_energy_{a}").alias("spectral_energy"),
        )

    features_fields = [
        F.struct(*[axis_time_domain(a).alias(a) for a in AXES]).alias("time_domain")
    ]
    if include_frequency_domain:
        features_fields.append(
            F.struct(*[axis_freq_domain(a).alias(a) for a in AXES]).alias(
                "frequency_domain"
            )
        )

    # quantized PCA input (wire precision: 6dp; kurtosis 4dp — two-pass
    # HOF moments vs a streaming kurtosis differ ~1e-6 on tiny groups).
    # The spectral slot is mean power = SQUARE OF THE QUANTIZED RMS
    # (equal to avg(v^2) = Parseval energy / n): squaring an
    # already-rounded double is bit-identical in any engine, where
    # re-summing v^2 in a different order flips rounding boundaries.
    # NULL features (empty batch, zero variance) NULL the projection via
    # standard SQL null propagation — identically in the oracle.
    pca_feats: list[Column] = []
    for a in AXES:
        rms_q = F.round(F.col(f"_rms_{a}"), 6)
        pca_feats += [
            rms_q,
            F.round(F.col(f"_peak_{a}"), 6),
            F.round(F.col(f"_p2p_{a}"), 6),
            F.round(crest(a), 6),
            F.round(F.col(f"_kurt_{a}"), 4),
            F.round(rms_q * rms_q, 2),
        ]
    # name the quantized features so the projection assembles from ONE
    # parsed string expression (principal_components_expr) instead of a
    # py4j-built multiply-add tree; the extra flat aliases vanish in the
    # final struct projection
    pca_names = [f"_pca_{i}" for i in range(len(pca_feats))]
    stats = stats.select(
        "*", *[f.alias(n) for f, n in zip(pca_feats, pca_names)]
    )

    out = stats.select(
        *key_cols,
        F.struct(
            *[F.col(c).alias(c) for c in batches.values()],
            F.col("status_code").alias("status_code"),
        ).alias("raw_data"),
        F.struct(
            is_valid.alias("is_valid"),
            F.round(outlier_score, 6).alias("outlier_score"),
        ).alias("outlier_check"),
        F.struct(*features_fields).alias("features"),
        F.struct(
            principal_components_expr(pca_names).alias("principal_components"),
        ).alias("reduced_features"),
        F.struct(
            F.round(quality, 6).alias("data_quality_score"),
            F.round(completeness, 6).alias("completeness"),
            consistency.alias("consistency"),
            F.lit(PROCESSING_VERSION).alias("processing_version"),
            F.current_timestamp().alias("processing_timestamp"),
        ).alias("quality_metrics"),
    )
    if drop_invalid:
        out = out.filter(F.col("outlier_check.is_valid"))
    return out


def operation_code(status_col: str = "event_type") -> Column:
    """Synthesized operation id OP01..OP14 (the reference's per-machine
    operation files, TechSpikeDataPipeline.md:87-94): a deterministic
    md5-word hash of the status/event column, portable to the SQL oracle
    as ('0x' || substr(md5(c),1,8))::BIGINT % 14 + 1."""
    word = F.conv(F.substring(F.md5(F.col(status_col)), 1, 8), 16, 10).cast("long")
    return F.concat(
        F.lit("OP"), F.lpad(((word % N_OPERATIONS) + 1).cast("string"), 2, "0")
    )


ENVELOPE_MAX_SAMPLES = 4096  # hard cap on per-group batch array length


def events_base(events: DataFrame) -> DataFrame:
    """The shared record-synthesis projection: non-null scalar events
    with derived ``machine`` (user parity) and ``operation``
    (md5-word hash of the event type, OP01..OP14)."""
    return (
        events.filter(F.col("value").isNotNull())
        .withColumn(
            "machine", F.concat(F.lit("M"), (F.col("user_id") % 2).cast("string"))
        )
        .withColumn("operation", operation_code("event_type"))
    )


def records_from_events(
    events: DataFrame, max_samples: int = ENVELOPE_MAX_SAMPLES
) -> DataFrame:
    """Synthesize reference-shaped triaxial records from the driver's
    scalar ``events`` stream: per (machine, operation, hour) the values
    collect into a batch array replicated across axes with deterministic
    per-axis offsets (testdata has one channel; the reference has
    three). Sorting keys the arrays deterministically. ``operation`` is
    synthesized from the event type (the OLAP grain is per
    machine/operation window, reference/TechSpikeDataPipeline.md:96-100,
    FeatureEngineeringApproaches.md:97).

    Group payload is O(``max_samples``), NOT O(scale factor): rows are
    ranked inside each group by event id (sort-based window — streams,
    never materializes the group) and only the first ``max_samples``
    survive to ``collect_list``, the same treatment the spectral path
    applies (catalog_ml.SPECTRAL_MAX_SAMPLES). The reference's real
    60-sample windows never hit the cap; the testdata's hour-wide
    stand-in groups grow linearly with scale factor and would otherwise
    be a per-group memory bomb at 100x. The window and the groupBy key
    on the same projected attributes, so Catalyst plans ONE exchange.
    Consumers that need only the flat OLAP aggregates should use
    :func:`flat_features_from_events` instead — no arrays at all."""
    from pyspark.sql import Window

    base = events_base(events).select(
        F.date_trunc("hour", "ts").alias("ts"),
        "machine",
        "operation",
        "event_id",
        "value",
        "event_type",
    )
    w = Window.partitionBy("ts", "machine", "operation")
    ranked = base.withColumn(
        "rn", F.row_number().over(w.orderBy("event_id"))
    ).filter(F.col("rn") <= max_samples)
    grouped = ranked.groupBy("ts", "machine", "operation").agg(
        F.array_sort(F.collect_list(F.struct("event_id", "value"))).alias("vs"),
        F.max("event_type").alias("status_code"),
    )
    vals = F.transform("vs", lambda s: s["value"])
    return grouped.select(
        "ts",
        "machine",
        "operation",
        vals.alias("vibration_x_batch"),
        F.transform(vals, lambda v: v + 1.0).alias("vibration_y_batch"),
        F.transform(vals, lambda v: v * 2.0).alias("vibration_z_batch"),
        "status_code",
    )


def flat_features_from_events(events: DataFrame) -> DataFrame:
    """Entry-point B at scale: the flat 9-feature OLAP row
    (reference/FeatureEngineeringApproaches.md:93-110) computed by
    direct scalar aggregation over the event stream — no batch arrays
    are materialized: the flat warehouse row needs none (only the
    envelope presentation does — that path is
    :func:`records_from_events` + :func:`enrich_records`,
    payload-capped at ENVELOPE_MAX_SAMPLES).

    Kurtosis is the two-pass population excess m4/m2^2 - 3 (exact group
    mean first, then centered moments — raw-moment expansion cancels
    catastrophically on near-constant groups, where a 1-ulp input
    difference between engines amplifies past 4dp rounding; centered
    sums are cancellation-free, so cross-engine drift stays ~1e-15
    relative). The per-group means come from window aggregates keyed on
    the SAME projected attributes as the groupBy, so Catalyst plans ONE
    exchange for both passes; the window buffer is a spillable row
    buffer, unlike a ``collect_list`` array value, so group size cannot
    OOM an executor."""
    from pyspark.sql import Window

    base = events_base(events).select(
        F.date_trunc("hour", "ts").alias("SourceTimestamp"),
        "machine",
        "operation",
        F.col("value").alias("v"),
    )
    w = Window.partitionBy("SourceTimestamp", "machine", "operation")
    withm = base.select(
        "*",
        F.avg("v").over(w).alias("_m_x"),
        F.avg(F.col("v") + 1.0).over(w).alias("_m_y"),
        F.avg(F.col("v") * 2.0).over(w).alias("_m_z"),
    )
    axes = {
        "x": F.col("v"),
        "y": F.col("v") + 1.0,
        "z": F.col("v") * 2.0,
    }
    aggs: list[Column] = []
    for a, t in axes.items():
        d = t - F.col(f"_m_{a}")
        m2 = F.avg(F.pow(d, 2))
        m4 = F.avg(F.pow(d, 4))
        aggs += [
            F.round(F.sqrt(F.avg(t * t)), 6).alias(f"vibration_{a}_rms"),
            F.round(F.max(F.abs(t)), 6).alias(f"vibration_{a}_peak"),
            F.round(
                F.when(m2 > 0, m4 / F.pow(m2, 2) - 3.0), 4
            ).alias(f"vibration_{a}_kurtosis"),
        ]
    return withm.groupBy("SourceTimestamp", "machine", "operation").agg(*aggs)


def flatten_envelope(enriched: DataFrame) -> DataFrame:
    """The warehouse projection (entry-point B shape): nested envelope ->
    the flat 9-feature row of the OLAP table at its per
    machine/operation grain
    (reference/FeatureEngineeringApproaches.md:93-110)."""
    cols = [F.col("ts").alias("SourceTimestamp"), "machine"]
    if "operation" in enriched.columns:
        cols.append(F.col("operation"))
    for a in AXES:
        for stat in ("rms", "peak", "kurtosis"):
            cols.append(
                F.col(f"features.time_domain.{a}.{stat}").alias(f"vibration_{a}_{stat}")
            )
    return enriched.select(*cols)
