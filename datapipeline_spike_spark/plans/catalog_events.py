"""Event-stream operator queries (SURVEY.md §2.2 P2, §2.4 A10-A13,
§2.8 JSON, §2.9 ST8/ST9 batch twins, §2.3 as-of) over the ``events``
table (≙ the reference's vibration record stream, FIXTURES.md §B).

Each is the batch twin of a streaming assembly in streaming/pipeline.py
— same column expressions, checkable by the DuckDB oracle (SURVEY §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_spike_spark.operators.joins import asof_join
from datapipeline_spike_spark.operators.quality import (
    completeness,
    consistency,
    quality_score,
    with_group_zscore,
)
from datapipeline_spike_spark.operators.sessions import latest_per_key, sessionize
from datapipeline_spike_spark.plans.registry import load, register

R = 6


@register(
    "dedup_latest_state",
    oracle="""
    SELECT user_id, event_type, event_id, ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="ST9 / Redis latest-state-per-key semantics "
    "(reference/README.md:280-289): keep the newest record per "
    "(machine, status) key. Streaming twin: dropDuplicatesWithinWatermark.",
    tags=("dedup", "window"),
)
def q_dedup_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id", "event_type"], "ts", "event_id").select(
        "user_id", "event_type", "event_id", "ts"
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events
    FROM sessions GROUP BY 1, 2
    """,
    doc="ST8 session windows, batch twin (gap = 30 min): lag + cumulative "
    "sum — one shuffle on the key. Streaming twin: F.session_window.",
    tags=("session", "window"),
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        .groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "outlier_gate",
    oracle=f"""
    WITH stats AS (
      SELECT event_type, avg(value) AS m, stddev_samp(value) AS s
      FROM events GROUP BY 1
    )
    SELECT e.event_type AS status_code,
           count(*) AS n_valid,
           round(max(abs((e.value - st.m) / st.s)), {R}) AS max_abs_z,
           round(avg(e.value), {R}) AS mean_valid_value
    FROM events e JOIN stats st ON st.event_type = e.event_type
    WHERE st.s > 0 AND abs((e.value - st.m) / st.s) <= 3.0
    GROUP BY 1
    """,
    doc="P2 validity gate + A13 outlier score (engine-defined |z|<=3 on "
    "per-status stats, SURVEY §7.4.1; reference/README.md:434-449 drops "
    "invalid records). Stats join is a broadcast of a 5-row aggregate — "
    "no window over the full stream.",
    tags=("quality", "filter"),
)
def q_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    scored = with_group_zscore(ev, "value", ["event_type"]).filter(
        (F.col("_std") > 0) & (F.abs(F.col("z")) <= 3.0)
    )
    return scored.groupBy(F.col("event_type").alias("status_code")).agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.round(F.max(F.abs(F.col("z"))), R).alias("max_abs_z"),
        F.round(F.avg("value"), R).alias("mean_valid_value"),
    )


@register(
    "quality_metrics",
    oracle=f"""
    SELECT event_type AS status_code,
           round(avg((CAST(value IS NOT NULL AS INT) + CAST(props IS NOT NULL AS INT)
                 + CAST(ts IS NOT NULL AS INT)) / 3.0), {R})          AS avg_completeness,
           CAST(sum(CASE WHEN value >= 0 AND value <= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
                                                                      AS n_consistent,
           round(avg(0.5 * ((CAST(value IS NOT NULL AS INT) + CAST(props IS NOT NULL AS INT)
                 + CAST(ts IS NOT NULL AS INT)) / 3.0)
                 + 0.3 * (1.0 - least(abs(value) / 1000.0, 1.0))
                 + 0.2 * CAST(value >= 0 AND value <= 1000000 AS INT)), {R})
                                                                      AS avg_quality_score
    FROM events
    GROUP BY 1
    """,
    doc="A10 completeness + A11 consistency + A12 composite quality "
    "score (engine-defined formulas, SURVEY §7.4.1; reference/"
    "README.md:488-498 quality stage). Pure column arithmetic.",
    tags=("quality", "aggregate"),
)
def q_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    comp = completeness(["value", "props", "ts"])
    cons = consistency((F.col("value") >= 0) & (F.col("value") <= 1_000_000))
    # outlier proxy bounded [0,1] without group stats: |value|/1000 capped
    out_score = F.least(F.abs(F.col("value")) / 1000.0, F.lit(1.0))
    q = quality_score(comp, out_score, cons)
    return ev.groupBy(F.col("event_type").alias("status_code")).agg(
        F.round(F.avg(comp), R).alias("avg_completeness"),
        F.sum(cons.cast("int")).cast("bigint").alias("n_consistent"),
        F.round(F.avg(q), R).alias("avg_quality_score"),
    )


@register(
    "json_props_profile",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
    doc="S9 JSON wire handling: per-path extraction (reference "
    "JSONPath column mapping, FeatureEngineeringApproaches.md:134-147) "
    "via get_json_object, typed cast, profile aggregation.",
    tags=("json",),
)
def q_json_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return ev.groupBy(
        F.get_json_object("props", "$.k").cast("bigint").alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "daily_status_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup
    FROM events GROUP BY 1
    """,
    doc="Pivot (wide daily status matrix — the Grafana-facing OLAP "
    "serving shape, reference/TechSpikeDataPipeline.md:66-68). Spark "
    ".pivot with explicit value list avoids an extra distinct pass.",
    tags=("pivot", "aggregate"),
)
def q_daily_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent cells; oracle's CASE-sum yields 0
    return out.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
                 for c in ("click", "view", "purchase", "error", "signup")]
    )


@register(
    "machine_stream_union",
    oracle="""
    SELECT event_type AS status_code, count(*) AS n,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_m01
    FROM events
    GROUP BY 1
    """,
    doc="§2.7 machine-stream merge (bosch-merged-data topic, "
    "FeatureEngineeringApproaches.md:152): two per-machine streams "
    "unioned by name then profiled — unionByName is a zero-shuffle "
    "concatenation of partitions.",
    tags=("setop", "union"),
)
def q_machine_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m01 = ev.filter(F.col("user_id") % 2 == 0).withColumn("machine", F.lit("M01"))
    m02 = ev.filter(F.col("user_id") % 2 == 1).withColumn("machine", F.lit("M02"))
    merged = m01.unionByName(m02)
    return merged.groupBy(F.col("event_type").alias("status_code")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("machine") == "M01").cast("int")).cast("bigint").alias("n_m01"),
    )


@register(
    "purchase_asof_signup",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(s.ts) FROM events s
            WHERE s.user_id = p.user_id AND s.event_type = 'signup'
              AND s.ts <= p.ts) AS asof_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
    doc="As-of join (SURVEY §2.3): each purchase matched to the latest "
    "prior signup of the same user. Engine uses the union + "
    "last-non-null window form (one shuffle + sort, linear — NOT the "
    "quadratic theta join the correlated-subquery oracle runs).",
    tags=("join", "asof", "window"),
)
def q_purchase_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = asof_join(purchases, signups, on=["user_id"], value_cols=[], tiebreak="event_id")
    return out.select("event_id", "user_id", "ts", "asof_ts")


@register(
    "rolling_baseline",
    oracle=f"""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), {R}) AS rolling_mean,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n_window
    FROM events
    """,
    doc="A13's rolling outlier baseline (SURVEY §2.5): trailing 10-row "
    "mean per machine — the frame the streaming outlier score reads.",
    tags=("window",),
)
def q_rolling_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w), R).alias("rolling_mean"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


@register(
    "robust_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ), mad AS (
      SELECT e.event_type, med, median(abs(e.value - med)) AS mad
      FROM events e JOIN med USING (event_type)
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type AS status_code,
           round(med, 6) AS median_value,
           round(mad, 6) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN abs(e.value - med) > 3 * 1.4826 * mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN mad USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="""Robust outlier detection via median absolute deviation (the
    A13 z-score gate's robust sibling): a wild outlier inflates the
    mean AND the stddev, masking itself from a z-gate; the median/MAD
    pair is breakdown-resistant, so |x - median| > 3 * 1.4826 * MAD
    (the normal-consistent scale factor) flags what z misses. Two
    passes by necessity (median, then median of absolute deviations —
    exact medians are not one-pass-mergeable), each a 5-group
    aggregation with the stats broadcast back; at 100 TB the exact
    median swaps for percentile_approx with the same topology.""",
    tags=("quality", "aggregate", "robust"),
)
def q_robust_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    flagged = F.when(
        F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad"), 1
    ).otherwise(0)
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy(
            F.col("event_type").alias("status_code"),
            F.round("med", 6).alias("median_value"),
            F.round("mad", 6).alias("mad"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(flagged).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "event_funnel_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type) OVER w AS next_type,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n_transitions,
           round(CAST(sum(gap_us) AS BIGINT) / count(*) / 1000000.0, 6)
             AS avg_gap_s
    FROM seq
    WHERE next_type IS NOT NULL AND gap_us <= 3600000000
    GROUP BY 1, 2
    """,
    doc="""Event funnel / transition matrix (the product-analytics
    staple on the sessionization substrate): per user order the stream,
    take each consecutive (event, next-event) pair within a 1-hour gap,
    and count transitions with the mean gap — the input to conversion
    funnels and Markov-style flow analysis. One keyed window (same
    shuffle class as sessionization: partition by user, sort by time)
    then a tiny |types|^2 aggregation; no self-join — the naive
    formulation joins the stream to itself on user and adjacency, which
    is quadratic per hot user.""",
    tags=("window", "funnel", "aggregate"),
)
def q_event_funnel_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds: a seconds-level cast would FLOOR and
    # silently disagree with any fractional-second oracle arithmetic;
    # the average divides ONCE after an exact integer sum
    gap_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    return (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
            gap_us.alias("gap_us"),
        )
        .filter(F.col("next_type").isNotNull() & (F.col("gap_us") <= 3_600_000_000))
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(
                F.sum("gap_us").cast("bigint") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("avg_gap_s"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(day_offset AS INT) AS day_offset,
           count(*) AS n_active_users
    FROM activity
    GROUP BY 1, 2
    """,
    doc="""Cohort retention matrix (the other product-analytics staple
    next to the funnel): users cohorted by first-seen day, counted as
    active per day-offset from their cohort — the triangle behind every
    retention curve. Shape: one groupBy-min for cohorts (user grain),
    join back (user-keyed, dim-like at |users| << |events|), distinct
    at (user, offset) grain, final small aggregation. Every shuffle is
    keyed by user or by the tiny (cohort, offset) pair — linear, no
    windows over the full stream needed.""",
    tags=("aggregate", "cohort", "retention"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


# Shared by the inline build AND the stored-table MERGE path below: a
# hash match on the SAME SQL from both proves commit -> fold -> read
# loses nothing vs deriving the history in one pass.
_SQL_SCD2 = """
    WITH lagged AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), runs AS (
      SELECT user_id, event_type, ts,
             sum(CASE WHEN rn = 1 OR event_type IS DISTINCT FROM prev
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM lagged
    ), starts AS (
      SELECT user_id, version, event_type,
             min(ts) AS valid_from, max(ts) AS last_event_ts
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(lead(valid_from) OVER w AS TIMESTAMP) AS valid_to,
           CAST(last_event_ts AS TIMESTAMP) AS last_event_ts,
           CAST(version AS INT) AS version,
           lead(valid_from) OVER w IS NULL AS is_current
    FROM starts
    WINDOW w AS (PARTITION BY user_id ORDER BY version)
"""


@register(
    "scd2_user_state_history",
    oracle=_SQL_SCD2,
    doc="""Type-2 slowly-changing-dimension history (the warehouse
    companion of dedup_latest_state: latest-state keeps the newest row,
    SCD2 keeps EVERY state interval): per user, consecutive runs of the
    same event_type collapse into one version with
    [valid_from, valid_to) validity and an is_current flag — the
    standard dimension-history table a MERGE-based warehouse maintains,
    derived here from the raw change stream in one pass. One keyed
    window (the sessionization shuffle class) feeds the run-collapse
    lag and the version cumsum; the per-version aggregate and the
    valid_to lead reuse the same user-hash partitioning — no second
    exchange, no self-join (the naive interval build joins the stream
    to itself on adjacency).""",
    tags=("window", "scd2", "warehouse"),
)
def q_scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.sessions import scd2_history

    return scd2_history(
        load(spark, sf_dir, "events"),
        keys=["user_id"],
        state_col="event_type",
        ts="ts",
        tiebreak="event_id",
    )


@register(
    "scd2_steady_state",
    oracle=_SQL_SCD2,
    doc="""Steady-state incremental SCD2 MERGE (the path a warehouse
    actually runs, and the stored-table twin of scd2_user_state_history
    — same oracle SQL by construction): the first half of the event
    stream (ts < Jan 16) is committed as a stored history table via
    ``warehouse.scd2_upsert`` (atomic ``v{N}`` + ``_CURRENT`` pointer
    commit), the second half is folded into the STORED table by a second
    ``scd2_upsert`` (per-key replay of interval boundary change points +
    rebuild of affected keys only), and the returned plan just READS the
    committed table — no event older than the fold batch is rescanned.
    A hash match against the full-recompute SQL proves the MERGE loses
    nothing versus deriving the history inline, for in-order batches
    (the standard warehouse MERGE assumption; the time split guarantees
    it per key). Closes VERDICT r5 gap #4; pattern copied from
    incremental_dedup_steady_state. The table commit happens at call
    time by design — it IS the warehouse side effect being simulated.""",
    tags=("window", "scd2", "warehouse", "storage"),
)
def q_scd2_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from datapipeline_spike_spark.sources.warehouse import (
        read_state_table,
        scd2_upsert,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    # per-pid table path: concurrent sessions (bench + driver) must not
    # clobber each other's committed versions
    table = os.path.join(
        tempfile.gettempdir(),
        "dps_scd2_tbl_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        + f"_{os.getpid()}",
    )
    import shutil

    shutil.rmtree(table, ignore_errors=True)  # fresh fold per plan build
    scd2_upsert(spark, table, ev.filter(F.col("ts") < cutoff),
                keys=["user_id"], state_col="event_type")
    scd2_upsert(spark, table, ev.filter(F.col("ts") >= cutoff),
                keys=["user_id"], state_col="event_type")
    stored = read_state_table(spark, table)
    return stored.select(
        "user_id", "event_type", "valid_from", "valid_to",
        "last_event_ts", F.col("version").cast("int").alias("version"),
        "is_current",
    )


# --- interval overlap join ---------------------------------------------------

_CAMP_BASE = 1_704_067_200        # 2024-01-01 00:00:00 UTC
_CAMP_STEP = 3 * 86_400 + 7 * 3_600   # staggered so windows are not bucket-aligned
_CAMP_SPAN = 2 * 86_400
_N_CAMPAIGNS = 8


@register(
    "session_campaign_overlap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ), sess AS (
      SELECT user_id, session_seq,
             min(ts) AS s_start, max(ts) AS s_end
      FROM sessions GROUP BY 1, 2
    ), camp AS (
      SELECT CAST(i AS INT) AS campaign_id,
             make_timestamp(({_CAMP_BASE} + i * {_CAMP_STEP}) * 1000000) AS c_start,
             make_timestamp(({_CAMP_BASE} + i * {_CAMP_STEP} + {_CAMP_SPAN}) * 1000000) AS c_end
      FROM range(0, {_N_CAMPAIGNS}) t(i)
    )
    SELECT campaign_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(least(epoch_us(s_end), epoch_us(c_end))
                    - greatest(epoch_us(s_start), epoch_us(c_start))) AS BIGINT)
             AS total_overlap_us
    FROM sess JOIN camp ON s_start <= c_end AND c_start <= s_end
    GROUP BY 1
    """,
    doc=f"""Interval-overlap join at LARGE x LARGE shape (the range-join
    case a broadcast band join cannot cover): user sessions (gap-30-min
    sessionization collapsed to [first, last] event intervals) overlap-
    join {_N_CAMPAIGNS} staggered campaign windows, then per campaign:
    overlapping sessions, distinct users, total overlap microseconds.
    Executed via ``operators.joins.interval_overlap_join``: each
    interval explodes into covered day buckets, candidates EQUI-join on
    the bucket id (hash-partitioned, AQE-skew-splittable — no
    nested-loop cross product), the exact closed-interval predicate
    filters bucket neighbors, and multi-bucket pairs dedup by the
    first-common-bucket identity — a filter, not a distinct shuffle.
    The oracle replays the overlap as a plain theta join (correct at
    oracle scale; the bucket decomposition is the 100 TB execution of
    the same semantics). Campaign windows derive in-plan from range() —
    no collect at build.""",
    tags=("join", "range", "interval", "session"),
)
def q_session_campaign_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.joins import interval_overlap_join
    from datapipeline_spike_spark.operators.sessions import sessionize

    ev = load(spark, sf_dir, "events")
    sess = (
        sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    camp = spark.range(_N_CAMPAIGNS).select(
        F.col("id").cast("int").alias("campaign_id"),
        F.timestamp_seconds(
            F.lit(_CAMP_BASE) + F.col("id") * _CAMP_STEP
        ).alias("c_start"),
        F.timestamp_seconds(
            F.lit(_CAMP_BASE) + F.col("id") * _CAMP_STEP + _CAMP_SPAN
        ).alias("c_end"),
    )
    joined = interval_overlap_join(
        sess, camp, ("s_start", "s_end"), ("c_start", "c_end")
    )
    overlap_us = F.least(
        F.unix_micros("s_end"), F.unix_micros("c_end")
    ) - F.greatest(F.unix_micros("s_start"), F.unix_micros("c_start"))
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(overlap_us).cast("bigint").alias("total_overlap_us"),
    )


_MWIN_BASE = _CAMP_BASE           # 2024-01-01 00:00:00 UTC
_MWIN_STEP = 4 * 3_600            # a window starts every 4 h
_MWIN_SHORT = 3_600               # typical: 1 h
_MWIN_LONG = 72 * 3_600           # every 25th window: 72 h (pathological)
_N_MWINS = 150


@register(
    "maintenance_window_overlap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ), sess AS (
      SELECT user_id, session_seq,
             min(ts) AS s_start, max(ts) AS s_end
      FROM sessions GROUP BY 1, 2
    ), wins AS (
      SELECT CAST(i AS INT) AS window_id,
             make_timestamp(({_MWIN_BASE} + i * {_MWIN_STEP}) * 1000000) AS w_start,
             make_timestamp(({_MWIN_BASE} + i * {_MWIN_STEP}
               + CASE WHEN i % 25 = 0 THEN {_MWIN_LONG} ELSE {_MWIN_SHORT} END)
               * 1000000) AS w_end
      FROM range(0, {_N_MWINS}) t(i)
    )
    SELECT window_id,
           (window_id % 25 = 0) AS is_long,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(least(epoch_us(s_end), epoch_us(w_end))
                    - greatest(epoch_us(s_start), epoch_us(w_start))) AS BIGINT)
             AS total_overlap_us
    FROM sess JOIN wins ON s_start <= w_end AND w_start <= s_end
    GROUP BY 1, 2
    """,
    doc=f"""Interval-overlap join with AUTO bucket width (r7): user
    sessions overlap-join {_N_MWINS} staggered maintenance windows —
    mostly 1 h, every 25th a pathological 72 h — via
    ``interval_overlap_join(bucket_seconds=None)``, which derives the
    bucket width IN-PLAN as the p95 of interval lengths across both
    sides (one 1-row aggregate broadcast to each side, no collect at
    build). The p95 choice bounds explode fan-out to ~1-2 buckets for
    95% of intervals while the 72 h windows prove long intervals stay
    exactly-once (first-common-bucket filter) and linear (B candidate
    rows for B covered buckets, never a cross product). The oracle
    replays the overlap as a plain theta join — results are bucket-
    width-independent by construction. Companion of
    ``session_campaign_overlap`` (fixed day buckets).""",
    tags=("join", "range", "interval", "auto-width"),
)
def q_maintenance_window_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipeline_spike_spark.operators.joins import interval_overlap_join
    from datapipeline_spike_spark.operators.sessions import sessionize

    ev = load(spark, sf_dir, "events")
    sess = (
        sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak="event_id")
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    wins = spark.range(_N_MWINS).select(
        F.col("id").cast("int").alias("window_id"),
        F.timestamp_seconds(F.lit(_MWIN_BASE) + F.col("id") * _MWIN_STEP).alias(
            "w_start"
        ),
        F.timestamp_seconds(
            F.lit(_MWIN_BASE)
            + F.col("id") * _MWIN_STEP
            + F.when(F.col("id") % 25 == 0, F.lit(_MWIN_LONG)).otherwise(
                F.lit(_MWIN_SHORT)
            )
        ).alias("w_end"),
    )
    joined = interval_overlap_join(
        sess, wins, ("s_start", "s_end"), ("w_start", "w_end"), bucket_seconds=None
    )
    overlap_us = F.least(
        F.unix_micros("s_end"), F.unix_micros("w_end")
    ) - F.greatest(F.unix_micros("s_start"), F.unix_micros("w_start"))
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(overlap_us).cast("bigint").alias("total_overlap_us"),
        )
        .select(
            "window_id",
            (F.col("window_id") % 25 == 0).alias("is_long"),
            "n_sessions",
            "n_users",
            "total_overlap_us",
        )
    )
