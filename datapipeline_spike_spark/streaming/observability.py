"""Pipeline observability (SURVEY.md §2.4 A14 count monitors, modern
surface): ``DataFrame.observe`` attaches named aggregate metrics that
Spark computes AS the data flows — no second scan, no listener
plumbing for the common case. Batch queries read them from the
Observation handle; streaming queries surface them per micro-batch in
``StreamingQueryProgress.observedMetrics``, which is where a metrics
exporter (or the DLQ alert threshold of reference/README.md:102-104)
reads them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INGEST_METRICS = "ingest_metrics"


def with_ingest_metrics(
    records: DataFrame,
    value_col: str = "value",
    invalid_above: float = 100.0,
    name: str = INGEST_METRICS,
) -> DataFrame:
    """Attach the standard ingest counters (rows, invalid rows, null
    values) as observed metrics. Works on batch and streaming frames;
    the aggregates ride the existing scan — zero extra passes."""
    return records.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col(value_col) > invalid_above).cast("long")).alias("n_invalid"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_null"),
    )


def sum_observed(progresses, name: str = INGEST_METRICS) -> dict[str, int]:
    """Fold a streaming query's ``recentProgress`` into cumulative
    counters (each micro-batch reports its own observed row)."""
    totals: dict[str, int] = {}
    for p in progresses:
        row = (p or {}).get("observedMetrics", {}).get(name)
        if not row:
            continue
        # PySpark surfaces each batch's metrics as a Row
        items = row.asDict().items() if hasattr(row, "asDict") else row.items()
        for k, v in items:
            if v is not None:
                totals[k] = totals.get(k, 0) + int(v)
    return totals
