"""Query registry backing the driver contract (__spark_entry__.py).

Each entry pairs a Spark DataFrame builder with the ANSI-SQL string a
DuckDB oracle runs on the same parquet tables. Column names are aliased
identically on both sides (the driver's comparator sorts columns by name
before hashing values). Float-valued computed columns are rounded to 6
decimals on BOTH sides so hash comparison is immune to floating-point
association-order differences between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class EngineQuery:
    name: str
    spark: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = EngineQuery(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long of
    nanoseconds and is converted here to a microsecond timestamp —
    truncating exactly like DuckDB's ns->us coercion, so oracle
    comparisons agree.
    """
    from pyspark.sql import functions as F  # local import: registry stays importable without a JVM
    from pyspark.sql import types as T

    if table == "events":
        # runtime-settable SQL conf; required even when the caller did not
        # use datapipeline_spike_spark.session.get_session (the driver's
        # harness builds its own vanilla SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: float division of ~1e18 ns loses microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
