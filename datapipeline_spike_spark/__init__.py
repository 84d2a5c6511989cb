"""datapipeline_spike_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the Anvisimi/datapipeline-spike reference
(a CNC vibration-monitoring data-pipeline design spike: Kafka -> Node-RED
feature extraction -> Parquet lake + OLAP warehouse) as an idiomatic
Apache Spark engine: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the record path, Pandas UDFs only where built-in
operators cannot express the semantics (FFT, PCA).

Layout (SURVEY.md §7.1):
    session.py     SparkSession factory with pinned configs
    schemas.py     declared StructTypes (never infer in the engine)
    functions/     column-expression libraries (features, text, vectors)
    operators/     composed operators (windows, joins, dedup, similarity, quality)
    sources/       sources/sinks (parquet lake, kafka-shaped, multimodal)
    plans/         the driver-facing query registry + DuckDB oracle SQL
    streaming/     Structured Streaming assemblies (ST1-ST9, DLQ/retry)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API: the heavyweight imports (pyspark) happen on
    # first use, so `import datapipeline_spike_spark` stays cheap and
    # JVM-free for tooling.
    lazy = {
        "get_session": ("datapipeline_spike_spark.session", "get_session"),
        "REGISTRY": ("datapipeline_spike_spark.plans", "REGISTRY"),
        "enrich_records": ("datapipeline_spike_spark.pipeline", "enrich_records"),
        "flatten_envelope": ("datapipeline_spike_spark.pipeline", "flatten_envelope"),
        "dedup_corpus": ("datapipeline_spike_spark.operators.dedup", "dedup_corpus"),
        "brute_force_topk": ("datapipeline_spike_spark.operators.similarity", "brute_force_topk"),
        "lsh_bucket_topk": ("datapipeline_spike_spark.operators.similarity", "lsh_bucket_topk"),
        "ivf_topk": ("datapipeline_spike_spark.operators.similarity", "ivf_topk"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
