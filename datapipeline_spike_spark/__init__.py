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
