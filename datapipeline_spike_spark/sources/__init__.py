"""Sources & sinks (SURVEY.md §2.1 S1-S11): partitioned parquet lake,
kafka-shaped streaming I/O (gated on the kafka package being on the
classpath), and multimodal binary-column plumbing."""
