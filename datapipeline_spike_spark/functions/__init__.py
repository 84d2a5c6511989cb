"""Column-expression libraries. Everything here returns pyspark Columns
built from built-in functions (JVM-side, whole-stage-codegen eligible);
pandas UDFs appear only in :mod:`spectral` (FFT) and :mod:`vectors`
(optional vectorized paths)."""

from datapipeline_spike_spark.functions import features, text, vectors  # noqa: F401
