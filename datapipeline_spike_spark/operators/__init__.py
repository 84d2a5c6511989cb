"""Composed operators: each module assembles built-in DataFrame ops into
an operator the reference implies (as-of joins, sessionization, dedup
families, similarity search, quality gates). Nothing here drops to RDDs;
Pandas UDF paths are isolated and documented where built-ins cannot
express the semantics (FFT, PCA, batched BLAS similarity)."""
