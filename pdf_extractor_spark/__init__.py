"""pdf_extractor_spark — a from-scratch, PySpark-native analytics/extraction engine.

Reimplements the query and data-processing capabilities of the reference
``avichay-be/pdf-extractor`` (a FastAPI per-document extraction microservice) as
idiomatic Spark: declarative DataFrame plans, vectorized Arrow/pandas UDFs (no
per-row Python), explicit partitioning/skew handling, and a per-partition
lineage manifest for idempotent resume.

Layout:
    kernels/    pure-Python semantic kernels (golden-defining, no Spark deps)
    functions/  Spark Column expressions + pandas UDFs wrapping the kernels
    operators/  DataFrame-level transforms (routing, extraction, dedup, ANN, ...)
    sources/    input readers + deterministic synthetic generators
    plans/      end-to-end jobs (extraction pipeline, manifest/resume)
    streaming/  incremental-processing notes/adapters (reference is batch-only)
"""

__version__ = "0.1.0"
