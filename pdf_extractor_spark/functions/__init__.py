"""Spark-side function surface: JVM column expressions (fast path) and
Arrow-batched pandas UDFs wrapping the pure kernels (only where built-ins
can't express the semantics)."""
