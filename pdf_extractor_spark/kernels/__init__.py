"""Pure-Python semantic kernels — no Spark imports allowed here.

These functions define the engine's golden semantics: the Spark pipeline (via
pandas UDFs in ``functions/``) must produce byte-identical results. Keeping
them dependency-free makes them directly unit-testable and usable both as the
golden generator and as the executor-side vectorized kernel.
"""
