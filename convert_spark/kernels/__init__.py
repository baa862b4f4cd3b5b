"""Pure-numpy geo/text kernels — no Spark imports.

Each module is independently unit-tested (tests/test_kernels_*.py) and is
invoked from Spark only through vectorized pandas/Arrow UDFs in
``convert_spark.functions`` (no per-row Python anywhere in the hot path).
"""
