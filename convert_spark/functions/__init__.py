"""Spark-facing function layer.

Two tiers, fastest first:

* ``exprs`` — pure Catalyst column expressions (JVM-side, whole-stage
  codegen): mercator projection + reference rounding, tile math, Morton
  cell ids. Zero Python in the hot path.
* ``udfs`` — vectorized pandas/Arrow UDFs wrapping the numpy kernels for
  what expressions can't say: DEM lookup (broadcast raster), S2 covering,
  text extraction, sketches.
"""
