"""convert_spark — a brand-new PySpark-native spatial-join + tiling engine.

Re-expresses the semantics of the reference converter (lumin8/convert,
/root/reference/convert.go) as an idiomatic, distributed Spark pipeline:

* geometry normalization (CRS inference, web-mercator projection with the
  reference's centimeter rounding, coordinate-arity validation, DEM z-fill),
* attribute cleaning / key routing,
* per-dataset bbox/center/S2-covering aggregation and MineAR-style JSON
  assembly,
* plus the distributed generalizations from BASELINE.json: coordinate
  extraction from web-page text (vectorized Arrow UDFs), quadkey/H3-style
  hierarchical cell indexing, broadcast STRtree point-in-polygon joins,
  kNN cell-ring joins, multi-resolution tile rollups, dedup / similarity /
  text-analysis operators, and a resumable snapshot layer.

All geo math lives in `convert_spark.kernels` as pure numpy (no Spark
imports) so it is unit-testable and reusable from pandas UDFs.
"""

__version__ = "0.1.0"
