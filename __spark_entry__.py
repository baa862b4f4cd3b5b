"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship geo pipeline end-to-end at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the sf0.01 DuckDB correctness gate (tests/oracle_harness.py
replicates that gate locally).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic Common-Crawl-style pages (sf0.001 scale)
    -> Catalyst coordinate extraction (regexp_extract_all/posexplode;
    Arrow twin proven output-identical) -> CheckCoords normalization
    -> z10 tile assignment -> per-tile datasets (bbox/center/S2 covering)
    with a PIP-join polygon tag rollup."""
    from pyspark.sql import functions as F

    from convert_spark import datagen
    from convert_spark.operators import extract, joins, tiles

    pages = datagen.webpages(spark, datagen.n_pages_for_sf("/root/testdata/sf0.001"))
    mentions = extract.extract_mentions(pages)
    pts = extract.normalize_points(mentions)
    tiled = tiles.with_tile(pts, zoom=10)
    ds = tiles.tile_datasets(tiled)
    tagged = joins.pip_join(tiled.select("zoom", "cell_id", "lat", "lon"), datagen.polygons_pdf())
    per_tile_polys = tagged.groupBy("zoom", "cell_id").agg(
        F.countDistinct("poly_id").alias("n_polys"), F.count(F.lit(1)).alias("n_poly_hits")
    )
    return (
        ds.join(per_tile_polys, ["zoom", "cell_id"], "left")
        .na.fill({"n_polys": 0, "n_poly_hits": 0})
        .orderBy("cell_id")
        .select(
            "zoom", "cell_id", "n_points", "lx", "rx", "ly", "uy",
            "center_x", "center_y", "center_z", "s2", "n_polys", "n_poly_hits",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from convert_spark import queries as Q

    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from convert_spark import queries as Q

    return Q.oracles()
