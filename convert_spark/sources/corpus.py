"""Distributed document-corpus ingestion for the file-based sources.

The reference converts ONE file per call (convert.go:168, 232, 281, 406);
at cluster scale the input is a directory/bucket of thousands of such
documents. ``read_document_dir`` turns a path glob into the
``(dataset_id, <payload>)`` DataFrame every ``features_from_*`` source
consumes, using Spark's ``binaryFile`` source:

* file bytes go straight to executor tasks — the driver only lists paths,
* Catalyst pushes ``pathGlobFilter`` and path/size predicates into the
  listing,
* one task per file (small geo documents) with fair packing for many
  small files (``spark.sql.files`` settings apply).

``dataset_id`` is the file stem — the reference's one-file-one-dataset
model (convert_test.go drives each fixture through one DatasetFrom* call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PAYLOAD_COL = {"geojson": "geojson", "kml": "kml", "gpx": "gpx"}
_GLOBS = {"geojson": "*.geojson", "kml": "*.kml", "gpx": "*.gpx"}


def read_document_dir(
    spark: SparkSession, path: str, fmt: str, glob: str | None = None, id_from: str = "stem"
) -> DataFrame:
    """Directory/glob of documents -> (dataset_id, <fmt> string) rows.

    ``id_from="stem"`` (default) names each dataset by the file stem —
    the reference's one-file-one-dataset model. Two files with the SAME
    stem in different directories would then silently merge into one
    dataset, so for nested/recursive corpora pass ``id_from="path"``
    (full URI minus extension, slashes kept — collision-proof).
    """
    if fmt not in _PAYLOAD_COL:
        raise ValueError(f"fmt must be one of {sorted(_PAYLOAD_COL)}, got {fmt!r}")
    if id_from not in ("stem", "path"):
        raise ValueError(f"id_from must be 'stem' or 'path', got {id_from!r}")
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob or _GLOBS[fmt])
        .load(path)
    )
    if id_from == "stem":
        did = F.regexp_extract(F.col("path"), r"([^/]+?)(\.[^./]*)?$", 1)
    else:
        did = F.regexp_replace(F.col("path"), r"\.[^./]*$", "")
    return raw.select(
        did.alias("dataset_id"),
        F.decode(F.col("content"), "UTF-8").alias(_PAYLOAD_COL[fmt]),
    )


def features_from_dir(
    spark: SparkSession, path: str, fmt: str, glob: str | None = None, id_from: str = "stem"
) -> DataFrame:
    """One-call distributed corpus conversion: directory -> features
    DataFrame (same schema as the single-document sources; per-document
    parse errors are isolated by the underlying source, not fatal)."""
    docs = read_document_dir(spark, path, fmt, glob, id_from)
    if fmt == "geojson":
        from .geojson import features_from_geojson

        return features_from_geojson(docs)
    if fmt == "kml":
        from .xmlgeo import features_from_kml

        return features_from_kml(docs)
    from .xmlgeo import features_from_gpx

    return features_from_gpx(docs)
