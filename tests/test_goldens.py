"""Golden end-to-end tests (SURVEY.md §5.3.2): converter output vs committed
goldens — value-exact, feature order canonical. Goldens were generated once
from this engine and hand-audited against reference semantics (reference
outfiles are not committed upstream and need an earthdem.vrt GDAL raster;
we pin the deterministic synthetic DEM instead)."""

import json
from pathlib import Path

import pytest

from convert_spark.operators import features as feat_ops
from convert_spark.sources import xmlgeo

import test_converter as fixtures

GOLDENS = Path(__file__).parent / "goldens"


def _load(name):
    return json.loads((GOLDENS / f"{name}.json").read_text())


@pytest.mark.parametrize(
    "name,doc",
    [
        ("points", fixtures.POINTS_DOC),
        ("multiline", fixtures.MULTILINE_DOC),
        ("poly2d", fixtures.POLY2D_DOC),
        ("poly3d", fixtures.POLY3D_DOC),
        ("doughnut", fixtures.DOUGHNUT_DOC),
    ],
)
def test_geojson_goldens(spark, name, doc):
    got = feat_ops.convert_geojson(spark, name, doc, name=name)
    assert got == _load(name)


def test_kml_golden(spark):
    docs = spark.createDataFrame([("kml", fixtures.KML_DOC)], "dataset_id string, kml string")
    feats = xmlgeo.features_from_kml(docs)
    norm = feat_ops.normalize_features(feats)
    mesh = feat_ops.drape_meshes(norm)
    row = feat_ops.assemble_datasets(norm, mesh, {"kml": xmlgeo.kml_dataset_name(fixtures.KML_DOC)}).collect()[0]
    assert json.loads(row["dataset_json"]) == _load("kml")


def test_gpx_golden(spark):
    docs = spark.createDataFrame([("gpx", fixtures.GPX_DOC)], "dataset_id string, gpx string")
    feats = xmlgeo.features_from_gpx(docs)
    norm = feat_ops.normalize_features(feats)
    row = feat_ops.assemble_datasets(norm, None, {}).collect()[0]
    assert json.loads(row["dataset_json"]) == _load("gpx")
