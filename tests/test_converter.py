"""Converter-path tests: GeoJSON/CSV/KML/GPX -> features -> normalize ->
drape -> MineAR Datasets JSON, against reference semantics
(fixtures mirror /root/reference/tests per FIXTURES.md §2/§3)."""

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from convert_spark.kernels import dem, mercator
from convert_spark.operators import features as feat_ops
from convert_spark.sources import csv_points, geojson as gj, xmlgeo


def _fc(feats):
    return json.dumps({"type": "FeatureCollection", "features": feats})


POINTS_DOC = _fc(
    [
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [-111.02543, 45.63793]},
            "properties": {
                "name": "alpha",
                "id": 17,
                "styletype": "soil",
                "copper": 1.5,
                "gold": 0,       # numeric zero: KEPT (Go interface quirk)
                "silver": "0",   # string zero: dropped
                "lead": "",      # empty: dropped
                "zinc": None,     # nil: dropped
                "tags": "x",     # routed-away key
            },
        },
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [2.3522, 48.8566, 35.0]},
            "properties": {"name": "beta"},
        },
    ]
)

MULTILINE_DOC = _fc(
    [
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiLineString",
                "coordinates": [
                    [[0.0, 10.0], [1.0, 11.0]],
                    [[5.0, 5.0], [6.0, 6.0], [7.0, 7.0]],
                ],
            },
            "properties": {"linetype": "ridge"},
        }
    ]
)

POLY2D_DOC = _fc(
    [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[-111.2, 45.5], [-110.8, 45.5], [-110.8, 45.8], [-111.2, 45.8], [-111.2, 45.5]]],
            },
            "properties": {"rock_name": "gneiss"},
        }
    ]
)

POLY3D_DOC = _fc(
    [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[-111.2, 45.5, 100.0], [-110.8, 45.5, 110.0], [-110.8, 45.8, 120.0], [-111.2, 45.5, 100.0]]
                ],
            },
            "properties": {"fid": 3},
        }
    ]
)

DOUGHNUT_DOC = _fc(
    [
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [
                        [[-74.5, 40.2], [-73.5, 40.2], [-73.5, 41.2], [-74.5, 41.2], [-74.5, 40.2]],
                        [[-74.2, 40.5], [-73.8, 40.5], [-73.8, 40.9], [-74.2, 40.9], [-74.2, 40.5]],
                    ]
                ],
            },
            "properties": {"lithology": "karst"},
        }
    ]
)


class TestGeoJSON:
    def test_point_semantics(self, spark):
        doc = feat_ops.convert_geojson(spark, "d1", POINTS_DOC, name="pts")
        assert doc["name"] == "pts"
        pts = doc["points"]
        assert len(pts) == 2
        a = pts[0]
        assert a["name"] == "alpha" and a["id"] == "17" and a["type"] == "soil"
        keys = {kv["key"]: kv["value"] for kv in a["attributes"]}
        assert keys == {"copper": "1.5", "gold": "0"}  # numeric 0 kept, rest dropped
        # projection exact (cm-rounded) + DEM z at original coords
        ex, ey = mercator.to3857(np.array([-111.02543]), np.array([45.63793]))
        assert a["point"][0] == ex[0] and a["point"][1] == ey[0]
        ez = dem.get_elev(np.array([-111.02543]), np.array([45.63793]))[0]
        assert a["point"][2] == pytest.approx(ez)
        # 3D point keeps its z
        b = pts[1]
        assert b["point"][2] == 35.0
        # dataset finalize: center formula + s2 tokens
        assert len(doc["center"]) == 1
        c = doc["center"][0]
        lx = min(p["point"][0] for p in pts)
        rx = max(p["point"][0] for p in pts)
        assert c["x"] == rx - (rx - lx) / 2.0
        assert doc["s2"] and all(len(t) <= 8 for t in doc["s2"])
        assert doc["lines"] is None and doc["shapes"] is None

    def test_multiline_explodes(self, spark):
        doc = feat_ops.convert_geojson(spark, "d2", MULTILINE_DOC)
        lines = doc["lines"]
        assert len(lines) == 2  # E2: one feature per part
        assert len(lines[0]["points"]) == 2 and len(lines[1]["points"]) == 3
        assert {kv["key"] for kv in lines[0]["attributes"]} == {"linetype"}
        # every vertex projected + DEM z
        for ln in lines:
            for v in ln["points"]:
                assert abs(v[0]) > 180 or abs(v[1]) > 180
                assert np.isfinite(v[2])

    def test_polygon_2d_drapes(self, spark):
        doc = feat_ops.convert_geojson(spark, "d3", POLY2D_DOC)
        sh = doc["shapes"][0]
        assert sh["points"] is None  # mesh replaces rings (convert.go:729)
        assert len(sh["vertices"]) == feat_ops.CLOUD_K**2
        assert len(sh["indices"]) % 3 == 0 and len(sh["indices"]) > 0
        # vertices are 3857 with DEM z
        vx = np.array(sh["vertices"])
        assert (np.abs(vx[:, 0]) > 180).all()
        assert np.isfinite(vx[:, 2]).all()

    def test_polygon_3d_skips_drape(self, spark):
        doc = feat_ops.convert_geojson(spark, "d4", POLY3D_DOC)
        sh = doc["shapes"][0]
        assert sh["vertices"] is None and sh["indices"] is None
        assert sh["points"] is not None
        ring = sh["points"][0][0]
        assert ring[0][2] == 100.0  # z preserved

    def test_doughnut_hole_filtering(self, spark):
        doc = feat_ops.convert_geojson(spark, "d5", DOUGHNUT_DOC)
        sh = doc["shapes"][0]
        assert sh["points"] is None and len(sh["indices"]) > 0
        verts = np.array(sh["vertices"])
        idx = np.array(sh["indices"]).reshape(-1, 3)
        # no pointcloud vertex inside the hole (pre-filter, convert.go:760-766)
        hx, hy = mercator.to3857(np.array([-74.2, -73.8]), np.array([40.5, 40.9]))
        in_hole = (verts[:, 0] > hx[0]) & (verts[:, 0] < hx[1]) & (verts[:, 1] > hy[0]) & (verts[:, 1] < hy[1])
        assert not in_hole.any()
        # no triangle centroid inside the hole (VerifyDelaunay)
        cent = verts[idx][:, :, :2].mean(axis=1)
        c_in = (cent[:, 0] > hx[0]) & (cent[:, 0] < hx[1]) & (cent[:, 1] > hy[0]) & (cent[:, 1] < hy[1])
        assert not c_in.any()

    def test_empty_collection_errors(self, spark):
        with pytest.raises(ValueError):
            feat_ops.convert_geojson(spark, "d6", _fc([]))


class TestCSV:
    def test_roles_and_parse_to_zero(self, spark):
        rows = [
            ("utm_east", "utm_north", "elev_m", "sampleid", "copper"),
            ("-12359294.33", "5722515.89", "1500.5", "s1", "2.5"),
            ("bad", "5722515.89", "", "s2", "0"),
            ("", "", "", "s3", ""),
        ]
        csv_text = "\n".join(",".join(r) for r in rows)
        import tempfile, os

        d = tempfile.mkdtemp()
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write(csv_text)
        feats = csv_points.features_from_csv(spark, p, "utm_east", "utm_north", "elev_m")
        got = feats.orderBy("feature_idx").toPandas()
        assert len(got) == 3  # NO rows dropped (empties parse to 0.0)
        assert got["had_z"].all()
        xyz0 = got["xyz_raw"].iloc[0]
        assert xyz0[0] == -12359294.33 and xyz0[2] == 1500.5
        xyz1 = got["xyz_raw"].iloc[1]
        assert xyz1[0] == 0.0 and xyz1[1] == 5722515.89 and xyz1[2] == 0.0
        assert got["attributes"].iloc[1] == {"sampleid": "s2", "copper": "0"}  # CSV: no falsy drop

    def test_column_encounter_order_quirk(self, spark):
        # Y column appears before X in the header -> axes swap silently
        csv_text = "ycol,xcol\n10.0,20.0\n"
        import tempfile, os

        d = tempfile.mkdtemp()
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write(csv_text)
        feats = csv_points.features_from_csv(spark, p, "xcol", "ycol")
        xyz = feats.toPandas()["xyz_raw"].iloc[0]
        assert list(xyz) == [10.0, 20.0]  # encounter order, NOT role order

    def test_missing_coord_column_raises(self, spark):
        df = spark.createDataFrame([("1", "2")], "a string, b string")
        with pytest.raises(ValueError):
            csv_points.features_from_csv(spark, df, "x", "y")


KML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder><name>survey</name>
<Placemark><name>p1</name>
 <ExtendedData><SchemaData><SimpleData name="depth">12</SimpleData></SchemaData></ExtendedData>
 <Point><coordinates>-111.0,45.6,1200</coordinates></Point></Placemark>
<Placemark><name>l1</name><MultiGeometry>
 <LineString><coordinates>-111.0,45.6 -110.9,45.7</coordinates></LineString></MultiGeometry></Placemark>
<Placemark><name>s1</name><MultiGeometry><Polygon><outerBoundaryIs><LinearRing>
 <coordinates>-111.2,45.5 -110.8,45.5 -110.8,45.8 -111.2,45.5</coordinates>
 </LinearRing></outerBoundaryIs></Polygon></MultiGeometry></Placemark>
</Folder></Document></kml>"""

GPX_DOC = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1">
<wpt lat="45.6" lon="-111.0"><ele>1200</ele><name>w1</name>
  <extensions><ogr:sampleid xmlns:ogr="http://osgeo.org/gdal">s9</ogr:sampleid></extensions></wpt>
<rte><name>r1</name><rtept lat="45.6" lon="-111.0"/><rtept lat="45.7" lon="-110.9"/></rte>
<trk><name>t1</name>
 <trkseg><trkpt lat="45.1" lon="-111.1"><ele>1000</ele></trkpt><trkpt lat="45.2" lon="-111.2"/></trkseg>
 <trkseg><trkpt lat="45.3" lon="-111.3"/></trkseg></trk>
</gpx>"""


class TestKML:
    def test_kml_features(self, spark):
        docs = spark.createDataFrame([("k1", KML_DOC)], "dataset_id string, kml string")
        feats = xmlgeo.features_from_kml(docs).orderBy("feature_idx").toPandas()
        assert feats["geom_kind"].tolist() == ["point", "line", "polygon"]
        assert feats["name"].tolist() == ["p1", "l1", "s1"]
        assert feats["attributes"].iloc[0] == {"depth": "12"}
        assert feats["had_z"].tolist() == [True, False, False]
        assert xmlgeo.kml_dataset_name(KML_DOC) == "survey"

    def test_kml_end_to_end(self, spark):
        docs = spark.createDataFrame([("k1", KML_DOC)], "dataset_id string, kml string")
        feats = xmlgeo.features_from_kml(docs)
        norm = feat_ops.normalize_features(feats)
        mesh = feat_ops.drape_meshes(norm)
        out = feat_ops.assemble_datasets(norm, mesh, {"k1": xmlgeo.kml_dataset_name(KML_DOC)}).collect()
        doc = json.loads(out[0]["dataset_json"])
        assert doc["name"] == "survey"
        assert doc["points"][0]["point"][2] == 1200.0
        assert doc["shapes"][0]["points"] is None  # 2D polygon draped
        assert len(doc["shapes"][0]["indices"]) > 0


class TestGPX:
    def test_gpx_features(self, spark):
        docs = spark.createDataFrame([("g1", GPX_DOC)], "dataset_id string, gpx string")
        feats = xmlgeo.features_from_gpx(docs).orderBy("feature_idx").toPandas()
        assert feats["geom_kind"].tolist() == ["point", "line", "line"]
        assert feats["name"].tolist() == ["w1", "r1", "t1"]
        assert feats["attributes"].iloc[0] == {"sampleid": "s9"}
        # track flattens segments: 2 + 1 = 3 vertices (E4)
        assert len(feats["verts"].iloc[2]) == 3
        # missing ele -> 0.0, arity always 3
        assert feats["verts"].iloc[2][2][2] == 0.0
        assert feats["had_z"].all()


class TestReviewRegressions:
    """Regression tests for the round-1 code-review findings."""

    def test_empty_geometry_dropped_not_crashed(self, spark):
        doc = _fc(
            [
                {"type": "Feature", "geometry": {"type": "LineString", "coordinates": []}, "properties": {}},
                {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}, "properties": {}},
            ]
        )
        out = feat_ops.convert_geojson(spark, "e1", doc)
        assert len(out["points"]) == 1 and out["lines"] is None

    def test_mixed_arity_z_per_vertex(self, spark):
        """Reference CheckCoords runs per vertex: 2D vertices DEM-fill,
        3D vertices keep z — within one geometry (convert.go:862-875)."""
        doc = _fc(
            [
                {
                    "type": "Feature",
                    "geometry": {"type": "LineString", "coordinates": [[10.0, 20.0, 555.0], [11.0, 21.0]]},
                    "properties": {},
                }
            ]
        )
        out = feat_ops.convert_geojson(spark, "m1", doc)
        pts = out["lines"][0]["points"]
        assert pts[0][2] == 555.0  # provided z kept
        expected = dem.get_elev(np.array([11.0]), np.array([21.0]))[0]
        assert pts[1][2] == pytest.approx(expected)  # 2D vertex DEM-filled
        assert np.isfinite(pts[1][2])

    def test_small_bbox_covering_keeps_duplicate_tokens(self):
        """convert.go:1180-1192 appends truncated tokens WITHOUT dedup —
        tiny bboxes yield 4 identical 8-char tokens."""
        from convert_spark.kernels import dem as demk, mercator, s2

        mx, my = mercator.to3857(np.array([-74.0, -73.99997]), np.array([40.7, 40.70003]))
        toks = s2.s2covering_tokens(mx[0], my[0], mx[1], my[1], demk.get_elev)
        assert len(toks) == 4 and len(set(toks)) == 1
        batch = s2.s2covering_tokens_batch(mx[:1], my[:1], mx[1:], my[1:], demk.get_elev)
        assert batch[0] == toks

    def test_csv_empty_attr_stays_empty_string(self, spark):
        import os, tempfile

        d = tempfile.mkdtemp()
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write("x,y,note\n1.0,2.0,\n")
        feats = csv_points.features_from_csv(spark, p, "x", "y")
        attrs = feats.toPandas()["attributes"].iloc[0]
        assert attrs == {"note": ""}  # Go keeps "" (convert.go:566-570), not NULL

    def test_k_ring_no_duplicates_when_ring_exceeds_grid(self):
        from convert_spark.kernels import quadkey

        c = quadkey.tile_to_cell(np.array([1]), np.array([0]), np.array([0]))
        origin, neigh = quadkey.k_ring(c, 1)  # 3 > 2^1: wrap collision
        assert len(neigh) == len(set(neigh.tolist()))

    def test_ann_tie_safety_across_partitions(self, spark):
        """Identical vectors split over many partitions: global top-k must
        be the smallest ref ids (tie contract), not partition-arbitrary."""
        import pandas as pd
        from pyspark.sql import functions as F

        from convert_spark.operators import ann

        vec = [1.0] + [0.0] * 7
        refs = spark.createDataFrame(
            pd.DataFrame({"ref_id": range(40), "embedding": [vec] * 40})
        ).repartition(8)
        qs = spark.createDataFrame(pd.DataFrame({"query_id": [100], "embedding": [vec]}))
        out = (
            ann.brute_topk_broadcast(qs, refs, k=3)
            .toPandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert out["ref_id"].tolist() == [0, 1, 2]


class TestThirdReviewRegressions:
    def test_go_float_formatting(self):
        """Go fmt %v parity: scientific at decimal exponent >= 6 or < -4
        (json.Unmarshal gives float64 for ALL JSON numbers)."""
        from convert_spark.sources.geojson import _go_str

        assert _go_str(17) == "17"
        assert _go_str(999999) == "999999"
        assert _go_str(1000000) == "1e+06"
        assert _go_str(1417640643) == "1.417640643e+09"
        assert _go_str(1234567.5) == "1.2345675e+06"
        assert _go_str(0.0001) == "0.0001"
        assert _go_str(0.00001) == "1e-05"
        assert _go_str(-2500000.0) == "-2.5e+06"
        assert _go_str(True) == "true" and _go_str(None) == ""

    def test_id_priority_unified(self, spark):
        doc = _fc(
            [
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                    "properties": {"uuid": "u9", "id": "i1"},
                }
            ]
        )
        out = feat_ops.convert_geojson(spark, "p", doc)
        assert out["points"][0]["id"] == "i1"  # priority order, not doc order

    def test_malformed_document_skipped(self, spark):
        docs = spark.createDataFrame(
            [("bad", "{not json"), ("good", _fc([{"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}, "properties": {}}]))],
            "dataset_id string, geojson string",
        )
        feats = gj.features_from_geojson(docs).toPandas()
        assert set(feats["dataset_id"]) == {"good"}

    def test_kml_structural_parity(self, spark):
        """Bare LineString under Placemark, second Folder, and second
        geometry in a MultiGeometry are IGNORED (Go fixed-path binding)."""
        kml = """<?xml version="1.0"?><kml><Document>
        <Folder><name>f1</name>
          <Placemark><name>a</name><LineString><coordinates>1,2 3,4</coordinates></LineString></Placemark>
          <Placemark><name>b</name><MultiGeometry>
            <LineString><coordinates>1,2 3,4</coordinates></LineString>
            <LineString><coordinates>5,6 7,8</coordinates></LineString>
          </MultiGeometry></Placemark>
        </Folder>
        <Folder><name>f2</name><Placemark><name>c</name><Point><coordinates>9,9</coordinates></Point></Placemark></Folder>
        </Document></kml>"""
        docs = spark.createDataFrame([("k", kml)], "dataset_id string, kml string")
        feats = xmlgeo.features_from_kml(docs).toPandas()
        # only placemark b's FIRST MultiGeometry LineString binds
        assert len(feats) == 1
        assert feats["name"].iloc[0] == "b"
        assert list(feats["verts"].iloc[0][0][:2]) == [1.0, 2.0]

    def test_parse_double_go_whitespace(self, spark):
        from convert_spark.operators.extract import parse_double_go

        df = spark.createDataFrame([(" 1.5 ",), ("2.5",), ("x",)], "s string")
        got = [r[0] for r in df.select(parse_double_go("s")).collect()]
        assert got == [0.0, 2.5, 0.0]  # Go ParseFloat rejects padding

    def test_parse_double_go_exotic_literals(self, spark):
        """Go strconv.ParseFloat parity for exotic literals: digit-group
        underscores, hex floats (mandatory p exponent), inf/nan words."""
        import math

        from convert_spark.operators.extract import parse_double_go

        cases = [
            ("1_000", 1000.0),
            ("1_0.2_5e1_0", 10.25e10),
            ("1__0", 0.0),       # double underscore: invalid in Go
            ("_100", 0.0),       # leading underscore: invalid
            ("100_", 0.0),       # trailing underscore: invalid
            ("0x1.8p1", 3.0),
            ("0x1p-2", 0.25),
            ("-0x.8p0", -0.5),
            ("0x1.8", 0.0),      # hex float without p: invalid in Go
            ("0x1_f.8p-1", 15.75),   # hex digit-group underscores
            ("0x_1p0", 1.0),         # Go allows one _ right after 0x
            ("0x1p1_0", 1024.0),     # underscore in the p exponent
            ("0x1__fp0", 0.0),       # doubled underscore: invalid
            ("0x1_.8p0", 0.0),       # underscore before dot: invalid
            ("0x1._8p0", 0.0),       # underscore after dot: invalid
            ("0x1fp0_", 0.0),        # trailing underscore: invalid
            ("inf", float("inf")),
            ("-Infinity", float("-inf")),
            ("+INF", float("inf")),
        ]
        df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
        got = [r[0] for r in df.select(parse_double_go("s")).collect()]
        for (s, want), g in zip(cases, got):
            assert g == want, (s, g, want)
        nan_got = (
            spark.createDataFrame([("nan",), ("-NaN",)], "s string")
            .select(parse_double_go("s"))
            .collect()
        )
        assert all(math.isnan(r[0]) for r in nan_got)

    def test_csv_feature_idx_contiguous(self, spark):
        import os, tempfile

        d = tempfile.mkdtemp()
        p = os.path.join(d, "t.csv")
        with open(p, "w") as f:
            f.write("x,y\n" + "\n".join(f"{i}.0,{i}.0" for i in range(50)))
        feats = csv_points.features_from_csv(spark, p, "x", "y")
        idx = sorted(feats.toPandas()["feature_idx"])
        assert idx == list(range(50))

    def test_snapshot_params_invalidate(self, spark, tmp_path):
        from convert_spark.plans import snapshots

        root = str(tmp_path / "s")
        a = snapshots.run_pipeline(spark, root, n_pages=50)
        b = snapshots.run_pipeline(spark, root, n_pages=120)  # params changed
        assert b["pages"]["rows"] == 120  # stale 50-page snapshot NOT reused
        assert a["pages"]["rows"] == 50


class TestAttrOrderAndIsolation:
    """Round-2 fixes: deterministic source attribute order (CSV/KML/GPX emit
    in encounter/document order, convert.go:554-570 + SimpleData order) and
    per-dataset failure isolation for malformed XML numerics."""

    KML_UNSORTED = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder><name>n</name>
<Placemark><name>p1</name>
 <ExtendedData><SchemaData>
  <SimpleData name="zeta">1</SimpleData>
  <SimpleData name="alpha">2</SimpleData>
  <SimpleData name="mid">3</SimpleData>
 </SchemaData></ExtendedData>
 <Point><coordinates>-111.0,45.6,1200</coordinates></Point></Placemark>
</Folder></Document></kml>"""

    def test_kml_attr_document_order(self, spark):
        import json

        from convert_spark.operators import features as feat_ops
        from convert_spark.sources import xmlgeo

        docs = spark.createDataFrame([("k", self.KML_UNSORTED)], "dataset_id string, kml string")
        norm = feat_ops.normalize_features(xmlgeo.features_from_kml(docs))
        row = feat_ops.assemble_datasets(norm, None, {}).collect()[0]
        doc = json.loads(row["dataset_json"])
        keys = [a["key"] for a in doc["points"][0]["attributes"]]
        assert keys == ["zeta", "alpha", "mid"]  # document order, NOT sorted

    def test_kml_bad_numeric_isolated(self, spark):
        from convert_spark.sources import xmlgeo

        bad = self.KML_UNSORTED.replace("-111.0,45.6,1200", "oops,45.6,1200")
        docs = spark.createDataFrame(
            [("bad", bad), ("good", self.KML_UNSORTED)], "dataset_id string, kml string"
        ).repartition(1)  # same task: the bad doc must not poison the good one
        out = xmlgeo.features_from_kml(docs).collect()
        assert {r["dataset_id"] for r in out} == {"good"}

    def test_gpx_bad_numeric_isolated(self, spark):
        from convert_spark.sources import xmlgeo

        bad = GPX_DOC.replace('lat="45.6"', 'lat="4x.6"', 1)
        docs = spark.createDataFrame(
            [("bad", bad), ("good", GPX_DOC)], "dataset_id string, gpx string"
        ).repartition(1)
        out = xmlgeo.features_from_gpx(docs).collect()
        assert {r["dataset_id"] for r in out} == {"good"}

    def test_csv_attr_header_order(self, spark, tmp_path):
        from convert_spark.sources import csv_points

        p = str(tmp_path / "h.csv")
        with open(p, "w") as f:
            f.write("zz,x,aa,y,mm\n7,1.0,8,2.0,9\n")
        got = csv_points.features_from_csv(spark, p, "x", "y").toPandas()
        assert list(got["attr_keys"].iloc[0]) == ["zz", "aa", "mm"]


class TestXmlDecoderShape:
    """VERDICT round-1 item 10: the XML sources must bind exactly the
    reference's fixed struct paths (convert.go:281-403 `kml.Document.
    Folder.Placemarks[i].Point / .MultiGeometry.LineString / .Polygon`,
    406-546) — extra Folders, bare geometries, and second geometries
    inside a MultiGeometry are silently ignored, exactly as Go XML
    struct decoding of single fields does."""

    KML_EDGE = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<Folder><name>first</name>
  <Placemark><name>keep_pt</name>
    <Point><coordinates>-111.0,45.6,1200</coordinates></Point>
    <Point><coordinates>-99.0,40.0,1</coordinates></Point>
    <LineString><coordinates>-111.0,45.6 -110.9,45.7</coordinates></LineString>
    <MultiGeometry>
      <LineString><coordinates>-111.0,45.6 -110.9,45.7</coordinates></LineString>
      <LineString><coordinates>-1.0,1.0 -2.0,2.0</coordinates></LineString>
      <Polygon><outerBoundaryIs><LinearRing>
        <coordinates>-111.2,45.5 -110.8,45.5 -110.8,45.8 -111.2,45.5</coordinates>
      </LinearRing></outerBoundaryIs>
      <innerBoundaryIs><LinearRing>
        <coordinates>-111.0,45.55 -110.9,45.55 -110.9,45.6 -111.0,45.55</coordinates>
      </LinearRing></innerBoundaryIs></Polygon>
      <Polygon><outerBoundaryIs><LinearRing>
        <coordinates>-5.0,5.0 -4.0,5.0 -4.0,6.0 -5.0,5.0</coordinates>
      </LinearRing></outerBoundaryIs></Polygon>
    </MultiGeometry>
  </Placemark>
</Folder>
<Folder><name>second</name>
  <Placemark><name>ignored</name>
    <Point><coordinates>-50.0,10.0,0</coordinates></Point></Placemark>
</Folder>
</Document></kml>"""

    def test_kml_fixed_paths(self, spark):
        from convert_spark.sources import xmlgeo

        docs = spark.createDataFrame([("k", self.KML_EDGE)], "dataset_id string, kml string")
        rows = sorted(xmlgeo.features_from_kml(docs).collect(), key=lambda r: r["feature_idx"])
        # exactly three features: first Point, first MultiGeometry
        # LineString, first MultiGeometry Polygon outer ring — the second
        # Point, the bare LineString, the second MG LineString, the second
        # MG Polygon, the inner ring, and the whole second Folder are gone
        kinds = [(r["geom_kind"], r["name"]) for r in rows]
        assert kinds == [("point", "keep_pt"), ("line", "keep_pt"), ("polygon", "keep_pt")]
        pt = rows[0]
        assert [round(v, 4) for v in pt["verts"][0]] == [-111.0, 45.6, 1200.0]
        line = rows[1]
        assert len(line["verts"]) == 2 and round(line["verts"][0][0], 4) == -111.0
        poly = rows[2]
        assert len(poly["verts"]) == 4  # outer ring only, inner ignored
        assert all(round(v[0], 1) <= -110.8 for v in poly["verts"])  # not the -5.0 polygon
        # dataset name binds the FIRST folder
        assert xmlgeo.kml_dataset_name(self.KML_EDGE) == "first"

    GPX_EDGE = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1">
<metadata><name>meta_ignored</name></metadata>
<wpt lat="45.6" lon="-111.0"><ele>1200</ele><name>w1</name>
  <unknown>stuff</unknown></wpt>
<rte><name>r_empty</name></rte>
<trk><name>t1</name>
 <trkseg><trkpt lat="45.1" lon="-111.1"/></trkseg>
 <trkseg></trkseg>
 <trkseg><trkpt lat="45.3" lon="-111.3"><ele>9</ele></trkpt></trkseg></trk>
</gpx>"""

    def test_gpx_edge_shapes(self, spark):
        from convert_spark.sources import xmlgeo

        docs = spark.createDataFrame([("g", self.GPX_EDGE)], "dataset_id string, gpx string")
        rows = sorted(xmlgeo.features_from_gpx(docs).collect(), key=lambda r: r["feature_idx"])
        kinds = [(r["geom_kind"], r["name"]) for r in rows]
        # empty rte emits nothing; empty middle trkseg flattens away; the
        # missing ele decodes as 0.0 with arity 3 (Go struct default)
        assert kinds == [("point", "w1"), ("line", "t1")]
        trk = rows[1]
        assert [round(v, 4) for v in trk["verts"][0]] == [-111.1, 45.1, 0.0]
        assert [round(v, 4) for v in trk["verts"][1]] == [-111.3, 45.3, 9.0]


class TestCorpusReader:
    def test_directory_of_documents(self, spark, tmp_path):
        """binaryFile corpus ingestion: a directory of geojson documents
        converts in one distributed call; dataset_id = file stem; a
        malformed document is isolated, not fatal."""
        from convert_spark.sources import corpus

        good = '{"type":"FeatureCollection","features":[{"type":"Feature","properties":{"name":"p"},"geometry":{"type":"Point","coordinates":[10.0,20.0]}}]}'
        (tmp_path / "alpha.geojson").write_text(good)
        (tmp_path / "beta.geojson").write_text(good.replace("10.0", "11.0"))
        (tmp_path / "broken.geojson").write_text("{not valid json")
        (tmp_path / "ignored.txt").write_text("not a geo document")
        feats = corpus.features_from_dir(spark, str(tmp_path), "geojson").toPandas()
        assert set(feats["dataset_id"]) == {"alpha", "beta"}
        assert len(feats) == 2
        docs = corpus.read_document_dir(spark, str(tmp_path), "geojson").toPandas()
        assert set(docs["dataset_id"]) == {"alpha", "beta", "broken"}

    def test_gpx_and_kml_dirs(self, spark, tmp_path):
        from convert_spark.sources import corpus

        (tmp_path / "trk.gpx").write_text(
            '<gpx xmlns="http://www.topografix.com/GPX/1/1">'
            '<wpt lat="1.5" lon="2.5"><name>w</name></wpt></gpx>'
        )
        (tmp_path / "doc.kml").write_text(
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder><name>f</name>'
            "<Placemark><name>a</name><Point><coordinates>3,4</coordinates></Point></Placemark>"
            "</Folder></Document></kml>"
        )
        g = corpus.features_from_dir(spark, str(tmp_path), "gpx").toPandas()
        k = corpus.features_from_dir(spark, str(tmp_path), "kml").toPandas()
        assert len(g) == 1 and g["dataset_id"].iloc[0] == "trk"
        assert len(k) == 1 and k["dataset_id"].iloc[0] == "doc"


class TestAdversarialDocIsolation:
    """Round-4: per-dataset failure isolation under STRUCTURALLY malformed
    documents (valid JSON/XML with the wrong shape) — one bad web-scale
    document must never abort a task; the good document in the same Arrow
    batch must still convert."""

    GOOD_GEOJSON = json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"name": "ok"},
                    "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                }
            ],
        }
    )
    BAD_GEOJSON = [
        "not json at all {",
        "[1, 2, 3]",                                    # list document
        '"just a string"',
        '{"features": 42}',                             # non-iterable features
        '{"features": [7]}',                            # non-dict feature
        '{"features": [{"geometry": {"type": "Point", "coordinates": {"x": 1}}}]}',
        '{"features": [{"geometry": {"type": "Polygon", "coordinates": [[["a", "b"]]]}}]}',
        '{"features": [{"properties": 9, "geometry": {"type": "Point", "coordinates": [1, 2]}}]}',
        '{"features": [{"geometry": {"type": "LineString", "coordinates": 5}}]}',
    ]

    def test_geojson_isolation(self, spark):
        rows = [("good", self.GOOD_GEOJSON)] + [
            (f"bad{i}", t) for i, t in enumerate(self.BAD_GEOJSON)
        ]
        docs = spark.createDataFrame(rows, "dataset_id string, geojson string").coalesce(1)
        got = gj.features_from_geojson(docs).toPandas()
        assert set(got["dataset_id"]) == {"good"}
        assert len(got) == 1 and got.loc[0, "name"] == "ok"

    def test_kml_gpx_isolation(self, spark):
        good_kml = (
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Folder><name>d</name>'
            "<Placemark><name>p</name><Point><coordinates>1.0,2.0</coordinates></Point>"
            "</Placemark></Folder></Document></kml>"
        )
        bad_xml = [
            "<kml><unclosed>",
            "<notkml/>",
            '<kml><Document><Placemark><Point><coordinates>a,b</coordinates></Point></Placemark></Document></kml>',
            "",
        ]
        docs = spark.createDataFrame(
            [("good", good_kml)] + [(f"bad{i}", t) for i, t in enumerate(bad_xml)],
            "dataset_id string, kml string",
        ).coalesce(1)
        got = xmlgeo.features_from_kml(docs).toPandas()
        assert set(got["dataset_id"]) == {"good"}
        good_gpx = (
            '<gpx xmlns="http://www.topografix.com/GPX/1/1">'
            '<wpt lat="2.0" lon="1.0"><name>w</name></wpt></gpx>'
        )
        bad_gpx = [
            "<gpx><wpt></gpx>",
            '<gpx xmlns="http://www.topografix.com/GPX/1/1"><wpt lat="x" lon="y"/></gpx>',
        ]
        # a wpt with MISSING lat/lon attrs is NOT an error: Go encoding/xml
        # leaves float64 zero values, so the reference emits a (0,0)
        # waypoint — the engine matches (xmlgeo.py `or 0.0`)
        zero_gpx = '<gpx xmlns="http://www.topografix.com/GPX/1/1"><wpt/></gpx>'
        gdocs = spark.createDataFrame(
            [("good", good_gpx), ("zerowpt", zero_gpx)]
            + [(f"bad{i}", t) for i, t in enumerate(bad_gpx)],
            "dataset_id string, gpx string",
        ).coalesce(1)
        ggot = xmlgeo.features_from_gpx(gdocs).toPandas()
        assert set(ggot["dataset_id"]) == {"good", "zerowpt"}
        zw = ggot[ggot["dataset_id"] == "zerowpt"].iloc[0]
        assert zw["verts"][0][0] == 0.0 and zw["verts"][0][1] == 0.0
