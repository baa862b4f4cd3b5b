"""Round-6: file-source scans on the driver's hash gate (VERDICT r5 #1).

Local replica of the driver's compare for q_csv_datasets /
q_geojson_datasets / q_gpx_datasets: the Spark query runs the REAL
scan -> parse -> assemble path over the committed fixture corpus and must
match the independent DuckDB re-derivation on rows + columns + value hash.
Plus: the fixture generator must be byte-deterministic (the oracle SQL
embeds expectations about this exact corpus), and the malformed documents
must contribute zero rows (per-dataset failure isolation, S8).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oracle_harness import value_hash  # noqa: E402

FIXDIR = Path(__file__).resolve().parent / "fixtures" / "sources"
GATED = ["q_csv_datasets", "q_geojson_datasets", "q_gpx_datasets", "q_kml_datasets"]


class TestSourceFixtures:
    def test_generator_is_byte_deterministic(self, tmp_path, monkeypatch):
        import gen_source_fixtures as gen

        monkeypatch.setattr(gen, "OUT", tmp_path)
        gen.main()
        committed = {p.relative_to(FIXDIR): p.read_bytes() for p in sorted(FIXDIR.rglob("*")) if p.is_file()}
        fresh = {p.relative_to(tmp_path): p.read_bytes() for p in sorted(tmp_path.rglob("*")) if p.is_file()}
        assert committed == fresh


class TestSourceGate:
    @pytest.mark.parametrize("name", GATED)
    def test_matches_duckdb_oracle(self, spark, name):
        from convert_spark import queries as Q

        sdf = Q.QUERIES[name](spark, "/root/testdata/sf0.01").toPandas()
        ddf = duckdb.connect().execute(Q.oracles()[name]).fetchdf()
        assert len(sdf) == len(ddf) > 0
        assert sorted(sdf.columns) == sorted(ddf.columns)
        assert value_hash(sdf) == value_hash(ddf), (name, len(sdf))

    def test_malformed_documents_isolated(self, spark):
        """The invalid-JSON, wrong-shape-JSON and broken-XML fixtures must
        yield ZERO rows while the rest of the corpus converts — one bad
        document never aborts the distributed scan (S8)."""
        from convert_spark import queries as Q

        geo = Q.q_geojson_datasets(spark, "").toPandas()
        assert set(geo.dataset_id) == {"g0_points", "g1_lines", "g2_polys"}
        gpx = Q.q_gpx_datasets(spark, "").toPandas()
        assert set(gpx.dataset_id) == {"t0_mixed", "t1_track", "t2_wpt_ext"}
        kml = Q.q_kml_datasets(spark, "").toPandas()
        # malformed isolated AND the folder-less document yields nothing
        assert set(kml.dataset_id) == {"k0_points", "k1_multi", "k2_odds"}

    def test_gate_cases_present(self, spark):
        """The corpus really exercises the claimed components: the
        encounter-order quirk (c0 carries latitude in the yx family),
        P2 errors->0.0, E2 part explode (3 lines from one
        MultiLineString), E4 segment flattening (t0 trk has 5 points
        across 2 segments), ele-default-0 and extension attrs."""
        from convert_spark import queries as Q

        csv = Q.q_csv_datasets(spark, "").toPandas()
        sw = csv[csv.dataset_id.str.startswith("swapped")]
        assert (~sw.had_z).all() and sw.c2.isna().all()
        assert (csv.c0 == 0.0).any() and (csv.c1 == 0.0).any()  # P2 hit

        geo = Q.q_geojson_datasets(spark, "").toPandas()
        g1 = geo[geo.dataset_id == "g1_lines"]
        assert (g1.geom_kind == "line").sum() == 5  # 1 LS + 1 empty LS + 3 MLS parts
        g0 = geo[geo.dataset_id == "g0_points"]
        assert list(g0.feature_idx) == [0, 1, 2]  # skipped features don't number

        gpx = Q.q_gpx_datasets(spark, "").toPandas()
        trk0 = gpx[(gpx.dataset_id == "t0_mixed") & (gpx.geom_kind == "line")]
        assert 5 in set(trk0.n_verts)  # E4: 3+2 points flattened
        assert (gpx.ele0 == 0.0).any() or (gpx.elel == 0.0).any()  # missing <ele> -> 0.0
        ext = gpx[gpx.dataset_id == "t2_wpt_ext"]
        assert list(ext["attrs"]) == ["cnt=5|owner=parks"]  # (.attrs is pandas metadata)

        kml = Q.q_kml_datasets(spark, "").toPandas()
        k1 = kml[kml.dataset_id == "k1_multi"].sort_values("feature_idx")
        # fixed-path binding: first LineString (4 verts, not the ignored
        # 3-vert second one), outer ring only, decoy folder absent
        assert list(k1.geom_kind) == ["line", "polygon", "point", "line"]
        assert list(k1.n_verts) == [4, 5, 1, 3]
        assert "ghost" not in set(kml.name.dropna())
        k2 = kml[kml.dataset_id == "k2_odds"]
        assert list(k2.geom_kind) == ["point"]  # bare LineString ignored
        assert (kml[kml.geom_kind == "polygon"].ele0 == 0.0).all()  # 2D -> 0.0 on gate


class TestDatasetsJsonGate:
    """S6 sink gate (q_datasets_json): digest plumbing properties + the
    branch coverage the corpus claims. Engine-vs-twin value agreement is
    swept at all three SFs by tests/test_kat_cross_sf.py."""

    def test_canon_digest_structure_preserving(self):
        import json

        from convert_spark.queries import canon_json_digest as dig

        base = {"a": [1.0, {"b": "x", "c": None}], "z": 2}
        reordered = {"z": 2, "a": [1.0, {"c": None, "b": "x"}]}
        assert dig(json.dumps(base)) == dig(json.dumps(reordered))  # key order
        # sub-1e-7 float drift is absorbed (the twin-vs-engine ulp margin)
        drift = {"a": [1.0 + 4e-8, {"b": "x", "c": None}], "z": 2}
        assert dig(json.dumps(base)) == dig(json.dumps(drift))
        # real value / structure changes flip the digest
        for bad in (
            {"a": [1.001, {"b": "x", "c": None}], "z": 2},  # value
            {"a": [1.0, {"b": "x", "c": None}]},  # dropped key
            {"a": [1.0, {"b": "x", "c": None}], "z": 2.0},  # int vs float
            {"a": [{"b": "x", "c": None}, 1.0], "z": 2},  # list order
            {"a": [1.0, {"b": "x", "c": 0}], "z": 2},  # null vs 0
        ):
            assert dig(json.dumps(bad)) != dig(json.dumps(base)), bad
        # -0.0 normalizes to +0.0 (sign of a rounded-away value is noise)
        assert dig(json.dumps({"v": -1e-9})) == dig(json.dumps({"v": 0.0}))

    def test_corpus_branch_coverage(self, spark):
        import json

        from convert_spark import queries as Q

        bb = [(0, -100.0, -40.0, -60.0, 10.0)]
        (ds, name, text) = Q.datasets_json_corpus(bb)[0]
        doc = json.loads(text)
        assert len(doc["features"]) == 11
        from convert_spark.operators import features as feat_ops
        from convert_spark.sources.geojson import features_from_geojson

        docs = spark.createDataFrame([(ds, text)], "dataset_id string, geojson string")
        norm = feat_ops.normalize_features(features_from_geojson(docs))
        mesh = feat_ops.drape_meshes(norm)
        out = feat_ops.assemble_datasets(norm, mesh, {ds: name}).collect()
        got = json.loads(out[0]["dataset_json"])
        # 11 authored - (arity-1 drop, null geometry, unsupported type)
        # + 1 (the 2-part MultiLineString explodes to two lines) = 9
        assert out[0]["n_features"] == 9
        pts, lines, shapes = got["points"], got["lines"], got["shapes"]
        assert len(pts) == 3 and len(lines) == 3 and len(shapes) == 3
        meshed = [s for s in shapes if s["vertices"] is not None]
        ringed = [s for s in shapes if s["vertices"] is None]
        assert len(meshed) == 2 and len(ringed) == 1  # 3D polygon keeps rings
        rich = next(p for p in pts if p["name"] == "site 0")
        attrs = {a["key"]: a["value"] for a in rich["attributes"]}
        # F3 routing: name/styletype/id-ish extracted, tags/way/geomz gone
        assert rich["id"] == "1000"  # "id" (1000+did) wins over osm_id (99)
        assert rich["type"] == "marker"
        assert not {"name", "styletype", "id", "osm_id", "tags", "way", "geomz"} & attrs.keys()
        # F2 falsy quirk: numeric 0 kept as "0"; ""/null/"0"-string dropped
        assert attrs["zero_n"] == "0"
        assert not {"zero_s", "empty", "nothing"} & attrs.keys()
        # P8 Go %v forms
        assert attrs["big"] == "1.417640643e+09"
        assert attrs["tiny"] == "1.23e-05"
        assert attrs["million"] == "2.5e+06"
        assert attrs["flag"] == "true" and attrs["neg"] == "false"
        # properties:null feature survives with empty identity
        bare = [p for p in pts if p["name"] == "" and p["attributes"] is None]
        assert len(bare) == 1
