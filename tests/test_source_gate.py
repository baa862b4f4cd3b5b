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
