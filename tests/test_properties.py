"""Property-based tests (SURVEY.md §5.3.4) — hypothesis over the numpy
kernels: projection round-trips, PIP invariances, hierarchy containment,
compaction inverses, extraction determinism."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from convert_spark.kernels import mercator, pip, quadkey, s2, sketches

lats = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
lons = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
# outside the CRS-inference ambiguity zone around (0,0) (|merc| <= 180 m)
far_lats = lats.filter(lambda v: abs(v) > 0.01)
far_lons = lons.filter(lambda v: abs(v) > 0.01)


class TestProjection:
    @given(far_lons, far_lats)
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_within_rounding(self, lon, lat):
        mx, my = mercator.to3857(np.array([lon]), np.array([lat]))
        lon2, lat2 = mercator.to4326(mx, my)
        assert abs(lon2[0] - lon) <= 2e-4
        assert abs(lat2[0] - lat) <= 2e-4

    @given(lons, lats)
    @settings(max_examples=100, deadline=None)
    def test_projection_is_cm_rounded(self, lon, lat):
        mx, my = mercator.to3857(np.array([lon]), np.array([lat]))
        assert mx[0] == mercator.round_half_away(mx[0], 2)
        assert my[0] == mercator.round_half_away(my[0], 2)

    @given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_round_half_away_magnitude(self, v):
        r = float(mercator.round_half_away(v, 2))
        assert abs(r - v) <= 0.005 + 1e-9 * abs(v)


class TestQuadkeyHierarchy:
    @given(lats, lons, st.integers(min_value=1, max_value=20))
    @settings(max_examples=200, deadline=None)
    def test_parent_contains_child(self, lat, lon, zoom):
        child = quadkey.cell_id(np.array([lat]), np.array([lon]), zoom)
        parent_direct = quadkey.cell_id(np.array([lat]), np.array([lon]), zoom - 1)
        assert int(quadkey.parent(child)[0]) == int(parent_direct[0])

    @given(lats, lons, st.integers(min_value=2, max_value=12), st.integers(min_value=1, max_value=3))
    @settings(max_examples=100, deadline=None)
    def test_compact_uncompact_inverse(self, lat, lon, zoom, depth):
        base = quadkey.cell_id(np.array([lat]), np.array([lon]), zoom)
        full = quadkey.uncompact(base, zoom + depth)
        assert full.size == 4**depth
        np.testing.assert_array_equal(quadkey.compact(full), base)

    @given(lats, lons, st.integers(min_value=3, max_value=14), st.integers(min_value=1, max_value=2))
    @settings(max_examples=100, deadline=None)
    def test_k_ring_contains_origin_and_is_symmetric(self, lat, lon, zoom, k):
        c = quadkey.cell_id(np.array([lat]), np.array([lon]), zoom)
        _, neigh = quadkey.k_ring(c, k)
        assert int(c[0]) in neigh.tolist()
        # symmetry: if b in ring(a) then a in ring(b)
        b = neigh[0:1]
        _, back = quadkey.k_ring(b, k)
        assert int(c[0]) in back.tolist()


class TestPIPInvariance:
    @given(
        st.lists(st.tuples(lons, lats), min_size=5, max_size=10, unique=True),
        lons,
        lats,
        st.integers(min_value=0, max_value=9),
    )
    @settings(max_examples=100, deadline=None)
    def test_vertex_rotation_invariance(self, ring_pts, px, py, rot):
        ring = np.array(ring_pts, dtype=np.float64)
        base = pip.point_in_multipolygon(np.array([px]), np.array([py]), [[ring.tolist()]])
        rolled = np.roll(ring, rot % len(ring), axis=0)
        got = pip.point_in_multipolygon(np.array([px]), np.array([py]), [[rolled.tolist()]])
        assert base[0] == got[0]


class TestS2Hierarchy:
    @given(lats, lons, st.integers(min_value=0, max_value=29))
    @settings(max_examples=150, deadline=None)
    def test_parent_range_contains_leaf(self, lat, lon, level):
        leaf = s2.cellid_from_latlng(np.array([lat]), np.array([lon]))
        p = s2.parent_at(leaf, level)
        lsb_p = int(s2.lsb(p)[0])
        assert int(p[0]) - lsb_p + 1 <= int(leaf[0]) <= int(p[0]) + lsb_p - 1
        assert int(s2.level_of(p)[0]) == level

    @given(lats, lons)
    @settings(max_examples=100, deadline=None)
    def test_token_roundtrip(self, lat, lon):
        cid = int(s2.cellid_from_latlng(np.array([lat]), np.array([lon]))[0])
        t = s2.token(cid)
        assert int(t.ljust(16, "0"), 16) == cid


class TestSketchProperties:
    @given(st.lists(st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()), min_size=4, max_size=40))
    @settings(max_examples=50, deadline=None)
    def test_minhash_identity(self, words):
        import pandas as pd

        text = " ".join(words)
        sigs = sketches.minhash_signatures(pd.Series([text, text]))
        np.testing.assert_array_equal(sigs[0], sigs[1])
        assert sketches.jaccard_from_signatures(sigs[0], sigs[1]) == 1.0

    @given(st.text(min_size=0, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_simhash_deterministic(self, text):
        import pandas as pd

        a = sketches.simhash64(pd.Series([text]))[0]
        b = sketches.simhash64(pd.Series([text]))[0]
        assert a == b and a >= 0
