"""Vectorized ray-casting point-in-polygon (multipolygon + holes).

Reference behavior being generalized: ``srtm.IsPointInsideMultiPolygon``
calls at /root/reference/convert.go:763 (pointcloud hole filtering) and
convert.go:1011 (VerifyDelaunay triangle-centroid test). The reference runs
one scalar PIP per point; here a single numpy kernel tests a whole Arrow
batch of points against a polygon set at once — the executor-side "refine"
half of the broadcast spatial join (SURVEY.md §2.5).

Polygon encoding (columnar, shuffle-friendly):
    vertices : (V, 2) float64 — all ring vertices concatenated
    ring_offsets : (R + 1,) int64 — vertex slice per ring
    ring_poly : (R,) int64 — polygon index per ring
    ring_is_hole : (R,) bool — even-odd alternative also supported

Even-odd rule: a point is inside a polygon iff the total crossing count
over *all* of the polygon's rings (outer + holes) is odd — holes need no
special casing under even-odd, which matches ray-casting references.
"""

from __future__ import annotations

import numpy as np


def ring_crossings(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Crossing-parity contribution of one ring for each point.

    Classic even-odd ray cast (horizontal ray toward +x):
    for each edge (xi,yi)-(xj,yj): count it when
    ``(yi > y) != (yj > y)`` and ``x < (xj-xi)*(y-yi)/(yj-yi) + xi``.
    Vectorized over points x edges.
    """
    xi = ring[:-1, 0][None, :]
    yi = ring[:-1, 1][None, :]
    xj = ring[1:, 0][None, :]
    yj = ring[1:, 1][None, :]
    x = px[:, None]
    y = py[:, None]
    straddles = (yi > y) != (yj > y)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        x_int = (xj - xi) * (y - yi) / (yj - yi) + xi
    hit = straddles & (x < x_int)
    return hit.sum(axis=1)


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if ring.shape[0] >= 1 and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def points_in_rings(
    px: np.ndarray,
    py: np.ndarray,
    vertices: np.ndarray,
    ring_offsets: np.ndarray,
    ring_poly: np.ndarray,
    n_polys: int,
) -> np.ndarray:
    """(N_points, n_polys) bool matrix: even-odd containment per polygon."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    crossings = np.zeros((px.size, n_polys), dtype=np.int64)
    for r in range(len(ring_offsets) - 1):
        ring = _close_ring(vertices[ring_offsets[r] : ring_offsets[r + 1]])
        if ring.shape[0] < 4:  # degenerate ring (<3 distinct vertices)
            continue
        crossings[:, ring_poly[r]] += ring_crossings(px, py, ring)
    return (crossings & 1).astype(bool)


def point_in_multipolygon(px: np.ndarray, py: np.ndarray, polygons: list) -> np.ndarray:
    """Convenience form over nested lists: ``polygons`` is GeoJSON-style
    MultiPolygon nesting ``[poly][ring][vertex][xy]``. Returns a bool mask —
    inside any outer ring and not in a hole (even-odd).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    crossings = np.zeros(px.size, dtype=np.int64)
    for poly in polygons:
        for ring in poly:
            arr = _close_ring(np.asarray(ring, dtype=np.float64)[:, :2])
            if arr.shape[0] < 4:
                continue
            crossings += ring_crossings(px, py, arr)
    return (crossings & 1).astype(bool)
