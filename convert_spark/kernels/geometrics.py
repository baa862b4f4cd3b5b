"""Planar geometry helpers: centroid, perimeter, bbox.

Parity targets: ``planar.CentroidArea`` used by VerifyDelaunay
(/root/reference/convert.go:1005) and ``planar.Length`` used by
TrimDEMEdges (convert.go:1049). All vectorized over *batches of triangles*
since the mesh path feeds thousands of triangles per polygon group.
"""

from __future__ import annotations

import numpy as np


def triangle_centroids(tri_xy: np.ndarray) -> np.ndarray:
    """(T, 3, 2) triangle vertices -> (T, 2) area-centroids.

    For a triangle the area centroid equals the vertex mean; we still route
    through the shoelace form so degenerate (zero-area) triangles behave
    like the reference's CentroidArea (falls back to vertex mean there too,
    since we guard the division).
    """
    t = np.asarray(tri_xy, dtype=np.float64)
    x = t[:, :, 0]
    y = t[:, :, 1]
    xn = np.roll(x, -1, axis=1)
    yn = np.roll(y, -1, axis=1)
    cross = x * yn - xn * y
    a2 = cross.sum(axis=1)  # 2 * signed area
    with np.errstate(invalid="ignore", divide="ignore"):
        cx = ((x + xn) * cross).sum(axis=1) / (3.0 * a2)
        cy = ((y + yn) * cross).sum(axis=1) / (3.0 * a2)
    mean = t.mean(axis=1)
    bad = ~np.isfinite(cx) | ~np.isfinite(cy)
    cx = np.where(bad, mean[:, 0], cx)
    cy = np.where(bad, mean[:, 1], cy)
    return np.stack([cx, cy], axis=1)


def triangle_perimeters(tri_xy: np.ndarray) -> np.ndarray:
    """(T, 3, 2) -> (T,) planar perimeter (sum of edge lengths)."""
    t = np.asarray(tri_xy, dtype=np.float64)
    nxt = np.roll(t, -1, axis=1)
    return np.linalg.norm(nxt - t, axis=2).sum(axis=1)


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed or open ring."""
    r = np.asarray(ring, dtype=np.float64)
    x = r[:, 0]
    y = r[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def bbox(xs: np.ndarray, ys: np.ndarray) -> tuple[float, float, float, float]:
    """(lx, rx, ly, uy) — the reference's ExtentContainer field names
    (convert.go:1099-1134)."""
    return float(np.min(xs)), float(np.max(xs)), float(np.min(ys)), float(np.max(ys))
