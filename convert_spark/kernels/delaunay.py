"""2D Delaunay triangulation (Bowyer–Watson) — the mesh-drape kernel.

Parity target: ``DeriveDelaunay`` (/root/reference/convert.go:956-976),
which wraps the public fogleman/delaunay library. scipy is unavailable in
this sandbox, so this is a from-scratch incremental Bowyer–Watson over the
xy-plane. Degenerate inputs (<3 points, all collinear) raise ValueError —
callers replicate the reference's warn-and-skip fallback
(convert.go:714-717, 721-724).

Used per-polygon inside ``applyInPandas`` groups (SURVEY.md §2.4 A7) where
clouds are small (DEM samples within one polygon bbox), so an O(n^2)-ish
incremental construction is the right cost/robustness trade-off.
"""

from __future__ import annotations

import numpy as np


def triangulate(points: np.ndarray) -> np.ndarray:
    """(N, 2+) points -> (T, 3) int64 vertex-index triangles (CCW).

    Z columns beyond the first two are ignored (the drape keeps z per
    vertex; triangulation is planar, matching the reference).
    """
    raw = np.asarray(points, dtype=np.float64)[:, :2]
    # dedupe (keep first occurrence) — duplicate vertices break the
    # in-circumcircle cavity logic; map output indices back at the end
    _, first_idx = np.unique(raw, axis=0, return_index=True)
    first_idx = np.sort(first_idx)
    pts = raw[first_idx]
    n = pts.shape[0]
    if n < 3:
        raise ValueError("need >= 3 distinct points")
    span = pts.max(axis=0) - pts.min(axis=0)
    sv = np.linalg.svd(pts - pts.mean(axis=0), compute_uv=False)
    if sv[1] <= 1e-12 * max(float(sv[0]), 1.0):
        raise ValueError("collinear point cloud")

    # super-triangle comfortably containing all points
    cx, cy = pts.mean(axis=0)
    d = max(float(span.max()), 1e-9) * 16.0
    sup = np.array([[cx - d, cy - d], [cx + d, cy - d], [cx, cy + d]])
    all_pts = np.vstack([pts, sup])
    si = [n, n + 1, n + 2]
    tris: list[tuple[int, int, int]] = [(si[0], si[1], si[2])]

    def circumcontains(tri_arr: np.ndarray, p: np.ndarray) -> np.ndarray:
        """Vectorized in-circumcircle test for point p against many tris."""
        a = all_pts[tri_arr[:, 0]] - p
        b = all_pts[tri_arr[:, 1]] - p
        c = all_pts[tri_arr[:, 2]] - p
        a2 = (a * a).sum(1)
        b2 = (b * b).sum(1)
        c2 = (c * c).sum(1)
        det = (
            a[:, 0] * (b[:, 1] * c2 - c[:, 1] * b2)
            - a[:, 1] * (b[:, 0] * c2 - c[:, 0] * b2)
            + a2 * (b[:, 0] * c[:, 1] - c[:, 0] * b[:, 1])
        )
        # sign convention depends on orientation; normalize with orientation
        ax = all_pts[tri_arr[:, 1]] - all_pts[tri_arr[:, 0]]
        ay = all_pts[tri_arr[:, 2]] - all_pts[tri_arr[:, 0]]
        orient = ax[:, 0] * ay[:, 1] - ax[:, 1] * ay[:, 0]
        return det * np.sign(orient) > 1e-12

    # insertion order: randomized-by-hash but deterministic (seeded shuffle
    # avoids the adversarial O(n^2) sorted-input case)
    order = np.argsort((np.arange(n, dtype=np.int64) * 2654435761) % 4294967296, kind="stable")

    for pi in order:
        p = pts[pi]
        tri_arr = np.asarray(tris, dtype=np.int64)
        bad_mask = circumcontains(tri_arr, p)
        bad = tri_arr[bad_mask]
        if bad.shape[0] == 0:
            # a point strictly inside the super-triangle is always inside
            # the circumcircle of its containing triangle; empty here means
            # a numerically-coincident point — skip it (reference tolerates
            # degenerate clouds by warn+skip, convert.go:714-717)
            continue
        # boundary of the cavity: edges appearing exactly once among bad tris
        edges = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        boundary = [k for k, cnt in edges.items() if cnt == 1]
        tris = [tuple(t) for t in tri_arr[~bad_mask]]
        for a, b in boundary:
            tris.append((a, b, int(pi)))

    out = [t for t in tris if t[0] < n and t[1] < n and t[2] < n]
    if not out:
        raise ValueError("triangulation produced no interior triangles")
    tri_arr = np.asarray(out, dtype=np.int64)
    # canonical orientation (CCW) + canonical vertex rotation for determinism
    a = all_pts[tri_arr[:, 1]] - all_pts[tri_arr[:, 0]]
    b = all_pts[tri_arr[:, 2]] - all_pts[tri_arr[:, 0]]
    cw = (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]) < 0
    tri_arr[cw] = tri_arr[cw][:, [0, 2, 1]]
    roll = np.argmin(tri_arr, axis=1)
    rows = np.arange(tri_arr.shape[0])[:, None]
    cols = (np.arange(3)[None, :] + roll[:, None]) % 3
    tri_arr = tri_arr[rows, cols]
    # deterministic triangle order
    keys = np.lexsort((tri_arr[:, 2], tri_arr[:, 1], tri_arr[:, 0]))
    tri_arr = tri_arr[keys]
    # map deduped indices back to original input row numbers
    return first_idx[tri_arr]
