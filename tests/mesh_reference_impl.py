"""Independent scalar twin for the mesh-drape KAT oracle (round 6).

Re-derives the drape pipeline — deterministic DEM cloud over the outer
rings' bbox, even-odd PIP trim, incremental Bowyer-Watson triangulation,
centroid trim, web-mercator projection — in plain-Python scalar loops and
lists, structurally disjoint from the vectorized production kernels
(convert_spark/operators/features.py `_drape_one`,
kernels/delaunay.py, kernels/pip.py, kernels/dem.py, kernels/mercator.py).

Twin philosophy (same as tests/media_reference_impl.py): the SPEC is
shared — published Bowyer-Watson with the repo's documented determinism
choices (Knuth-hash insertion order, 1e-12 in-circle guard, CCW + min-
rotation + lexsort canonicalization), the FIXTURES.md DEM surface, the
even-odd ray cast, Go-round web mercator — but every arithmetic step here
is evaluated scalar in the same IEEE operation order, so agreement is
bit-level on the triangle sets (xy inputs are exact linspace grids) and
well inside rounding tolerance on the projected sums. A disagreement
means one side deviated from the spec, which is exactly what the KAT gate
is for.

Known structural deviation (documented): the production collinearity
guard is an SVD rank test; the twin uses the closed-form 2x2 covariance
eigenvalues (same sigma values mathematically). Both only decide
raise-vs-proceed, and the mesh corpus sits far from that boundary.
"""

from __future__ import annotations

import math

# --- DEM (FIXTURES.md 5: closed-form surface on a 0.25-degree grid) -----

DLAT = DLON = 0.25
LAT0, LON0 = -90.0, -180.0
NLAT, NLON = 721, 1441


def _grid_val(i: int, j: int) -> float:
    lat = LAT0 + DLAT * i
    lon = LON0 + DLON * j
    return 500.0 + 300.0 * math.sin(lat / 10.0) * math.cos(lon / 10.0)


def dem_sample_s(lat: float, lon: float) -> float:
    """Scalar bilinear sample; 0.0 outside the grid (drape's NaN->0)."""
    fi = (lat - LAT0) / DLAT
    fj = (lon - LON0) / DLON
    if not (0 <= fi <= NLAT - 1 and 0 <= fj <= NLON - 1):
        return 0.0
    i0 = min(int(fi), NLAT - 2)
    j0 = min(int(fj), NLON - 2)
    di = fi - i0
    dj = fj - j0
    return (
        _grid_val(i0, j0) * (1 - di) * (1 - dj)
        + _grid_val(i0 + 1, j0) * di * (1 - dj)
        + _grid_val(i0, j0 + 1) * (1 - di) * dj
        + _grid_val(i0 + 1, j0 + 1) * di * dj
    )


# --- mercator (convert.go:1269-1282 semantics, scalar) ------------------

R_EARTH = 6378137.0


def _round_half_away_s(v: float, decimals: int) -> float:
    scale = 10.0**decimals
    a = abs(v) * scale
    f = math.floor(a)
    r = f + (1.0 if a - f >= 0.5 else 0.0)
    return math.copysign(r / scale, v) if v != 0 else 0.0


def to3857_s(lon: float, lat: float) -> tuple[float, float]:
    if abs(lon) <= 180.0 and abs(lat) <= 180.0:
        mx = R_EARTH * math.radians(lon)
        my = R_EARTH * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    else:
        mx, my = lon, lat
    return _round_half_away_s(mx, 2), _round_half_away_s(my, 2)


# --- even-odd PIP (scalar ray cast) -------------------------------------


def _ring_crossings_s(x: float, y: float, ring: list) -> int:
    cnt = 0
    for (xi, yi), (xj, yj) in zip(ring[:-1], ring[1:]):
        if (yi > y) != (yj > y):
            x_int = (xj - xi) * (y - yi) / (yj - yi) + xi
            if x < x_int:
                cnt += 1
    return cnt


def point_in_multipolygon_s(x: float, y: float, polygons: list) -> bool:
    cnt = 0
    for poly in polygons:
        for ring in poly:
            r = [(v[0], v[1]) for v in ring]
            if r and r[0] != r[-1]:
                r = r + [r[0]]
            if len(r) < 4:
                continue
            cnt += _ring_crossings_s(x, y, r)
    return cnt % 2 == 1


# --- Bowyer-Watson (scalar; spec choices mirror kernels/delaunay.py) ----


def _linspace_s(a: float, b: float, k: int) -> list[float]:
    step = (b - a) / (k - 1)
    vals = [a + i * step for i in range(k)]
    vals[-1] = b  # exact endpoint, like np.linspace
    return vals


def triangulate_s(pts_xy: list) -> list[tuple[int, int, int]]:
    """Scalar Bowyer-Watson; returns canonical (CCW, min-rotated,
    lexsorted) triangles as ORIGINAL input indices. Raises ValueError on
    <3 distinct / collinear clouds, like the kernel."""
    # dedupe, keep first occurrence
    seen = {}
    for i, p in enumerate(pts_xy):
        key = (p[0], p[1])
        if key not in seen:
            seen[key] = i
    first_idx = sorted(seen.values())
    pts = [(pts_xy[i][0], pts_xy[i][1]) for i in first_idx]
    n = len(pts)
    if n < 3:
        raise ValueError("need >= 3 distinct points")
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    # collinearity: closed-form eigenvalues of the 2x2 scatter matrix
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    syy = sum((p[1] - my) ** 2 for p in pts)
    sxy = sum((p[0] - mx) * (p[1] - my) for p in pts)
    tr, det = sxx + syy, sxx * syy - sxy * sxy
    disc = math.sqrt(max(tr * tr / 4.0 - det, 0.0))
    sig_max = math.sqrt(max(tr / 2.0 + disc, 0.0))
    sig_min = math.sqrt(max(tr / 2.0 - disc, 0.0))
    if sig_min <= 1e-12 * max(sig_max, 1.0):
        raise ValueError("collinear point cloud")

    span_x = max(p[0] for p in pts) - min(p[0] for p in pts)
    span_y = max(p[1] for p in pts) - min(p[1] for p in pts)
    d = max(span_x, span_y, 1e-9) * 16.0
    all_pts = pts + [(mx - d, my - d), (mx + d, my - d), (mx, my + d)]
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]

    def circumcontains(t: tuple[int, int, int], p: tuple[float, float]) -> bool:
        a0 = all_pts[t[0]][0] - p[0]
        a1 = all_pts[t[0]][1] - p[1]
        b0 = all_pts[t[1]][0] - p[0]
        b1 = all_pts[t[1]][1] - p[1]
        c0 = all_pts[t[2]][0] - p[0]
        c1 = all_pts[t[2]][1] - p[1]
        a2 = a0 * a0 + a1 * a1
        b2 = b0 * b0 + b1 * b1
        c2 = c0 * c0 + c1 * c1
        det = a0 * (b1 * c2 - c1 * b2) - a1 * (b0 * c2 - c0 * b2) + a2 * (b0 * c1 - c0 * b1)
        ax0 = all_pts[t[1]][0] - all_pts[t[0]][0]
        ax1 = all_pts[t[1]][1] - all_pts[t[0]][1]
        ay0 = all_pts[t[2]][0] - all_pts[t[0]][0]
        ay1 = all_pts[t[2]][1] - all_pts[t[0]][1]
        orient = ax0 * ay1 - ax1 * ay0
        sign = 0.0 if orient == 0 else math.copysign(1.0, orient)
        return det * sign > 1e-12

    order = sorted(range(n), key=lambda i: ((i * 2654435761) % 4294967296, i))
    for pi in order:
        p = pts[pi]
        bad = [t for t in tris if circumcontains(t, p)]
        if not bad:
            continue  # numerically-coincident point — skip (kernel parity)
        edges: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        boundary = [k for k, cnt in edges.items() if cnt == 1]
        bad_set = set(bad)
        tris = [t for t in tris if t not in bad_set]
        for a, b in boundary:
            tris.append((a, b, pi))

    out = []
    for t in tris:
        if t[0] < n and t[1] < n and t[2] < n:
            # CCW normalize
            ax0 = all_pts[t[1]][0] - all_pts[t[0]][0]
            ax1 = all_pts[t[1]][1] - all_pts[t[0]][1]
            ay0 = all_pts[t[2]][0] - all_pts[t[0]][0]
            ay1 = all_pts[t[2]][1] - all_pts[t[0]][1]
            if ax0 * ay1 - ax1 * ay0 < 0:
                t = (t[0], t[2], t[1])
            # rotate min index first
            m = t.index(min(t))
            t = (t[m], t[(m + 1) % 3], t[(m + 2) % 3])
            out.append(t)
    if not out:
        raise ValueError("triangulation produced no interior triangles")
    out.sort()
    return [(first_idx[a], first_idx[b], first_idx[c]) for a, b, c in out]


def _centroid_s(p0, p1, p2) -> tuple[float, float]:
    """Shoelace area centroid with the vertex-mean fallback (mirrors
    kernels/geometrics.triangle_centroids semantics)."""
    xs = (p0[0], p1[0], p2[0])
    ys = (p0[1], p1[1], p2[1])
    cross = [xs[i] * ys[(i + 1) % 3] - xs[(i + 1) % 3] * ys[i] for i in range(3)]
    a2 = sum(cross)
    if a2 != 0:
        cx = sum((xs[i] + xs[(i + 1) % 3]) * cross[i] for i in range(3)) / (3.0 * a2)
        cy = sum((ys[i] + ys[(i + 1) % 3]) * cross[i] for i in range(3)) / (3.0 * a2)
        if math.isfinite(cx) and math.isfinite(cy):
            return cx, cy
    return sum(xs) / 3.0, sum(ys) / 3.0


def drape_s(row: dict, cloud_k: int = 10):
    """Scalar twin of features._drape_one: row has verts_raw/ring_offsets/
    part_offsets/geom_kind. Returns (vertices, indices) or None."""
    verts = [list(map(float, v)) for v in row["verts_raw"]]
    offs = list(row["ring_offsets"])
    parts = list(row["part_offsets"])
    rings = [verts[offs[r] : offs[r + 1]] for r in range(len(offs) - 1)]
    nested = [
        [[v[:2] for v in rings[r]] for r in range(parts[p], parts[p + 1])]
        for p in range(len(parts) - 1)
    ]
    is_multi = row["geom_kind"] == "multipolygon"
    outer = [v for r in range(parts[0], parts[1]) for v in rings[r]]
    lx = min(v[0] for v in outer)
    rx = max(v[0] for v in outer)
    ly = min(v[1] for v in outer)
    uy = max(v[1] for v in outer)
    gx = _linspace_s(lx, rx, cloud_k)
    gy = _linspace_s(ly, uy, cloud_k)
    cloud = [(x, y, dem_sample_s(y, x)) for y in gy for x in gx]  # meshgrid ravel order
    if is_multi:
        cloud = [c for c in cloud if point_in_multipolygon_s(c[0], c[1], nested)]
    try:
        tris = triangulate_s([(c[0], c[1]) for c in cloud])
    except ValueError:
        return None
    if is_multi:
        kept = []
        for t in tris:
            cx, cy = _centroid_s(cloud[t[0]], cloud[t[1]], cloud[t[2]])
            if point_in_multipolygon_s(cx, cy, nested):
                kept.append(t)
        tris = kept
    vertices = []
    for x, y, z in cloud:
        px, py = to3857_s(x, y)
        vertices.append([px, py, z])
    indices = [i for t in tris for i in t]
    return vertices, indices
