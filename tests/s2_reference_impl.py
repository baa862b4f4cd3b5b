"""Independent scalar re-implementation of the golang/geo covering chain,
used ONLY as a cross-check oracle for convert_spark.kernels.s2.

The production kernel is vectorized numpy with masked branches; this file
is a deliberately naive, per-edge scalar transliteration of the published
algorithms (s2geometry.io + the Apache-licensed golang/geo sources'
documented formulas): s1.Interval as a tiny class, RectBounder as a
stateful AddPoint loop, chord angles via math.*. Two structurally
different clean-room implementations agreeing across random inputs is the
strongest parity evidence available in a sandbox with no Go toolchain
(tests/test_kernels_geo.py::TestS2CrossValidation).

Deviations shared with the production kernel (so agreement here does not
vacuously follow from copy-paste): the pole-containment probe. Everything
else — interval arithmetic, edge extrema, cap bounds, Ilogb level math —
is written independently from the published descriptions.
"""

from __future__ import annotations

import math

DBL_EPS = 2.220446049250313e-16
MIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0
ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


# --- tiny vector helpers -----------------------------------------------------


def sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def norm(a):
    return math.sqrt(dot(a, a))


def normalize(a):
    n = norm(a)
    if n == 0:
        return ORIGIN  # PointFromCoords(0,0,0) -> OriginPoint
    return (a[0] / n, a[1] / n, a[2] / n)


def latlng(p):
    return math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0])


def from_latlng(lat, lng):
    return (math.cos(lng) * math.cos(lat), math.sin(lng) * math.cos(lat), math.sin(lat))


# --- s1.Interval -------------------------------------------------------------


class S1Interval:
    """Longitude interval on the circle, endpoints in (-pi, pi]."""

    def __init__(self, lo: float, hi: float):
        self.lo, self.hi = lo, hi

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -math.pi:
            p = math.pi
        return S1Interval(p, p)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-math.pi, math.pi)

    def is_full(self) -> bool:
        return self.hi - self.lo == 2 * math.pi

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return p >= self.lo or p <= self.hi
        return self.lo <= p <= self.hi

    def length(self) -> float:
        l = self.hi - self.lo
        return l if l >= 0 else l + 2 * math.pi

    def center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return c
        return c + math.pi if c <= 0 else c - math.pi

    @staticmethod
    def _pos_dist(a: float, b: float) -> float:
        d = b - a
        return d if d >= 0 else (b + math.pi) - (a - math.pi)

    def add_point(self, p: float) -> "S1Interval":
        if p == -math.pi:
            p = math.pi
        if self.fast_contains(p):
            return self
        if self._pos_dist(p, self.lo) < self._pos_dist(self.hi, p):
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return y.lo >= self.lo or y.hi <= self.hi
        if y.is_inverted():
            return self.is_full()
        return y.lo >= self.lo and y.hi <= self.hi

    def union(self, y: "S1Interval") -> "S1Interval":
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if self.contains_interval(y):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, y.hi)
        if self.fast_contains(y.hi):
            return S1Interval(y.lo, self.hi)
        if y.fast_contains(self.lo):
            return y
        if self._pos_dist(y.hi, self.lo) < self._pos_dist(self.hi, y.lo):
            return S1Interval(y.lo, self.hi)
        return S1Interval(self.lo, y.hi)


# --- RectBounder -------------------------------------------------------------


class RectBounder:
    def __init__(self):
        self.a = None
        self.a_ll = None
        self.lat_lo = 1.0  # empty r1 interval
        self.lat_hi = 0.0
        self.lng: S1Interval | None = None
        self.full_lat = False

    def _union_rect(self, lat_lo, lat_hi, lng: S1Interval):
        if self.lng is None:
            self.lat_lo, self.lat_hi, self.lng = lat_lo, lat_hi, lng
        else:
            self.lat_lo = min(self.lat_lo, lat_lo)
            self.lat_hi = max(self.lat_hi, lat_hi)
            self.lng = self.lng.union(lng)

    def add_point(self, b):
        b_ll = latlng(b)
        if self.a is None:
            self.a, self.a_ll = b, b_ll
            self._union_rect(b_ll[0], b_ll[0], S1Interval.from_point(b_ll[1]))
            return
        a, a_ll = self.a, self.a_ll
        n = cross(sub(a, b), add(a, b))  # 2 * (A x B)
        n_norm = norm(n)
        if n_norm < 1.91346e-15:
            if dot(a, b) < 0:
                # near-antipodal: the edge could go anywhere
                self._union_rect(-math.pi / 2, math.pi / 2, S1Interval.full())
            else:
                # near-identical: endpoint rect only
                lng = S1Interval.from_point(a_ll[1]).add_point(b_ll[1])
                self._union_rect(min(a_ll[0], b_ll[0]), max(a_ll[0], b_ll[0]), lng)
            self.a, self.a_ll = b, b_ll
            return
        lng_ab = S1Interval.from_point(a_ll[1]).add_point(b_ll[1])
        if lng_ab.length() >= math.pi - 2 * DBL_EPS:
            lng_ab = S1Interval.full()
        lat_lo, lat_hi = min(a_ll[0], b_ll[0]), max(a_ll[0], b_ll[0])
        # latitude extrema along the great circle through A and B
        m = cross(n, (0.0, 0.0, 1.0))
        m_a = dot(m, a)
        m_b = dot(m, b)
        m_err = 6.06638e-16 * n_norm + 6.83174e-31
        if m_a * m_b < 0 or abs(m_a) <= m_err or abs(m_b) <= m_err:
            max_lat = min(
                math.atan2(math.hypot(n[0], n[1]), abs(n[2])) + 3 * DBL_EPS, math.pi / 2
            )
            lat_budget = 2 * math.asin(
                max(-1.0, min(1.0, 0.5 * norm(sub(a, b)) * math.sin(max_lat)))
            )
            max_delta = 0.5 * (lat_budget - (lat_hi - lat_lo)) + DBL_EPS
            if m_a <= m_err and m_b >= -m_err:
                lat_hi = min(max_lat, lat_hi + max_delta)
            if m_b <= m_err and m_a >= -m_err:
                lat_lo = max(-max_lat, lat_lo - max_delta)
        self._union_rect(lat_lo, lat_hi, lng_ab)
        self.a, self.a_ll = b, b_ll

    def rect_bound(self):
        lat_lo = max(self.lat_lo - 2 * DBL_EPS, -math.pi / 2)
        lat_hi = min(self.lat_hi + 2 * DBL_EPS, math.pi / 2)
        lng = self.lng
        if lat_lo == -math.pi / 2 or lat_hi == math.pi / 2:
            lng = S1Interval.full()
        return lat_lo, lat_hi, lng


# --- loop containment (shared centroid-probe deviation) ----------------------


def _simple_crossing(a, b, c, d) -> bool:
    ab = cross(a, b)
    acb = -dot(ab, c)
    bda = dot(ab, d)
    cd = cross(c, d)
    cbd = -dot(cd, b)
    dac = dot(cd, a)
    return acb * bda > 0 and acb * cbd > 0 and cbd * dac > 0 and dac * bda > 0


def loop_contains(verts, p) -> bool:
    k = len(verts)
    cen = (0.0, 0.0, 0.0)
    for v in verts:
        cen = add(cen, v)
    if norm(cen) == 0:
        return False
    cen = normalize(cen)
    degenerate = all(
        abs(dot(cross(verts[0], verts[1]), verts[i])) < 1e-300 for i in range(2, k)
    )
    if degenerate:
        return False
    det_sum = sum(dot(cross(verts[i], verts[(i + 1) % k]), cen) for i in range(k))
    crossings = sum(
        _simple_crossing(cen, p, verts[i], verts[(i + 1) % k]) for i in range(k)
    )
    even = crossings % 2 == 0
    return even if det_sum > 0 else not even


# --- Rect.CapBound + Cap.CellUnionBound level --------------------------------


def loop_cap(raw_corners):
    """Raw loop corners [(x, y, z), ...] -> (cap_center, cap_radius_rad)."""
    verts = [normalize(c) for c in raw_corners]
    rb = RectBounder()
    for i in range(len(verts) + 1):  # closed chain: vertex 0 twice
        rb.add_point(verts[i % len(verts)])
    lat_lo, lat_hi, lng = rb.rect_bound()
    if loop_contains(verts, (0.0, 0.0, 1.0)):
        lat_hi, lng = math.pi / 2, S1Interval.full()
    if lng.is_full() and loop_contains(verts, (0.0, 0.0, -1.0)):
        lat_lo = -math.pi / 2
    # Rect.CapBound
    if lat_lo + lat_hi < 0:
        pole, pole_angle = (0.0, 0.0, -1.0), math.pi / 2 + lat_hi
    else:
        pole, pole_angle = (0.0, 0.0, 1.0), math.pi / 2 - lat_lo
    pole_chord2 = (2.0 * math.sin(0.5 * min(math.pi, pole_angle))) ** 2
    pole_rad = 2.0 * math.asin(0.5 * math.sqrt(pole_chord2))
    if lng.length() < 2 * math.pi:
        center = from_latlng(0.5 * (lat_lo + lat_hi), lng.center())
        chord2 = 0.0
        for la, ln in ((lat_lo, lng.lo), (lat_hi, lng.hi)):
            v = from_latlng(la, ln)
            chord2 = max(chord2, min(4.0, dot(sub(center, v), sub(center, v))))
        mid_rad = 2.0 * math.asin(0.5 * math.sqrt(chord2))
        if mid_rad < pole_rad:
            return center, mid_rad
    return pole, pole_rad


def min_width_max_level(val: float) -> int:
    """Go Metric.MaxLevel for dim=1: -Ilogb(val/deriv), clamped [0, 30]."""
    if val <= 0:
        return 30
    ilogb = math.frexp(val / MIN_WIDTH_DERIV)[1] - 1
    return max(0, min(30, -ilogb))


def covering_level(raw_corners) -> tuple:
    """(level, cap_center): level < 0 means the 6 face cells."""
    center, radius = loop_cap(raw_corners)
    return min_width_max_level(radius) - 1, center


# --- scalar cell ids / tokens / vertex neighbors -----------------------------
#
# Independent re-derivation of the S2 cell-id machinery for the KAT twin
# (tests/gen_kats.py): unlike the production kernel's 4-bit Hilbert lookup
# tables (kernels/s2.py), this walks the published 2-bit-per-level Hilbert
# recursion directly from the canonical posToIJ / posToOrientation tables
# (s2geometry.io, "S2 Cell Hierarchy") — a structurally different
# formulation of the same public algorithm.

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)
# inverse: _IJ_TO_POS[orient][ij] = pos  with  _POS_TO_IJ[orient][pos] = ij
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)

_FACE_UVW = (
    # face -> xyz of (u-axis component mapping): xyz(u, v) per face
    lambda u, v: (1.0, u, v),
    lambda u, v: (-u, 1.0, v),
    lambda u, v: (-u, -v, 1.0),
    lambda u, v: (-1.0, -v, -u),
    lambda u, v: (v, -1.0, -u),
    lambda u, v: (v, u, -1.0),
)


def face_uv_to_xyz_s(face: int, u: float, v: float):
    return _FACE_UVW[face](u, v)


def xyz_to_face_uv_s(p) -> tuple:
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    axis = 0 if (ax >= ay and ax >= az) else (1 if ay >= az else 2)
    face = axis + (3 if (x, y, z)[axis] < 0 else 0)
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def uv_to_st_s(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(abs(1.0 - 3.0 * u))


def st_to_ij_s(s: float) -> int:
    return max(0, min(MAX_SIZE - 1, math.floor(MAX_SIZE * s)))


def leaf_from_face_ij(face: int, i: int, j: int) -> int:
    """Leaf cell id via the direct per-level Hilbert walk (MSB first)."""
    orient = face & _SWAP
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient][ij]
        pos = (pos << 2) | p
        orient ^= _POS_TO_ORIENT[p]
    return (face << (2 * MAX_LEVEL + 1)) | (pos << 1) | 1


def face_ij_from_leaf(cid: int) -> tuple:
    face = cid >> (2 * MAX_LEVEL + 1)
    pos = (cid >> 1) & ((1 << (2 * MAX_LEVEL)) - 1)
    orient = face & _SWAP
    i = j = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij = _POS_TO_IJ[orient][p]
        i |= (ij >> 1) << k
        j |= (ij & 1) << k
        orient ^= _POS_TO_ORIENT[p]
    return face, i, j


def leaf_from_point(p) -> int:
    face, u, v = xyz_to_face_uv_s(p)
    return leaf_from_face_ij(face, st_to_ij_s(uv_to_st_s(u)), st_to_ij_s(uv_to_st_s(v)))


def parent_at_s(cid: int, level: int) -> int:
    new_lsb = 1 << (2 * (MAX_LEVEL - level))
    return (cid & ~(new_lsb - 1)) | new_lsb


def _leaf_from_face_ij_wrap(face: int, i: int, j: int) -> int:
    """Cross-face neighbor resolution (public FromFaceIJWrap): clamp to
    one-past-the-edge, project the LINEAR-st leaf center to xyz, resolve
    on the new face."""
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    limit = math.nextafter(1.0, 2.0)
    u = max(-limit, min(limit, scale * ((i << 1) + 1 - MAX_SIZE)))
    v = max(-limit, min(limit, scale * ((j << 1) + 1 - MAX_SIZE)))
    nf, nu, nv = xyz_to_face_uv_s(face_uv_to_xyz_s(face, u, v))
    # linear st on re-entry (0.5*(u+1)) — published wrap quirk
    ni = max(0, min(MAX_SIZE - 1, math.floor(MAX_SIZE * 0.5 * (nu + 1.0))))
    nj = max(0, min(MAX_SIZE - 1, math.floor(MAX_SIZE * 0.5 * (nv + 1.0))))
    return leaf_from_face_ij(nf, ni, nj)


def _leaf_same(face: int, i: int, j: int, same_face: bool) -> int:
    if same_face:
        return leaf_from_face_ij(face, i, j)
    return _leaf_from_face_ij_wrap(face, i, j)


def vertex_neighbors_s(cid: int, level: int) -> list:
    """The 3-4 cells at ``level`` sharing the leaf's closest vertex
    (public VertexNeighbors), in the canonical emit order."""
    half = 1 << (MAX_LEVEL - (level + 1))
    size = half << 1
    f, i, j = face_ij_from_leaf(cid)
    if i & half:
        ioff, isame = size, (i + size) < MAX_SIZE
    else:
        ioff, isame = -size, (i - size) >= 0
    if j & half:
        joff, jsame = size, (j + size) < MAX_SIZE
    else:
        joff, jsame = -size, (j - size) >= 0
    res = [
        parent_at_s(cid, level),
        parent_at_s(_leaf_same(f, i + ioff, j, isame), level),
        parent_at_s(_leaf_same(f, i, j + joff, jsame), level),
    ]
    if isame or jsame:
        res.append(parent_at_s(_leaf_same(f, i + ioff, j + joff, isame and jsame), level))
    return res


def token_s(cid: int) -> str:
    s = f"{cid:016x}".rstrip("0")
    return s if s else "X"


# --- scalar GetElev twin (deterministic DEM fixture, FIXTURES.md §5) ---------

_R_EARTH = 6378137.0
_DLAT = _DLON = 0.25
_LAT0, _LON0 = -90.0, -180.0
_NLAT, _NLON = 721, 1441


def _round_half_away_s(v: float, decimals: int) -> float:
    scale = 10.0 ** decimals
    a = abs(v) * scale
    f = math.floor(a)
    r = f + (1.0 if a - f >= 0.5 else 0.0)
    return math.copysign(1.0, v) * r / scale if v != 0 else 0.0


def to4326_s(x: float, y: float) -> tuple:
    if abs(x) <= 180.0 and abs(y) <= 180.0:
        return x, y
    lon = math.degrees(x / _R_EARTH)
    lat = math.degrees(2.0 * math.atan(math.exp(y / _R_EARTH)) - math.pi / 2.0)
    return _round_half_away_s(lon, 4), _round_half_away_s(lat, 4)


def _dem_value(i: int, j: int) -> float:
    lat = _LAT0 + _DLAT * i
    lon = _LON0 + _DLON * j
    return 500.0 + 300.0 * math.sin(lat / 10.0) * math.cos(lon / 10.0)


def get_elev_s(x3857: float, y3857: float) -> float:
    lon, lat = to4326_s(x3857, y3857)
    fi = (lat - _LAT0) / _DLAT
    fj = (lon - _LON0) / _DLON
    if not (0 <= fi <= _NLAT - 1 and 0 <= fj <= _NLON - 1):
        return float("nan")
    i0 = min(int(math.floor(fi)), _NLAT - 2)
    j0 = min(int(math.floor(fj)), _NLON - 2)
    di, dj = fi - i0, fj - j0
    return (
        _dem_value(i0, j0) * (1 - di) * (1 - dj)
        + _dem_value(i0 + 1, j0) * di * (1 - dj)
        + _dem_value(i0, j0 + 1) * (1 - di) * dj
        + _dem_value(i0 + 1, j0 + 1) * di * dj
    )


def covering_tokens_s(lx: float, ly: float, rx: float, uy: float) -> list:
    """Full scalar twin of the reference's quirky bbox covering
    (convert.go:1151-1192): 3857 bbox -> 8-char tokens, no dedup."""
    if not all(map(math.isfinite, (lx, ly, rx, uy))):
        return []
    cz = get_elev_s(rx, uy)
    if math.isnan(cz):
        return []
    rx4, uy4 = to4326_s(rx, uy)
    lx4, ly4 = to4326_s(lx, ly)
    # quirk: PointFromCoords(lon, lat, cz) — raw R^3 corner vectors
    corners = [(rx4, uy4, cz), (lx4, uy4, cz), (lx4, ly4, cz), (rx4, ly4, cz)]
    level, center = covering_level(corners)
    if level < 0:
        cells = [(f << (2 * MAX_LEVEL + 1)) | (1 << (2 * MAX_LEVEL)) for f in range(6)]
    else:
        cells = vertex_neighbors_s(leaf_from_point(center), level)
    return [token_s(c)[:8] for c in cells]
