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
