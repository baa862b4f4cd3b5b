"""S2 cell-id math from scratch (numpy), plus the reference's quirky
bbox covering.

This is a clean-room reimplementation of the *public* S2 geometry
algorithms (s2geometry.io; the Apache-licensed C++/Go libraries document
the cell-id bit layout, the quadratic ST projection, and the Hilbert-curve
lookup-table construction). No S2 library is available in this sandbox, so
everything below is derived from the published algorithm descriptions.

Parity target: ``s2covering`` at /root/reference/convert.go:1151-1192,
including its quirks (SURVEY.md §7.1 item 5):

* bbox corners are converted 3857 -> 4326 (convert.go:1160-1161),
* ``cz`` is the DEM elevation sampled at the **raw 3857** corner (rx, uy)
  (convert.go:1164),
* the four corner points are built as ``PointFromCoords(lon, lat, cz)`` —
  i.e. the degree values and the elevation are treated as a raw R^3 vector
  and normalized, NOT interpreted as a LatLng (convert.go:1170-1175),
* covering = ``LoopFromPoints(corners).CellUnionBound()`` — i.e. the loop's
  bounding cap decomposed into at most 4 cells (convert.go:1177-1178),
* tokens are truncated to their first 8 characters (convert.go:1180-1186).

The loop bound implements the full published RectBounder algorithm (edge
latitude extrema, near-identical/near-antipodal fallbacks, 2eps expansion,
polar closure) plus Loop.initBound's pole-containment adjustments and
Rect.CapBound's chord-angle radius math; MinWidthMetric.MaxLevel uses the
Ilogb rounding of the Go library (see the covering section header for the
two remaining degenerate-input deviations). Goldens are pinned from this
implementation (SURVEY.md §5.2) — no Go toolchain exists in this sandbox.
"""

from __future__ import annotations

import math

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

_SWAP = 0x01
_INVERT = 0x02
_LOOKUP_BITS = 4
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

# --- Hilbert lookup tables (public construction) --------------------------
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orient
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(level, i + (r[idx] >> 1), j + (r[idx] & 1), orig, pos + idx, orient ^ _POS_TO_ORIENT[idx])


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)

# --- face/uv/st transforms -------------------------------------------------


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(face, u, v) -> unnormalized xyz. Standard face table."""
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.select([face == f for f in range(6)], xs)
    y = np.select([face == f for f in range(6)], ys)
    z = np.select([face == f for f in range(6)], zs)
    return np.stack([x, y, z], axis=-1)


def xyz_to_face_uv(p: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """xyz -> (face, u, v)."""
    p = np.asarray(p, dtype=np.float64).reshape(-1, 3)
    ax = np.abs(p)
    axis = np.argmax(ax, axis=1)
    comp = p[np.arange(p.shape[0]), axis]
    face = axis + np.where(comp < 0, 3, 0)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        u = np.select([face == f for f in range(6)], [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select([face == f for f in range(6)], [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face.astype(np.int64), u, v


def st_to_uv(s: np.ndarray) -> np.ndarray:
    """Quadratic ST -> UV (the projection the production S2 libs use)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4 * s * s - 1), (1.0 / 3.0) * (1 - 4 * (1 - s) * (1 - s)))


def uv_to_st(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1 + 3 * u), 1 - 0.5 * np.sqrt(np.abs(1 - 3 * u)))


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(MAX_SIZE * np.asarray(s, dtype=np.float64)).astype(np.int64), 0, MAX_SIZE - 1)


# --- cell ids ---------------------------------------------------------------


def cellid_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf cell id from (face, i, j) — vectorized 4-bit Hilbert steps."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = face & _SWAP
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return (n * np.uint64(2) + np.uint64(1)).astype(np.uint64)


def cellid_from_point(p: np.ndarray) -> np.ndarray:
    """Unit (or any nonzero) xyz vectors -> leaf cell ids."""
    face, u, v = xyz_to_face_uv(p)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return cellid_from_face_ij(face, i, j)


def cellid_from_latlng(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    p = np.stack([np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], axis=-1)
    return cellid_from_point(p)


def lsb(cid: np.ndarray) -> np.ndarray:
    c = np.asarray(cid, dtype=np.uint64)
    return c & (~c + np.uint64(1))


def level_of(cid: np.ndarray) -> np.ndarray:
    """Level from trailing-zero count: level = 30 - tz/2."""
    c = np.asarray(cid, dtype=np.uint64)
    low = lsb(c).astype(np.float64)
    tz = np.round(np.log2(low)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent_at(cid: np.ndarray, level: int) -> np.ndarray:
    c = np.asarray(cid, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (c & (~(new_lsb - np.uint64(1)))) | new_lsb


def token(cid) -> str:
    """Canonical S2 token: %016x with trailing zeros stripped ('X' if empty)."""
    s = f"{int(cid):016x}".rstrip("0")
    return s if s else "X"


def face_ij_of_vec(cids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized inverse of cellid_from_face_ij for leaf cells."""
    c = np.asarray(cids, dtype=np.uint64)
    face = (c >> np.uint64(POS_BITS)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    for k in range(7, -1, -1):
        nbits = _LOOKUP_BITS if k != 7 else (MAX_LEVEL - 7 * _LOOKUP_BITS)
        mask = (1 << (2 * nbits)) - 1
        bits += ((c >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64) & mask) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def parent_at_vec(cid: np.ndarray, level: np.ndarray) -> np.ndarray:
    """parent_at with a per-row level array."""
    c = np.asarray(cid, dtype=np.uint64)
    lv = np.asarray(level, dtype=np.uint64)
    new_lsb = np.uint64(1) << (np.uint64(2) * (np.uint64(MAX_LEVEL) - lv))
    return (c & (~(new_lsb - np.uint64(1)))) | new_lsb


def face_ij_of(cid: int) -> tuple[int, int, int]:
    """Scalar inverse: leaf-ish cell id -> (face, i, j) (orientation dropped)."""
    c = int(cid)
    face = c >> POS_BITS
    bits = face & _SWAP
    i = j = 0
    for k in range(7, -1, -1):
        nbits = _LOOKUP_BITS if k != 7 else (MAX_LEVEL - 7 * _LOOKUP_BITS)
        bits += ((c >> (k * 2 * _LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        bits = int(_LOOKUP_IJ[bits])
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def _cellid_from_face_ij_wrap(f: int, i: int, j: int) -> int:
    """Neighbor helper across face boundaries (public algorithm: project the
    just-out-of-range leaf center back onto the sphere and re-resolve)."""
    i = max(-1, min(MAX_SIZE, i))
    j = max(-1, min(MAX_SIZE, j))
    scale = 1.0 / MAX_SIZE
    limit = math.nextafter(1.0, 2.0)
    u = max(-limit, min(limit, scale * ((i << 1) + 1 - MAX_SIZE)))
    v = max(-limit, min(limit, scale * ((j << 1) + 1 - MAX_SIZE)))
    p = face_uv_to_xyz(np.array([f]), np.array([u]), np.array([v]))
    nf, nu, nv = xyz_to_face_uv(p)
    # linear ST here (0.5*(u+1)), matching the published wrap logic
    ni = np.clip(np.floor(MAX_SIZE * 0.5 * (nu + 1.0)).astype(np.int64), 0, MAX_SIZE - 1)
    nj = np.clip(np.floor(MAX_SIZE * 0.5 * (nv + 1.0)).astype(np.int64), 0, MAX_SIZE - 1)
    return int(cellid_from_face_ij(nf, ni, nj)[0])


def _cellid_from_face_ij_same(f: int, i: int, j: int, same_face: bool) -> int:
    if same_face:
        return int(cellid_from_face_ij(np.array([f]), np.array([i]), np.array([j]))[0])
    return _cellid_from_face_ij_wrap(f, i, j)


def vertex_neighbors(cid: int, level: int) -> list[int]:
    """The <=4 cells at ``level`` sharing the leaf cell's closest vertex
    (public VertexNeighbors algorithm)."""
    # halfSize = sizeIJ(level + 1); size = halfSize << 1 (public algorithm)
    half_size = 1 << (MAX_LEVEL - (level + 1))
    size = half_size << 1
    f, i, j = face_ij_of(cid)
    if i & half_size:
        ioff, isame = size, (i + size) < MAX_SIZE
    else:
        ioff, isame = -size, (i - size) >= 0
    if j & half_size:
        joff, jsame = size, (j + size) < MAX_SIZE
    else:
        joff, jsame = -size, (j - size) >= 0
    res = [
        int(parent_at(np.array([cid], dtype=np.uint64), level)[0]),
        int(parent_at(np.array([_cellid_from_face_ij_same(f, i + ioff, j, isame)], dtype=np.uint64), level)[0]),
        int(parent_at(np.array([_cellid_from_face_ij_same(f, i, j + joff, jsame)], dtype=np.uint64), level)[0]),
    ]
    if isame or jsame:
        res.append(
            int(
                parent_at(
                    np.array([_cellid_from_face_ij_same(f, i + ioff, j + joff, isame and jsame)], dtype=np.uint64),
                    level,
                )[0]
            )
        )
    return res


# --- cap / covering ---------------------------------------------------------
#
# Reference semantics (convert.go:1170-1192):
#   LoopFromPoints(corners).CellUnionBound()
# which in the public golang/geo library expands to
#   Loop.initBound (RectBounder over the closed vertex chain, 2eps lat
#   expansion + polar closure, then pole-containment adjustments)
#   -> Rect.CapBound (pole cap vs rect-center cap, chord-angle radii)
#   -> Cap.CellUnionBound (level = MinWidthMetric.MaxLevel(radius) - 1,
#      VertexNeighbors; 6 face cells when level < 0).
# Everything below reimplements that chain from the published algorithm
# (s2geometry.io + the Apache-licensed golang/geo sources' documented
# formulas), vectorized in numpy.
#
# Documented deviations:
#  * pole containment uses a centroid-probe crossing-parity test instead of
#    golang/geo's OriginPoint bootstrap. As of round 6 the predicate is
#    ROBUST: the vectorized double path serves only loops whose predicate
#    determinants all clear an error-bound band (~4x golang/geo's
#    detErrorMultiplier*eps, the bound on a double triple-product's
#    absolute rounding error); any row with a determinant inside the band
#    — where the double sign could be WRONG, not merely land on 0.0 —
#    plus zero-centroid / near-zero-area rows are re-decided in exact
#    rational arithmetic (_exact_contains_scalar, fractions.Fraction —
#    the same band-triggered-exact-fallback structure as golang/geo's
#    predicates, different bootstrap point). May still differ from
#    golang/geo for
#    self-intersecting or concave loops, which this pipeline never builds.
# Measured (rounds 4-5, tests/test_kernels_geo.py::TestS2PolarAdversarial):
# across ~1.9k adversarial pole-enclosing / near-pole-sliver / degenerate
# loops, containment agrees with the independent exact recomputation at
# both poles and coverings agree with the scalar twin end to end.

_DBL_EPS = 2.220446049250313e-16  # Go dblEpsilon (2^-52)

# kMinWidth derivative for the quadratic projection (published constant:
# MinWidthMetric = Metric{dim: 1, deriv: 2*sqrt(2)/3})
_MIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0

# golang/geo s2.OriginPoint() — the fixed "point at infinity" PointFromCoords
# returns for the all-zero vector.
_ORIGIN_POINT = np.array([-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195])

_FULL_LO, _FULL_HI = -math.pi, math.pi


def _ilogb_vec(x: np.ndarray) -> np.ndarray:
    """math.Ilogb for positive finite doubles: exponent e with x in [2^e, 2^(e+1))."""
    _, e = np.frexp(np.asarray(x, dtype=np.float64))
    return e.astype(np.int64) - 1


def _min_width_max_level(value) -> np.ndarray:
    """MinWidthMetric.MaxLevel — Go metric.go: level = -Ilogb(val/deriv)
    clamped to [0, 30]; val <= 0 -> 30. NOTE the Ilogb form rounds the
    floating-point level UP vs the naive floor(log2(deriv/val))."""
    v = np.asarray(value, dtype=np.float64)
    scalar = v.ndim == 0
    v = np.atleast_1d(v)
    with np.errstate(invalid="ignore", divide="ignore"):
        lvl = -_ilogb_vec(np.where(v > 0, v, 1.0) / _MIN_WIDTH_DERIV)
    lvl = np.clip(lvl, 0, MAX_LEVEL)
    lvl = np.where(v <= 0, MAX_LEVEL, lvl)
    return int(lvl[0]) if scalar else lvl


# --- s1.Interval (lng intervals), vectorized --------------------------------
# Representation: (lo, hi) arrays, values in (-pi, pi]; full = (-pi, pi).
# No empty intervals occur in this flow (always seeded from an edge).


def _s1_pos_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from a to b counterclockwise, in [0, 2pi)."""
    d = b - a
    return np.where(d >= 0, d, (b + math.pi) - (a - math.pi))


def _s1_norm_pt(p: np.ndarray) -> np.ndarray:
    return np.where(p == -math.pi, math.pi, p)


def _s1_fast_contains(lo, hi, p):
    inv = lo > hi
    return np.where(inv, (p >= lo) | (p <= hi), (p >= lo) & (p <= hi))


def _s1_from_two_points(a: np.ndarray, b: np.ndarray):
    """IntervalFromPoint(a).AddPoint(b): the shorter arc between a and b."""
    a = _s1_norm_pt(a)
    b = _s1_norm_pt(b)
    swap = _s1_pos_dist(b, a) < _s1_pos_dist(a, b)
    lo = np.where(swap, b, a)
    hi = np.where(swap, a, b)
    same = a == b
    return np.where(same, a, lo), np.where(same, a, hi)


def _s1_is_full(lo, hi):
    return (hi - lo) == 2 * math.pi


def _s1_length(lo, hi):
    l = hi - lo
    return np.where(l >= 0, l, l + 2 * math.pi)


def _s1_contains_interval(ilo, ihi, ylo, yhi):
    """i.ContainsInterval(y), both non-empty."""
    i_inv = ilo > ihi
    y_inv = ylo > yhi
    both = (ylo >= ilo) & (yhi <= ihi)
    return np.where(
        i_inv,
        np.where(y_inv, both, (ylo >= ilo) | (yhi <= ihi)),
        np.where(y_inv, _s1_is_full(ilo, ihi), both),
    )


def _s1_union(ilo, ihi, ylo, yhi):
    """i.Union(y), both non-empty (golang/geo s1.Interval.Union)."""
    c_lo = _s1_fast_contains(ilo, ihi, ylo)
    c_hi = _s1_fast_contains(ilo, ihi, yhi)
    # case both endpoints contained: i if i contains y else full
    cont = _s1_contains_interval(ilo, ihi, ylo, yhi)
    r1_lo = np.where(cont, ilo, _FULL_LO)
    r1_hi = np.where(cont, ihi, _FULL_HI)
    # case neither endpoint contained: y if y contains i.lo else closer-pair
    y_has_ilo = _s1_fast_contains(ylo, yhi, ilo)
    d_lo = _s1_pos_dist(yhi, ilo)
    d_hi = _s1_pos_dist(ihi, ylo)
    r4_lo = np.where(y_has_ilo, ylo, np.where(d_lo < d_hi, ylo, ilo))
    r4_hi = np.where(y_has_ilo, yhi, np.where(d_lo < d_hi, ihi, yhi))
    lo = np.where(c_lo & c_hi, r1_lo, np.where(c_lo, ilo, np.where(c_hi, ylo, r4_lo)))
    hi = np.where(c_lo & c_hi, r1_hi, np.where(c_lo, yhi, np.where(c_hi, ihi, r4_hi)))
    return lo, hi


def _s1_center(lo, hi):
    c = 0.5 * (lo + hi)
    inv = lo > hi
    return np.where(inv, np.where(c <= 0, c + math.pi, c - math.pi), c)


# --- Loop bound -> bounding cap, vectorized ---------------------------------


def _normalize_points(raw: np.ndarray) -> np.ndarray:
    """PointFromCoords semantics: normalize; the zero vector -> OriginPoint."""
    pts = np.asarray(raw, dtype=np.float64)
    norms = np.linalg.norm(pts, axis=-1, keepdims=True)
    out = pts / np.where(norms == 0, 1.0, norms)
    zero = (norms == 0)[..., 0]
    if zero.any():
        out[zero] = _ORIGIN_POINT
    return out


def _simple_crossing(a, b, c, d):
    """s2.SimpleCrossing: does minor arc AB cross minor arc CD strictly
    interior to both? a,b broadcast against c,d (…,3) arrays."""
    ab = np.cross(a, b)
    acb = -(ab * c).sum(axis=-1)
    bda = (ab * d).sum(axis=-1)
    cd = np.cross(c, d)
    cbd = -(cd * b).sum(axis=-1)
    dac = (cd * a).sum(axis=-1)
    return (acb * bda > 0) & (acb * cbd > 0) & (cbd * dac > 0) & (dac * bda > 0)


def _exact_contains_scalar(verts_row: np.ndarray, p: np.ndarray) -> bool:
    """EXACT-rational containment for one closed chain — the same
    centroid-probe crossing-parity algorithm as the vectorized path, but
    every determinant sign computed in fractions.Fraction (doubles are
    exact rationals, so the signs carry the same guarantee golang/geo's
    exact-predicate fallback provides). Promoted from the round-4
    adversarial test suite into the kernel as the degenerate/tie branch
    (tests/test_kernels_geo.py::TestS2PolarAdversarial keeps the
    independent copy it is cross-checked against)."""
    from fractions import Fraction as Fr

    def fr(v):
        return (Fr(float(v[0])), Fr(float(v[1])), Fr(float(v[2])))

    def cross(a, b):
        return (
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        )

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    vs = [fr(v) for v in verts_row]
    pe = fr(p)
    cen = tuple(sum(v[i] for v in vs[:-1]) for i in range(3))
    if cen == (0, 0, 0):
        return False
    edges = list(zip(vs[:-1], vs[1:]))
    dets = [dot(cross(a, b), cen) for a, b in edges]
    cen_inside = sum(dets) > 0
    # zero-area loops (out-and-back slits) contain nothing — exact test.
    # The reference plane must come from a non-colinear vertex pair: if
    # vs[0] and vs[1] are colinear/repeated their cross is the zero vector
    # and every dot against it is 0, which would misclassify a genuine loop
    # as zero-area (ADVICE r5). Scan for the first vertex not colinear with
    # vs[0]; if none exists the whole chain lies on one line through the
    # origin and truly spans no area.
    plane = None
    for v in vs[1:-1]:
        cand = cross(vs[0], v)
        if cand != (0, 0, 0):
            plane = cand
            break
    if plane is None:
        return False
    if all(dot(plane, v) == 0 for v in vs[:-1]):
        return False
    crossings = 0
    for a, b in edges:
        ab = cross(cen, pe)
        acb = -dot(ab, a)
        bda = dot(ab, b)
        cd = cross(a, b)
        cbd = -dot(cd, pe)
        dac = dot(cd, cen)
        if acb * bda > 0 and acb * cbd > 0 and cbd * dac > 0 and dac * bda > 0:
            crossings += 1
    even = crossings % 2 == 0
    return even if cen_inside else not even


def _loops_contain_point(verts: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Crossing-parity containment of fixed point ``p`` for each closed loop.

    verts: (n, k+1, 3) unit vertex chains (vertex 0 repeated at the end).
    Probe = normalized vertex centroid; its own containment flag is the sign
    of sum_e det(a_e, b_e, centroid) (interior is left of the edges).

    Robustness: the vectorized double-precision path serves every loop
    whose predicate determinants all clear the error-bound band (see the
    ``band`` comment below); rows where any determinant magnitude falls
    inside the band — where a double's sign can be outright wrong, not
    merely land on 0.0 — where the centroid cancels to the zero
    vector, or where the loop is within float noise of zero area
    (every vertex within ~4 ulp of the v0/v1 great-circle plane — the
    out-and-back slits degenerate bboxes collapse to) are re-decided by
    ``_exact_contains_scalar`` in exact rational arithmetic. This
    replaces the former blanket ``tri < 1e-300 -> contains nothing``
    guess with an exact decision at every ambiguous site."""
    n, kp1, _ = verts.shape
    a = verts[:, :-1, :]
    b = verts[:, 1:, :]
    cen = verts[:, :-1, :].sum(axis=1)
    cn = np.linalg.norm(cen, axis=1, keepdims=True)
    cen = cen / np.where(cn == 0, 1.0, cn)
    dets = (np.cross(a, b) * cen[:, None, :]).sum(axis=-1)
    dets_sum = dets.sum(axis=1)
    cen_inside = dets_sum > 0
    # near-zero-area detection: every vertex within float noise of the
    # v0/v1 plane (|det| of unit vectors -> absolute ~ulp scale)
    tri = np.abs((np.cross(verts[:, 0:1, :], verts[:, 1:2, :]) * verts[:, 2:-1, :]).sum(axis=-1))
    maybe_degenerate = (tri < 4e-16).all(axis=1) | (cn[:, 0] == 0)
    # crossing predicates with tie detection (same algebra as
    # _simple_crossing, kept inline to expose the four products)
    ab = np.cross(cen, p[None, :])[:, None, :]
    acb = -(ab * a).sum(axis=-1)
    bda = (ab * b).sum(axis=-1)
    cd = np.cross(a, b)
    cbd = -(cd * p[None, None, :]).sum(axis=-1)
    dac = (cd * cen[:, None, :]).sum(axis=-1)
    crossing = (acb * bda > 0) & (acb * cbd > 0) & (cbd * dac > 0) & (dac * bda > 0)
    # Ambiguity band (ADVICE r5): a double-precision triple product of
    # (near-)unit vectors computed as dot(cross(u, v), w) carries absolute
    # rounding error up to ~3.2321*eps (golang/geo s2predicates
    # detErrorMultiplier for exactly this evaluation order). A product of
    # two such determinants can therefore have the WRONG sign — not just
    # land on 0.0 — whenever either factor's magnitude sits inside that
    # band, so the exact re-decision must trigger on |det| <= band, not on
    # ==0. We widen the published constant 4x for slack (inputs are
    # normalized in doubles, so they are unit only to ~eps); a wider band
    # only sends more rows to the exact path, never changes an answer.
    # dets_sum accumulates one such determinant per edge plus (k-1)
    # summation roundings, hence the per-edge band scales by edge count.
    band = 4.0 * 3.2321 * _DBL_EPS
    ties = (
        (np.abs(acb) <= band)
        | (np.abs(bda) <= band)
        | (np.abs(cbd) <= band)
        | (np.abs(dac) <= band)
    ).any(axis=1) | (np.abs(dets_sum) <= band * (kp1 - 1))
    crossings = crossing.sum(axis=1)
    even = (crossings % 2) == 0
    inside = np.where(cen_inside, even, ~even) & ~maybe_degenerate
    uncertain = np.flatnonzero(ties | maybe_degenerate)
    for i in uncertain:
        inside[i] = _exact_contains_scalar(verts[i], p)
    return inside


def _loop_cap_batch(raw_pts: np.ndarray):
    """Raw loop corner vectors (n, k, 3) -> bounding cap (centers (n,3),
    radii (n,) in radians), the golang/geo Loop.CapBound chain."""
    pts = _normalize_points(raw_pts)
    n, k, _ = pts.shape
    verts = np.concatenate([pts, pts[:, :1, :]], axis=1)  # closed chain
    a = verts[:, :-1, :]
    b = verts[:, 1:, :]

    lat_v = np.arctan2(verts[:, :, 2], np.hypot(verts[:, :, 0], verts[:, :, 1]))
    lng_v = np.arctan2(verts[:, :, 1], verts[:, :, 0])
    lat_a, lat_b = lat_v[:, :-1], lat_v[:, 1:]
    lng_a, lng_b = lng_v[:, :-1], lng_v[:, 1:]

    # N = (A-B) x (A+B) = 2 (A x B), computed this way for accuracy (RectBounder)
    nv = np.cross(a - b, a + b)
    n_norm = np.linalg.norm(nv, axis=-1)
    small = n_norm < 1.91346e-15
    anti = small & ((a * b).sum(axis=-1) < 0)   # near-antipodal -> full rect
    ident = small & ~anti                        # near-identical -> endpoint rect

    # per-edge lng interval: shorter arc, promoted to full when it spans
    # nearly pi (normal edges only — ident edges keep the plain 2-point arc)
    e_lo, e_hi = _s1_from_two_points(lng_a, lng_b)
    spans_pi = (_s1_length(e_lo, e_hi) >= math.pi - 2 * _DBL_EPS) & ~small
    e_lo = np.where(spans_pi | anti, _FULL_LO, e_lo)
    e_hi = np.where(spans_pi | anti, _FULL_HI, e_hi)

    # per-edge lat interval with great-circle extrema (RectBounder.AddPoint)
    lat_lo_e = np.minimum(lat_a, lat_b)
    lat_hi_e = np.maximum(lat_a, lat_b)
    m_a = (nv[:, :, 1] * a[:, :, 0] - nv[:, :, 0] * a[:, :, 1])  # (N x z).A
    m_b = (nv[:, :, 1] * b[:, :, 0] - nv[:, :, 0] * b[:, :, 1])
    m_err = 6.06638e-16 * n_norm + 6.83174e-31
    cond = ((m_a * m_b < 0) | (np.abs(m_a) <= m_err) | (np.abs(m_b) <= m_err)) & ~small
    with np.errstate(invalid="ignore"):
        max_lat = np.minimum(
            np.arctan2(np.hypot(nv[:, :, 0], nv[:, :, 1]), np.abs(nv[:, :, 2])) + 3 * _DBL_EPS,
            math.pi / 2,
        )
        chord = np.linalg.norm(a - b, axis=-1)
        lat_budget = 2 * np.arcsin(np.clip(0.5 * chord * np.sin(max_lat), -1.0, 1.0))
    max_delta = 0.5 * (lat_budget - (lat_hi_e - lat_lo_e)) + _DBL_EPS
    hi_adj = cond & (m_a <= m_err) & (m_b >= -m_err)
    lo_adj = cond & (m_b <= m_err) & (m_a >= -m_err)
    lat_hi_e = np.where(hi_adj, np.minimum(max_lat, lat_hi_e + max_delta), lat_hi_e)
    lat_lo_e = np.where(lo_adj, np.maximum(-max_lat, lat_lo_e - max_delta), lat_lo_e)
    lat_lo_e = np.where(anti, -math.pi / 2, lat_lo_e)
    lat_hi_e = np.where(anti, math.pi / 2, lat_hi_e)

    # union across edges: r1 hull for lat, s1.Interval.Union for lng
    lat_lo = lat_lo_e.min(axis=1)
    lat_hi = lat_hi_e.max(axis=1)
    lng_lo, lng_hi = e_lo[:, 0], e_hi[:, 0]
    for e in range(1, k):
        lng_lo, lng_hi = _s1_union(lng_lo, lng_hi, e_lo[:, e], e_hi[:, e])

    # RectBound: expand lat by 2eps, clamp, polar closure
    lat_lo = np.maximum(lat_lo - 2 * _DBL_EPS, -math.pi / 2)
    lat_hi = np.minimum(lat_hi + 2 * _DBL_EPS, math.pi / 2)
    polar = (lat_lo == -math.pi / 2) | (lat_hi == math.pi / 2)
    lng_lo = np.where(polar, _FULL_LO, lng_lo)
    lng_hi = np.where(polar, _FULL_HI, lng_hi)

    # Loop.initBound pole adjustments
    north = _loops_contain_point(verts, np.array([0.0, 0.0, 1.0]))
    lat_hi = np.where(north, math.pi / 2, lat_hi)
    lng_lo = np.where(north, _FULL_LO, lng_lo)
    lng_hi = np.where(north, _FULL_HI, lng_hi)
    full_lng = _s1_is_full(lng_lo, lng_hi)
    south = full_lng & _loops_contain_point(verts, np.array([0.0, 0.0, -1.0]))
    lat_lo = np.where(south, -math.pi / 2, lat_lo)

    # Rect.CapBound: pole cap vs mid cap, radii via chord angles
    south_axis = (lat_hi + lat_lo) < 0
    pole_angle = np.where(south_axis, math.pi / 2 + lat_hi, math.pi / 2 - lat_lo)
    pole_chord2 = (2.0 * np.sin(0.5 * np.minimum(math.pi, pole_angle))) ** 2
    pole_rad = 2.0 * np.arcsin(0.5 * np.sqrt(pole_chord2))
    pole_center = np.stack(
        [np.zeros(n), np.zeros(n), np.where(south_axis, -1.0, 1.0)], axis=1
    )

    clat = 0.5 * (lat_lo + lat_hi)
    clng = _s1_center(lng_lo, lng_hi)
    mid_center = np.stack(
        [np.cos(clat) * np.cos(clng), np.sin(clng) * np.cos(clat), np.sin(clat)], axis=1
    )
    chord2 = np.zeros(n)
    for la, ln in ((lat_lo, lng_lo), (lat_hi, lng_hi)):
        v = np.stack([np.cos(la) * np.cos(ln), np.sin(ln) * np.cos(la), np.sin(la)], axis=1)
        d = ((mid_center - v) ** 2).sum(axis=1)
        chord2 = np.maximum(chord2, np.minimum(4.0, d))
    mid_rad = 2.0 * np.arcsin(0.5 * np.sqrt(chord2))

    use_mid = ~full_lng & (mid_rad < pole_rad)
    center = np.where(use_mid[:, None], mid_center, pole_center)
    radius = np.where(use_mid, mid_rad, pole_rad)
    return center, radius


def loop_cap_bound(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Bounding cap of one loop (golang/geo Loop.CapBound chain)."""
    pts = np.asarray(points, dtype=np.float64).reshape(1, -1, 3)
    center, radius = _loop_cap_batch(pts)
    return center[0], float(radius[0])


def cap_cell_union_bound(center_xyz: np.ndarray, radius_rad: float) -> list[int]:
    """Cap -> covering cells (Cap.CellUnionBound): the vertex neighbors of
    the center's cell at MinWidthMetric.MaxLevel(radius) - 1; the 6 face
    cells when that level is < 0 (radius unscaled — golang/geo passes
    c.Radius().Radians() directly)."""
    level = int(_min_width_max_level(float(radius_rad))) - 1
    if level < 0:
        return [(f << POS_BITS) | (1 << (POS_BITS - 1)) for f in range(6)]
    cid = int(cellid_from_point(np.asarray(center_xyz).reshape(1, 3))[0])
    return vertex_neighbors(cid, level)


def vertex_neighbors_vec(cids: np.ndarray, levels: np.ndarray) -> list[list[int]]:
    """Vectorized VertexNeighbors over (leaf cell, level) rows.

    Same-face neighbors are computed fully vectorized; the rare rows whose
    neighbor crosses a face boundary fall back to the scalar path."""
    c = np.asarray(cids, dtype=np.uint64)
    lv = np.asarray(levels, dtype=np.int64)
    f, i, j = face_ij_of_vec(c)
    half = np.int64(1) << (MAX_LEVEL - (lv + 1))
    size = half << 1
    ioff = np.where((i & half) != 0, size, -size)
    isame = np.where((i & half) != 0, (i + size) < MAX_SIZE, (i - size) >= 0)
    joff = np.where((j & half) != 0, size, -size)
    jsame = np.where((j & half) != 0, (j + size) < MAX_SIZE, (j - size) >= 0)
    wrap = ~(isame & jsame)
    out: list[list[int]] = [None] * c.size  # type: ignore[list-item]
    ok = ~wrap
    if ok.any():
        base = parent_at_vec(c[ok], lv[ok])
        n_i = parent_at_vec(cellid_from_face_ij(f[ok], i[ok] + ioff[ok], j[ok]), lv[ok])
        n_j = parent_at_vec(cellid_from_face_ij(f[ok], i[ok], j[ok] + joff[ok]), lv[ok])
        n_ij = parent_at_vec(cellid_from_face_ij(f[ok], i[ok] + ioff[ok], j[ok] + joff[ok]), lv[ok])
        idxs = np.where(ok)[0]
        for row, a, b_, cc, d in zip(idxs, base, n_i, n_j, n_ij):
            out[row] = [int(a), int(b_), int(cc), int(d)]
    for row in np.where(wrap)[0]:
        out[row] = vertex_neighbors(int(c[row]), int(lv[row]))
    return out


def s2covering_tokens_batch(lx, ly, rx, uy, elev_fn) -> list[list[str]]:
    """Vectorized bbox -> quirky 8-char S2 covering tokens
    (convert.go:1151-1192; the per-tile finalize kernel at cluster scale)."""
    from .mercator import to4326

    lx = np.asarray(lx, dtype=np.float64)
    ly = np.asarray(ly, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    uy = np.asarray(uy, dtype=np.float64)
    n = lx.size
    finite = np.isfinite(lx) & np.isfinite(ly) & np.isfinite(rx) & np.isfinite(uy)
    cz = np.full(n, np.nan)
    if finite.any():
        cz[finite] = np.asarray(elev_fn(rx[finite], uy[finite]), dtype=np.float64)
    ok = finite & ~np.isnan(cz)
    out: list[list[str]] = [[] for _ in range(n)]
    if not ok.any():
        return out
    k = np.where(ok)[0]
    # convert the two reference pairs (rx,uy), (lx,ly) and reuse per-axis
    # values for the mixed corners (convert.go:1160-1161)
    rx4, uy4 = to4326(rx[k], uy[k])
    lx4, ly4 = to4326(lx[k], ly[k])
    cx = np.stack([rx4, lx4, lx4, rx4], axis=1)
    cy = np.stack([uy4, uy4, ly4, ly4], axis=1)
    # quirk: PointFromCoords(lon, lat, cz) — raw R^3 vector, normalized
    raw = np.stack([cx, cy, np.repeat(cz[k], 4).reshape(-1, 4)], axis=2)
    center, radius = _loop_cap_batch(raw)

    lvl = np.asarray(_min_width_max_level(radius), dtype=np.int64) - 1
    cells_per_row: list[list[int]] = [None] * k.size  # type: ignore[list-item]
    deep = lvl >= 0
    if deep.any():
        leafs = cellid_from_point(center[deep])
        neigh = vertex_neighbors_vec(leafs, lvl[deep])
        for pos, row in enumerate(np.where(deep)[0]):
            cells_per_row[row] = neigh[pos]
    for row in np.where(~deep)[0]:
        cells_per_row[row] = [(f << POS_BITS) | (1 << (POS_BITS - 1)) for f in range(6)]
    for pos, row in enumerate(k):
        # no dedup — reference parity (convert.go:1180-1192)
        out[row] = [token(c)[:8] for c in cells_per_row[pos]]
    return out


def s2covering_tokens(lx: float, ly: float, rx: float, uy: float, elev_fn) -> list[str]:
    """The reference's quirky bbox covering (convert.go:1151-1192).

    bbox in EPSG:3857; ``elev_fn(x3857, y3857) -> z`` is GetElev. Empty /
    degenerate bboxes return [] (convert.go:1154-1158). Tokens are cut to
    8 chars and NOT deduplicated (reference parity, convert.go:1180-1192 —
    tiny bboxes legitimately yield 4 identical tokens). Thin wrapper over
    the batch kernel so scalar and batch cannot drift.
    """
    return s2covering_tokens_batch(
        np.array([lx]), np.array([ly]), np.array([rx]), np.array([uy]), elev_fn
    )[0]
