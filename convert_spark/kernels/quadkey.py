"""Hierarchical web-mercator tile grid (quadkey) — the engine's join index.

Plays the role H3 plays in BASELINE.json's north_star: a multi-resolution
hierarchical cell index with parent/child, k-ring, and compact/uncompact.
We use the public Bing-maps quadkey tiling (web-mercator quadtree) rather
than H3's icosahedral hex grid: the H3 base-cell tables are not derivable
from scratch in this sandbox, while the quadkey scheme is exactly
reproducible, SQL-expressible (so the DuckDB oracle can verify tile
assignment end-to-end), and has the same algebra the pipeline needs
(aperture-4 hierarchy, ring adjacency with longitude wrap, compaction).

Cell packing: ``cell_id = (1 << 2z) + morton(x, y)`` — a zoom-prefixed
Morton code. Properties:

* unique across zooms (the leading 1 bit encodes the zoom),
* ``parent(c) == c >> 2``; ``children(c) == {4c, 4c+1, 4c+2, 4c+3}``,
* ``zoom(c) == (bit_length(c) - 1) // 2``,
* base-4 digits of ``c`` (after the leading 1) == the Bing quadkey string.

Max zoom 26 keeps ids within 53 bits (exact in float64 *and* int64; safe
through Arrow/pandas round-trips).

The reference has no cell index of its own — its S2 covering tokens
(convert.go:1151-1192) are an output artifact; this grid is the engine-side
generalization used for tile assignment, kNN ring joins and rollups.
"""

from __future__ import annotations

import numpy as np

MAX_ZOOM = 26
LAT_MIN = -85.05112878
LAT_MAX = 85.05112878


def latlon_to_tile(lat: np.ndarray, lon: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) degrees -> integer tile (x, y) at ``zoom``.

    Standard slippy/Bing math: x = floor((lon+180)/360 * 2^z),
    y from the mercator latitude, both clipped into [0, 2^z - 1].
    Deliberately expressible in ANSI SQL so the oracle can recompute it.
    """
    lat = np.clip(np.asarray(lat, dtype=np.float64), LAT_MIN, LAT_MAX)
    lon = np.clip(np.asarray(lon, dtype=np.float64), -180.0, 180.0)
    n = np.int64(1) << zoom
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    merc = np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad))
    ty = np.floor((1.0 - merc / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def _interleave(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    """Morton-interleave: bit k of tx -> bit 2k+1, of ty -> bit 2k.

    Digit order matches the quadkey convention: digit = 2*ybit + xbit...
    actually quadkey digit = xbit + 2*ybit, so y occupies the high bit of
    each digit pair.
    """
    m = np.zeros_like(tx, dtype=np.int64)
    for k in range(zoom):
        m |= ((tx >> k) & 1) << (2 * k)
        m |= ((ty >> k) & 1) << (2 * k + 1)
    return m


def _deinterleave(m: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    tx = np.zeros_like(m)
    ty = np.zeros_like(m)
    for k in range(zoom):
        tx |= ((m >> (2 * k)) & 1) << k
        ty |= ((m >> (2 * k + 1)) & 1) << k
    return tx, ty


def cell_id(lat: np.ndarray, lon: np.ndarray, zoom: int) -> np.ndarray:
    """(lat, lon) -> zoom-prefixed Morton cell id at ``zoom``."""
    if not 0 <= zoom <= MAX_ZOOM:
        raise ValueError(f"zoom must be in [0, {MAX_ZOOM}]")
    tx, ty = latlon_to_tile(lat, lon, zoom)
    return (np.int64(1) << (2 * zoom)) + _interleave(tx, ty, zoom)


def cell_zoom(cells: np.ndarray) -> np.ndarray:
    """Recover the zoom from the leading-1 prefix."""
    c = np.asarray(cells, dtype=np.int64)
    bl = np.zeros_like(c)
    cc = c.copy()
    while (cc > 0).any():
        bl = np.where(cc > 0, bl + 1, bl)
        cc >>= 1
    return (bl - 1) // 2


def cell_to_tile(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (zoom, tile_x, tile_y)."""
    c = np.asarray(cells, dtype=np.int64)
    z = cell_zoom(c)
    zmax = int(z.max()) if c.size else 0
    m = c - (np.int64(1) << (2 * z))
    tx, ty = _deinterleave(m, zmax)
    return z, tx, ty


def tile_to_cell(zoom, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    zoom_arr = np.asarray(zoom, dtype=np.int64)
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    zmax = int(zoom_arr.max()) if zoom_arr.size else 0
    return (np.int64(1) << (2 * zoom_arr)) + _interleave(tx, ty, zmax)


def parent(cells: np.ndarray, steps: int = 1) -> np.ndarray:
    """Parent cell ``steps`` zoom levels up — a pure shift."""
    return np.asarray(cells, dtype=np.int64) >> (2 * steps)


def children(cell: int) -> np.ndarray:
    """The 4 children one zoom level down."""
    c = np.int64(cell)
    return (c << 2) + np.arange(4, dtype=np.int64)


def quadkey_str(cells: np.ndarray) -> list[str]:
    """Cell id -> Bing quadkey string (base-4 digits after the leading 1)."""
    out = []
    for c in np.asarray(cells, dtype=np.int64):
        z = (int(c).bit_length() - 1) // 2
        m = int(c) - (1 << (2 * z))
        out.append("".join(str((m >> (2 * (z - 1 - i))) & 3) for i in range(z)))
    return out


def k_ring(cells: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All cells within Chebyshev distance ``k`` of each input cell.

    Longitude wraps (x modulo 2^z); latitude clips (out-of-range y rows are
    dropped). Returns (origin_index, neighbor_cell) parallel arrays — the
    explode-ready form for Spark ring-expansion joins (SURVEY.md §2.5).
    """
    c = np.asarray(cells, dtype=np.int64)
    z, tx, ty = cell_to_tile(c)
    n = np.int64(1) << z
    side = 2 * k + 1
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.tile(offs, side)
    dy = np.repeat(offs, side)
    # (N, side*side) grids
    nx = (tx[:, None] + dx[None, :]) % n[:, None]
    ny = ty[:, None] + dy[None, :]
    keep = (ny >= 0) & (ny < n[:, None])
    origin = np.broadcast_to(np.arange(c.size)[:, None], nx.shape)[keep]
    zz = np.broadcast_to(z[:, None], nx.shape)[keep]
    neigh = tile_to_cell(zz, nx[keep], ny[keep])
    # dedupe: when 2k+1 > 2^z the longitude wrap maps multiple dx offsets
    # onto the same tile — the ring is a SET
    pairs = np.unique(np.stack([origin, neigh], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def compact(cells: np.ndarray) -> np.ndarray:
    """H3-style compaction: replace any complete sibling quad by its parent,
    recursively. Input cells must be unique and at a single zoom; output is
    a minimal multi-zoom cover of the same area.
    """
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    out = []
    while cur.size:
        if int(cell_zoom(cur[:1])[0]) == 0:
            out.append(cur)
            break
        par = cur >> 2
        uniq, counts = np.unique(par, return_counts=True)
        full = uniq[counts == 4]
        is_promoted = np.isin(par, full)
        out.append(cur[~is_promoted])
        cur = full
    return np.sort(np.concatenate(out)) if out else cur


def uncompact(cells: np.ndarray, zoom: int) -> np.ndarray:
    """Expand a multi-zoom cover down to uniform ``zoom`` cells."""
    c = np.asarray(cells, dtype=np.int64)
    z = cell_zoom(c)
    if (z > zoom).any():
        raise ValueError("uncompact target zoom above a cell's own zoom")
    pieces = []
    for zi in np.unique(z):
        sub = c[z == zi]
        steps = int(zoom - zi)
        # each cell expands to 4^steps children: morton suffix enumeration
        suffix = np.arange(1 << (2 * steps), dtype=np.int64)
        pieces.append(((sub[:, None] << (2 * steps)) + suffix[None, :]).ravel())
    return np.sort(np.concatenate(pieces))


def cell_bounds(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lat_south, lat_north, lon_west, lon_east) of each cell in degrees."""
    z, tx, ty = cell_to_tile(np.asarray(cells, dtype=np.int64))
    n = (np.int64(1) << z).astype(np.float64)
    lon_w = tx / n * 360.0 - 180.0
    lon_e = (tx + 1) / n * 360.0 - 180.0

    def _lat(yy):
        t = np.pi * (1.0 - 2.0 * yy / n)
        return np.degrees(np.arctan(np.sinh(t)))

    lat_n = _lat(ty.astype(np.float64))
    lat_s = _lat(ty.astype(np.float64) + 1.0)
    return lat_s, lat_n, lon_w, lon_e
