"""Deterministic synthetic DEM + vectorized bilinear sampling.

The reference samples elevations from a GDAL virtual raster
(``earthdem.vrt``) resolved via the ``DEMVRT`` env var
(/root/reference/convert.go:124, :137-165) with a point query per
coordinate (convert.go:1233-1254, GetElev). That raster does not exist in
this sandbox, so — per SURVEY.md §5.2 / FIXTURES.md §5 — the engine fixes a
*deterministic synthetic DEM*: a smooth closed-form surface sampled onto a
regular lat/lon grid, then bilinearly interpolated. This keeps every
elevation-dependent output exactly reproducible across runs and
parallelism levels (the scaling-efficiency invariant) while exercising the
same raster-sampling code path Spark-side (broadcast grid + vectorized
lookup in a pandas UDF).

GetElev parity points (convert.go:1233-1254):
* input is EPSG:3857; converted to 4326 before the raster query,
* NaN elevation -> error -> caller substitutes 0.0 (convert.go:1214-1216).
"""

from __future__ import annotations

import numpy as np

from .mercator import to4326

# grid spec: 0.25-degree global grid (721 x 1441 ~ 4 MB float32 — cheap to
# broadcast to every executor)
DLAT = 0.25
DLON = 0.25
LAT0 = -90.0
LON0 = -180.0
NLAT = 721
NLON = 1441


def surface(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Closed-form elevation surface (FIXTURES.md §5)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    return 500.0 + 300.0 * np.sin(lat / 10.0) * np.cos(lon / 10.0)


_GRID: np.ndarray | None = None


def grid() -> np.ndarray:
    """The (NLAT, NLON) float64 grid, built once per process."""
    global _GRID
    if _GRID is None:
        lats = LAT0 + DLAT * np.arange(NLAT)
        lons = LON0 + DLON * np.arange(NLON)
        _GRID = surface(lats[:, None], lons[None, :])
    return _GRID


def sample_latlon(lat: np.ndarray, lon: np.ndarray, dem: np.ndarray | None = None) -> np.ndarray:
    """Bilinear sample of the grid at (lat, lon) degrees; NaN outside."""
    g = grid() if dem is None else dem
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    fi = (lat - LAT0) / DLAT
    fj = (lon - LON0) / DLON
    ok = (fi >= 0) & (fi <= NLAT - 1) & (fj >= 0) & (fj <= NLON - 1) & np.isfinite(fi) & np.isfinite(fj)
    fi = np.where(ok, fi, 0.0)
    fj = np.where(ok, fj, 0.0)
    i0 = np.minimum(fi.astype(np.int64), NLAT - 2)
    j0 = np.minimum(fj.astype(np.int64), NLON - 2)
    di = fi - i0
    dj = fj - j0
    v = (
        g[i0, j0] * (1 - di) * (1 - dj)
        + g[i0 + 1, j0] * di * (1 - dj)
        + g[i0, j0 + 1] * (1 - di) * dj
        + g[i0 + 1, j0 + 1] * di * dj
    )
    return np.where(ok, v, np.nan)


def get_elev(x3857: np.ndarray, y3857: np.ndarray, dem: np.ndarray | None = None) -> np.ndarray:
    """GetElev parity (convert.go:1233-1254): 3857 in, elevation out.

    Out-of-range / non-finite inputs yield NaN (the reference's error
    branch); callers that need the 0.0-fill apply it per
    convert.go:1214-1216 (see kernels.coords.check_coords).
    """
    lon, lat = to4326(x3857, y3857)
    return sample_latlon(lat, lon, dem)
