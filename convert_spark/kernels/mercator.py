"""Spherical web-mercator projection with the reference's exact semantics.

Reference: /root/reference/convert.go:1257-1282 (To4326, To3857).

Semantics preserved (see SURVEY.md §7.1):

* **CRS inference by value range**: a coordinate pair with |x| <= 180 and
  |y| <= 180 is treated as EPSG:4326 degrees; anything else is assumed to
  already be EPSG:3857 meters (convert.go:1258, 1270).
* **Rounding**: 3857 output rounded to centimeters, 4326 output rounded to
  1e-4 degrees — with Go's ``math.Round`` (half away from zero), NOT
  numpy's default banker's rounding (convert.go:1278-1279, 1261-1262).
* ``to4326`` passes already-degree coordinates through **unrounded**
  (convert.go:1257-1266); ``to3857`` rounds unconditionally.

All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np

R_EARTH = 6378137.0  # WGS84 spherical radius used by web mercator
_DEG_LIMIT = 180.0


def round_half_away(v: np.ndarray | float, decimals: int) -> np.ndarray:
    """Go ``math.Round`` parity: round half away from zero at ``decimals``.

    numpy's ``np.round`` rounds half to even (banker's); Go rounds half away
    from zero. NOTE: computed as ``floor(a) + (a - floor(a) >= 0.5)`` —
    the textbook ``floor(a + 0.5)`` is NOT exact (the addition can round up
    across the half boundary for a just below .5+ulp); the subtraction form
    is exact by Sterbenz. The Spark expression (functions.exprs) and the
    DuckDB oracle fragments restate this identical form.
    """
    v = np.asarray(v, dtype=np.float64)
    scale = 10.0**decimals
    a = np.abs(v) * scale
    f = np.floor(a)
    r = f + (a - f >= 0.5)
    return np.sign(v) * r / scale


def is_degrees(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """CRS inference mask: True where the pair looks like EPSG:4326."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return (np.abs(x) <= _DEG_LIMIT) & (np.abs(y) <= _DEG_LIMIT)


def to3857(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Project (lon, lat) degrees -> web-mercator meters, cm-rounded.

    Pairs already outside the degree range pass through the projection
    untouched but are still cm-rounded (convert.go:1269-1282).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    deg = is_degrees(x, y)
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = R_EARTH * np.radians(x)
        my = R_EARTH * np.log(np.tan(np.pi / 4.0 + np.radians(y) / 2.0))
    out_x = np.where(deg, mx, x)
    out_y = np.where(deg, my, y)
    return round_half_away(out_x, 2), round_half_away(out_y, 2)


def to4326(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse-project web-mercator meters -> (lon, lat) degrees.

    Only pairs *outside* the degree range are inverted (and rounded to
    1e-4 deg); in-range pairs pass through unrounded (convert.go:1257-1266).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    deg = is_degrees(x, y)
    lon = np.degrees(x / R_EARTH)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_EARTH)) - np.pi / 2.0)
    out_x = np.where(deg, x, round_half_away(lon, 4))
    out_y = np.where(deg, y, round_half_away(lat, 4))
    return out_x, out_y
