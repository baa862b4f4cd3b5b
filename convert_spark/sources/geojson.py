"""GeoJSON source (S2 + E1-E3, convert.go:232-278, 594-921).

One input document -> N feature rows. Geometry handling matches the
reference's `ParseGEOJSONFeature` dispatch (convert.go:627-798):

* Point / PointZ            -> one `point` feature
* LineString (+Z)           -> one `line` feature
* MultiLineString (+Z)      -> one `line` feature PER part (E2,
  convert.go:689-693)
* Polygon (+Z)              -> one `polygon` feature (all rings)
* MultiPolygon (+Z)         -> one `multipolygon` feature (parts+rings)

Property handling happens HERE, faithfully (ParseGEOJSONAttributes,
convert.go:800-832): interface-equality falsy drop F2, then key routing
F3. (operators.extract.clean_attributes is the separate map-column engine
operator with the same contract for relational inputs.) Values are
stringified Go-style via `_go_str`: bools "true"/"false", numbers through
float64 %v formatting including the scientific switch at 1e6.

Runs as mapInPandas over (dataset_id, json) rows: JSON parsing is per
*document*, not per feature — documents are the parallelism unit, matching
the reference's one-file-one-dataset model at distributed scale.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import FEATURES_SCHEMA


def _go_float_str(v: float) -> str:
    """Go strconv.FormatFloat(v, 'g', -1, 64) — the %v float form.

    Shortest round-trip digits (Python repr gives the same digits), with
    Go's shortest-'g' exponent rule: scientific when the decimal exponent
    is < -4 or >= 6 (fmt prints 1e6 as "1e+06", 1417640643 as
    "1.417640643e+09" — NOT the fixed form)."""
    import math

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0:
        return "0"
    sign = "-" if v < 0 else ""
    r = repr(abs(float(v)))
    if "e" in r:  # Python e-form (>=1e16 or <1e-4): already Go-shaped
        mant, _, ex = r.partition("e")
        mant = mant.rstrip("0").rstrip(".") if "." in mant else mant
        ex_i = int(ex)
        return f"{sign}{mant}e{'+' if ex_i >= 0 else '-'}{abs(ex_i):02d}"
    int_part, _, frac = r.partition(".")
    frac = frac.rstrip("0")
    if abs(v) >= 1e6:  # Go switches to scientific at exponent >= 6
        digits = (int_part + frac).lstrip("0")
        exp = len(int_part) - 1
        mant = digits[0] + ("." + digits[1:].rstrip("0") if digits[1:].rstrip("0") else "")
        return f"{sign}{mant}e+{exp:02d}"
    return f"{sign}{int_part}" + (f".{frac}" if frac else "")


def _go_str(v) -> str:
    """fmt.Sprintf("%v", v) parity for JSON-decoded values.

    Go json.Unmarshal into interface{} yields float64 for ALL JSON numbers,
    so even integral values go through the float formatting (1417640643 ->
    "1.417640643e+09"). Python json gives int for integer literals — route
    ints through the float path to stay Go-faithful."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _go_float_str(float(v))
    return str(v)


def _feature_rows(dataset_id: str, doc: dict) -> list[dict]:
    rows = []
    fidx = 0
    for feat in doc.get("features", []):
        geom = feat.get("geometry") or {}
        gtype = (geom.get("type") or "").replace("Z", "")
        coords = geom.get("coordinates")
        props = feat.get("properties") or {}
        # F2 falsy drop + F3 key routing (ParseGEOJSONAttributes,
        # convert.go:800-832). Faithful Go quirk: the falsy switch compares
        # interface values, so ONLY nil, "", "0" (string) and int 0 match —
        # a JSON numeric 0 decodes to float64 in Go and is KEPT (then
        # stringifies to "0").  Python json gives int for `0`, so we mimic
        # Go by keeping numeric zeros.
        name = style = None
        fid_by_key: dict[str, str] = {}
        attrs = {}
        for k, v in props.items():
            if v is None or v == "" or (isinstance(v, str) and v == "0"):
                continue
            if k == "name":
                name = _go_str(v)
            elif k == "styletype":
                style = _go_str(v)
            elif k in ("id", "fid", "osm_id", "uid", "uuid"):
                fid_by_key[k] = _go_str(v)
            elif k in ("tags", "way", "geomz"):
                continue
            else:
                attrs[str(k)] = _go_str(v)
        # the reference's ID pick is Go-map-iteration-random when several
        # id-ish keys exist (convert.go:818); the engine canonicalizes to
        # the same priority order clean_attributes uses
        fid = next((fid_by_key[k] for k in ("id", "fid", "osm_id", "uid", "uuid") if k in fid_by_key), None)
        base = {
            "dataset_id": dataset_id,
            "name": name,
            "style_type": style,
            "feature_id": fid,
            "attributes": attrs,
            # Go map iteration is RANDOM for GeoJSON properties — no
            # deterministic source order exists; downstream canonicalizes
            # by sorting (documented deviation, SURVEY.md §3.2)
            "attr_keys": None,
        }
        if coords is None:
            continue

        def emit(kind, verts, ring_offsets, part_offsets, had_z):
            nonlocal fidx
            rows.append(
                {
                    **base,
                    "feature_idx": fidx,
                    "geom_kind": kind,
                    "verts": [[float(c) for c in v] for v in verts],
                    "ring_offsets": ring_offsets,
                    "part_offsets": part_offsets,
                    "had_z": had_z,
                }
            )
            fidx += 1

        def pad(v):
            return list(v) + [np.nan] * (3 - len(v)) if len(v) < 3 else list(v[:3])

        if gtype == "Point":
            emit("point", [pad(coords)], [0, 1], [0, 1], len(coords) >= 3)
        elif gtype == "LineString":
            emit("line", [pad(v) for v in coords], [0, len(coords)], [0, 1], len(coords[0]) >= 3 if coords else False)
        elif gtype == "MultiLineString":
            for part in coords:  # E2: one line feature per part
                emit("line", [pad(v) for v in part], [0, len(part)], [0, 1], len(part[0]) >= 3 if part else False)
        elif gtype == "Polygon":
            verts, offs = [], [0]
            for ring in coords:
                verts.extend(pad(v) for v in ring)
                offs.append(offs[-1] + len(ring))
            had_z = len(coords[0][0]) >= 3 if coords and coords[0] else False
            emit("polygon", verts, offs, [0, len(coords)], had_z)
        elif gtype == "MultiPolygon":
            verts, offs, parts = [], [0], [0]
            for poly in coords:
                for ring in poly:
                    verts.extend(pad(v) for v in ring)
                    offs.append(offs[-1] + len(ring))
                parts.append(parts[-1] + len(poly))
            had_z = len(coords[0][0][0]) >= 3 if coords and coords[0] and coords[0][0] else False
            emit("multipolygon", verts, offs, parts, had_z)
        # unsupported types silently skipped (reference: default branch)
    return rows


def features_from_geojson(docs: DataFrame) -> DataFrame:
    """docs(dataset_id string, geojson string) -> features DataFrame."""

    def run(batches):
        for pdf in batches:
            out = []
            for did, txt in zip(pdf["dataset_id"], pdf["geojson"]):
                try:
                    # the STRUCTURE walk lives inside the try too: valid
                    # JSON with a malformed shape (features: 42, dict
                    # coordinates, list document) raises Type/Attr/Key/
                    # IndexError — a per-dataset failure that must not
                    # abort the distributed job (the reference returns an
                    # error for that one dataset and the caller continues)
                    out.extend(_feature_rows(str(did), json.loads(txt)))
                except (ValueError, TypeError, AttributeError, KeyError, IndexError) as e:
                    print(f"NonFatal [features_from_geojson] dataset {did}: {e}")
                    continue
            if out:
                yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=FEATURES_SCHEMA)
