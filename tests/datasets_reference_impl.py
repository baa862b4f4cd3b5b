"""Scalar twin of the S6 Datasets-JSON sink (the reference's deliverable,
convert.go:29-39; geometry/attribute dispatch convert.go:627-832; finalize
convert.go:1137-1192).

Re-derives every per-dataset MineAR document of q_datasets_json WITHOUT
Spark and WITHOUT the production package's vectorized kernels or parsing
code: a fresh scalar GeoJSON feature walk, a fresh Decimal-based Go-%v
formatter, and the existing scalar twins for the numeric kernels —
mercator/DEM/PIP/Delaunay via tests/mesh_reference_impl.py, DEM/S2
covering via tests/s2_reference_impl.py. Only the corpus builder
(convert_spark.queries.datasets_json_corpus — input construction) and the
float-canonical digest (queries.canon_json_digest — digest plumbing,
structure-preservation pinned by tests/test_source_gate.py) are shared
with the engine side, the same split the mesh twin uses.
"""

from __future__ import annotations

import hashlib
import json
import math
from decimal import Decimal

import mesh_reference_impl as meshref
import s2_reference_impl as s2ref

# --- Go %v float formatting (fresh implementation, Decimal-based) ---------


def go_fmt_s(v: float) -> str:
    """fmt.Sprintf("%v", float64) — shortest round-trip digits with the
    shortest-'g' exponent rule (scientific iff decimal exponent < -4 or
    >= 6, strconv ftoa.go eprec=6). Independent mechanism from the
    production repr-string surgery: exact digit extraction via Decimal."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == 0:
        return "0"
    sign, digits, dexp = Decimal(repr(float(v))).as_tuple()
    ds = list(digits)
    while len(ds) > 1 and ds[-1] == 0:
        ds.pop()
        dexp += 1
    exp10 = dexp + len(ds) - 1
    s = "-" if sign else ""
    if exp10 < -4 or exp10 >= 6:
        mant = str(ds[0]) + ("." + "".join(map(str, ds[1:])) if len(ds) > 1 else "")
        return f"{s}{mant}e{'+' if exp10 >= 0 else '-'}{abs(exp10):02d}"
    if dexp >= 0:
        return s + "".join(map(str, ds)) + "0" * dexp
    intlen = len(ds) + dexp
    if intlen > 0:
        return s + "".join(map(str, ds[:intlen])) + "." + "".join(map(str, ds[intlen:]))
    return s + "0." + "0" * (-intlen) + "".join(map(str, ds))


def _str_v(v) -> str:
    """%v for JSON-decoded property values (Go json: every number is
    float64, so integers take the float form too)."""
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return go_fmt_s(float(v))
    return str(v)


# --- GeoJSON feature walk (fresh scalar dispatch) --------------------------

_ID_KEYS = ("id", "fid", "osm_id", "uid", "uuid")
_DROP_KEYS = frozenset(("tags", "way", "geomz"))


def _props_s(props: dict | None):
    """F2 falsy drop (nil / "" / string "0" only — numeric 0 is a Go
    float64 and is KEPT) + F3 key routing."""
    name = style = None
    by_id = {}
    attrs = {}
    for k, v in (props or {}).items():
        if v is None or v == "" or (isinstance(v, str) and v == "0"):
            continue
        if k == "name":
            name = _str_v(v)
        elif k == "styletype":
            style = _str_v(v)
        elif k in _ID_KEYS:
            by_id[k] = _str_v(v)
        elif k in _DROP_KEYS:
            continue
        else:
            attrs[str(k)] = _str_v(v)
    fid = next((by_id[k] for k in _ID_KEYS if k in by_id), None)
    return name, style, fid, attrs


def _vert3(c) -> list:
    """[x, y, z-or-None]; short arities padded with None (production pads
    NaN; both mean "missing")."""
    c = list(c)
    return [c[0] if len(c) > 0 else None, c[1] if len(c) > 1 else None, c[2] if len(c) > 2 else None]


def parse_features_s(doc: dict) -> list[dict]:
    """Feature rows in document order; skipped geometries do not consume
    a feature index (convert.go default branch)."""
    out = []
    for feat in doc.get("features", []):
        geom = feat.get("geometry") or {}
        gtype = (geom.get("type") or "").replace("Z", "")
        coords = geom.get("coordinates")
        name, style, fid, attrs = _props_s(feat.get("properties"))
        if coords is None:
            continue
        base = {"name": name, "style_type": style, "feature_id": fid, "attributes": attrs}

        def first_arity(c) -> bool:
            return len(c) >= 3

        if gtype == "Point":
            out.append({**base, "geom_kind": "point", "verts": [_vert3(coords)],
                        "ring_offsets": [0, 1], "part_offsets": [0, 1],
                        "had_z": first_arity(coords)})
        elif gtype == "LineString":
            out.append({**base, "geom_kind": "line", "verts": [_vert3(c) for c in coords],
                        "ring_offsets": [0, len(coords)], "part_offsets": [0, 1],
                        "had_z": first_arity(coords[0]) if coords else False})
        elif gtype == "MultiLineString":
            for part in coords:  # E2: one line feature per part
                out.append({**base, "geom_kind": "line", "verts": [_vert3(c) for c in part],
                            "ring_offsets": [0, len(part)], "part_offsets": [0, 1],
                            "had_z": first_arity(part[0]) if part else False})
        elif gtype == "Polygon":
            verts, offs = [], [0]
            for ring in coords:
                verts += [_vert3(c) for c in ring]
                offs.append(offs[-1] + len(ring))
            out.append({**base, "geom_kind": "polygon", "verts": verts,
                        "ring_offsets": offs, "part_offsets": [0, len(coords)],
                        "had_z": first_arity(coords[0][0]) if coords and coords[0] else False})
        elif gtype == "MultiPolygon":
            verts, offs, parts = [], [0], [0]
            for poly in coords:
                for ring in poly:
                    verts += [_vert3(c) for c in ring]
                    offs.append(offs[-1] + len(ring))
                parts.append(parts[-1] + len(poly))
            out.append({**base, "geom_kind": "multipolygon", "verts": verts,
                        "ring_offsets": offs, "part_offsets": parts,
                        "had_z": first_arity(coords[0][0][0])
                        if coords and coords[0] and coords[0][0] else False})
        # any other geometry type: silently skipped
    return out


# --- normalize (scalar CheckCoords per vertex) ------------------------------


def _norm_verts_s(verts: list) -> list | None:
    """Project every vertex to 3857 cm-rounded; 2D vertices get DEM z at
    the ORIGINAL coordinates (NaN -> 0.0); any bad x/y errors the whole
    feature (GeoJSON semantics); empty geometries are dropped (production
    _check_verts: verts.size == 0 -> None)."""
    if not verts:
        return None
    out = []
    for x, y, z in verts:
        if x is None or y is None or x != x or y != y:
            return None
        px, py = meshref.to3857_s(float(x), float(y))
        if z is None or z != z:
            zf = s2ref.get_elev_s(float(x), float(y))
            z = 0.0 if zf != zf else zf
        out.append([px, py, float(z)])
    return out


# --- per-dataset document ----------------------------------------------------


def _attrs_json_s(attrs: dict) -> list | None:
    if not attrs:
        return None  # Go nil slice -> JSON null
    return [{"key": k, "value": attrs[k]} for k in sorted(attrs)]


def convert_dataset_s(name: str, text: str) -> dict | None:
    """GeoJSON text -> MineAR Datasets document dict, all-scalar."""
    feats = parse_features_s(json.loads(text))
    survivors = []
    for f in feats:
        proj = _norm_verts_s(f["verts"])
        if proj is None:
            continue
        survivors.append({**f, "proj": proj})
    if not survivors:
        return None
    allv = [v for f in survivors for v in f["proj"]]
    lx = min(v[0] for v in allv)
    rx = max(v[0] for v in allv)
    ly = min(v[1] for v in allv)
    uy = max(v[1] for v in allv)
    cx = rx - (rx - lx) / 2.0
    cy = uy - (uy - ly) / 2.0
    cz = s2ref.get_elev_s(cx, cy)
    if cz != cz:
        cz = 0.0
    s2toks = s2ref.covering_tokens_s(lx, ly, rx, uy)
    buckets = {"points": [], "lines": [], "shapes": []}
    for f in survivors:
        base = {
            "id": f["feature_id"] or "",
            "name": f["name"] or "",
            "type": f["style_type"] or "",
            "attributes": _attrs_json_s(f["attributes"]),
        }
        kind = f["geom_kind"]
        if kind == "point":
            buckets["points"].append({**base, "point": f["proj"][0]})
            continue
        if kind == "line":
            buckets["lines"].append({**base, "points": f["proj"]})
            continue
        offs, parts = f["ring_offsets"], f["part_offsets"]
        mesh = None
        if not f["had_z"]:
            mesh = meshref.drape_s(
                {
                    "verts_raw": [[v[0], v[1]] for v in f["verts"]],
                    "ring_offsets": offs,
                    "part_offsets": parts,
                    "geom_kind": kind,
                }
            )
        if mesh is not None:
            buckets["shapes"].append({**base, "points": None,
                                      "vertices": mesh[0], "indices": mesh[1]})
        else:
            rings = [f["proj"][offs[r]: offs[r + 1]] for r in range(len(offs) - 1)]
            nested = [[rings[r] for r in range(parts[p], parts[p + 1])]
                      for p in range(len(parts) - 1)]
            buckets["shapes"].append({**base, "points": nested,
                                      "vertices": None, "indices": None})
    return {
        "id": "",
        "name": name,
        "dataurl": "",
        "lastUpdated": "",
        "center": [{"x": cx, "y": cy, "z": cz}],
        "s2": s2toks or None,
        "points": buckets["points"] or None,
        "lines": buckets["lines"] or None,
        "shapes": buckets["shapes"] or None,
    }


def digest_row(dataset_id: str, name: str, text: str) -> dict | None:
    """Mirror of q_datasets_json's per-dataset digest projection."""
    from convert_spark.queries import canon_json_digest  # shared digest plumbing

    doc = convert_dataset_s(name, text)
    if doc is None:
        return None
    pts = doc["points"] or []
    lines = doc["lines"] or []
    shapes = doc["shapes"] or []
    s2 = doc["s2"] or []
    c = doc["center"][0]
    n_features = len(pts) + len(lines) + len(shapes)
    return {
        "dataset_id": dataset_id,
        "name": doc["name"],
        "n_features": n_features,
        "n_points": len(pts),
        "n_lines": len(lines),
        "n_shapes": len(shapes),
        "n_meshes": sum(1 for s in shapes if s["vertices"] is not None),
        "center_x": float(c["x"]),
        "center_y": float(c["y"]),
        "center_z": float(c["z"]),
        "n_s2": len(s2),
        "s2_hash": hashlib.md5(",".join(s2).encode()).hexdigest(),
        "json_md5": canon_json_digest(json.dumps(doc, sort_keys=False)),
    }
