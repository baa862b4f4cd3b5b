"""KML + GPX sources (S3/S4, convert.go:281-403, 406-546) via stdlib
ElementTree inside mapInPandas (no XML libs in the runtime hot path; one
document per row — documents are the parallelism unit).

Semantics preserved:

KML (convert.go:281-403)
* dataset name = Document/Folder name (convert.go:305),
* per Placemark: attributes from ExtendedData/SchemaData/SimpleData
  verbatim (no falsy-drop/key-routing — the KML path never calls
  ParseGEOJSONAttributes),
* Point -> point; MultiGeometry LineString -> line; MultiGeometry Polygon
  outer boundary ONLY (convert.go:346-359) -> polygon; 2D polygons take
  the drape path downstream (convert.go:362-381).
* coordinate strings are "lon,lat[,z]" whitespace-separated tuples.

GPX (convert.go:406-546)
* waypoints -> points (lon, lat, ele) — ele missing decodes to 0 and the
  vertex is treated as 3D (the Go struct field defaults to 0.0; arity is
  always 3 at convert.go:449),
* routes -> one line each; tracks -> one line each with ALL segments
  flattened (E4, convert.go:511-516),
* attributes from <extensions> OGR children verbatim; name from <name>.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame

from . import FEATURES_SCHEMA


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(el, name):
    return [c for c in el.iter() if _strip(c.tag) == name]


def _parse_coords_text(txt: str) -> list[list[float]]:
    """KML 'lon,lat[,z] lon,lat[,z] ...' -> vertex list (NaN-padded 2D)."""
    out = []
    for tok in (txt or "").split():
        parts = tok.split(",")
        v = [float(p) for p in parts[:3]]
        if len(v) == 2:
            v = v + [float("nan")]
        out.append(v)
    return out


def _parse_lenient(xml_text: str):
    """The reference's vendored decoder tolerates mildly malformed KML (the
    fixture corpus includes a file ending in an unclosed ``</kml``); try
    as-is, then with the missing final ``>``."""
    try:
        return ET.fromstring(xml_text)
    except ET.ParseError:
        return ET.fromstring(xml_text.rstrip() + ">")


def _children(el, name):
    return [c for c in el if _strip(c.tag) == name]


def _kml_rows(dataset_id: str, xml_text: str) -> tuple[list[dict], str]:
    """Structural parity with the reference's kml-decode bindings
    (convert.go:305-385): ONLY Document>Folder (the first folder) is read;
    per placemark exactly one Point (direct child), one
    MultiGeometry>LineString, and one MultiGeometry>Polygon>outerBoundaryIs
    ring bind — bare LineStrings, extra folders, and additional geometries
    inside a MultiGeometry are silently ignored, matching Go struct
    decoding of fixed paths."""
    root = _parse_lenient(xml_text)
    folders = _find_all(root, "Folder")
    name = ""
    placemarks = []
    if folders:
        first = folders[0]
        names = _children(first, "name")
        if names:
            name = (names[0].text or "").strip()
        placemarks = _children(first, "Placemark")
    rows = []
    fidx = 0
    for pm in placemarks:
        attrs = {}
        for sd in _find_all(pm, "SimpleData"):
            attrs[sd.get("name") or ""] = (sd.text or "").strip()
        pm_name = ""
        for c in pm:
            if _strip(c.tag) == "name":
                pm_name = (c.text or "").strip()
                break
        base = {
            "dataset_id": dataset_id,
            "name": pm_name or None,
            "style_type": None,
            "feature_id": None,
            "attributes": attrs,
            # KML SimpleData order is deterministic (document order) and the
            # reference emits attributes in that order — carry it through
            "attr_keys": list(attrs),
        }

        def emit(kind, verts, ring_offsets, part_offsets, had_z):
            nonlocal fidx
            rows.append(
                {
                    **base,
                    "feature_idx": fidx,
                    "geom_kind": kind,
                    "verts": verts,
                    "ring_offsets": ring_offsets,
                    "part_offsets": part_offsets,
                    "had_z": had_z,
                }
            )
            fidx += 1

        # one geometry per fixed path (Go struct binding takes the first)
        points = _children(pm, "Point")
        if points:
            cos = _find_all(points[0], "coordinates")
            if cos:
                verts = _parse_coords_text(cos[0].text)
                if verts:
                    had_z = len((cos[0].text or "").split()[0].split(",")) >= 3
                    emit("point", verts[:1], [0, 1], [0, 1], had_z)
        multis = _children(pm, "MultiGeometry")
        if multis:
            mg = multis[0]
            lss = _children(mg, "LineString")
            if lss:
                cos = _find_all(lss[0], "coordinates")
                if cos:
                    verts = _parse_coords_text(cos[0].text)
                    if verts:
                        had_z = len((cos[0].text or "").split()[0].split(",")) >= 3
                        emit("line", verts, [0, len(verts)], [0, 1], had_z)
            polys = _children(mg, "Polygon")
            if polys:
                outers = _find_all(polys[0], "outerBoundaryIs")
                if outers:  # outer boundary ONLY (convert.go:346-359)
                    cos = _find_all(outers[0], "coordinates")
                    if cos:
                        verts = _parse_coords_text(cos[0].text)
                        if verts:
                            had_z = len((cos[0].text or "").split()[0].split(",")) >= 3
                            emit("polygon", verts, [0, len(verts)], [0, 1], had_z)
    return rows, name


def _gpx_rows(dataset_id: str, xml_text: str) -> list[dict]:
    root = ET.fromstring(xml_text)
    rows = []
    fidx = 0

    def ogr_attrs(el) -> dict:
        attrs = {}
        for ext in _find_all(el, "extensions"):
            for child in ext.iter():
                tag = _strip(child.tag)
                if tag in ("extensions",):
                    continue
                if child.text and child.text.strip() and len(list(child)) == 0:
                    attrs[tag] = child.text.strip()
        return attrs

    def node_name(el) -> str | None:
        for c in el:
            if _strip(c.tag) == "name":
                return (c.text or "").strip() or None
        return None

    def pt_of(el) -> list[float]:
        lon = float(el.get("lon") or 0.0)
        lat = float(el.get("lat") or 0.0)
        ele = 0.0
        for c in el:
            if _strip(c.tag) == "ele" and c.text:
                ele = float(c.text)
        return [lon, lat, ele]  # arity always 3 (Go struct default 0.0)

    def emit(kind, verts, name, attrs):
        nonlocal fidx
        rows.append(
            {
                "dataset_id": dataset_id,
                "feature_idx": fidx,
                "geom_kind": kind,
                "name": name,
                "style_type": None,
                "feature_id": None,
                "attributes": attrs,
                "attr_keys": list(attrs),  # OGR extension document order
                "verts": verts,
                "ring_offsets": [0, len(verts)],
                "part_offsets": [0, 1],
                "had_z": True,
            }
        )
        fidx += 1

    for w in _find_all(root, "wpt"):
        emit("point", [pt_of(w)], node_name(w), ogr_attrs(w))
    for rte in _find_all(root, "rte"):
        verts = [pt_of(p) for p in _find_all(rte, "rtept")]
        if verts:
            emit("line", verts, node_name(rte), ogr_attrs(rte))
    for trk in _find_all(root, "trk"):
        verts = []
        for seg in _find_all(trk, "trkseg"):  # E4: flatten all segments
            verts.extend(pt_of(p) for p in _find_all(seg, "trkpt"))
        if verts:
            emit("line", verts, node_name(trk), ogr_attrs(trk))
    return rows


def features_from_kml(docs: DataFrame) -> DataFrame:
    """docs(dataset_id string, kml string) -> features DataFrame."""

    def run(batches):
        for pdf in batches:
            out = []
            for did, txt in zip(pdf["dataset_id"], pdf["kml"]):
                try:
                    rows, _ = _kml_rows(str(did), txt)
                except (ET.ParseError, ValueError, TypeError, AttributeError, KeyError, IndexError) as e:
                    # malformed numerics, missing attributes, None text,
                    # shape surprises — per-dataset failure isolation (the
                    # reference warns and continues; one bad document must
                    # not abort the task)
                    print(f"NonFatal [features_from_kml] dataset {did}: {e}")
                    continue
                out.extend(rows)
            if out:
                yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=FEATURES_SCHEMA)


def kml_dataset_name(xml_text: str) -> str:
    return _kml_rows("x", xml_text)[1]


def features_from_gpx(docs: DataFrame) -> DataFrame:
    """docs(dataset_id string, gpx string) -> features DataFrame."""

    def run(batches):
        for pdf in batches:
            out = []
            for did, txt in zip(pdf["dataset_id"], pdf["gpx"]):
                try:
                    out.extend(_gpx_rows(str(did), txt))
                except (ET.ParseError, ValueError, TypeError, AttributeError, KeyError, IndexError) as e:
                    # malformed lon/lat/ele numerics, missing attributes,
                    # shape surprises — isolate the one bad dataset
                    # instead of aborting the task
                    print(f"NonFatal [features_from_gpx] dataset {did}: {e}")
                    continue
            if out:
                yield pd.DataFrame(out)

    return docs.mapInPandas(run, schema=FEATURES_SCHEMA)
