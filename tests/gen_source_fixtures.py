"""Generate the committed file-source fixture corpus for the driver gate.

Round-6: the file-source scans (S1 CSV, S2 GeoJSON, S4 GPX + the S8
binaryFile corpus reader and the E1-E4 explodes) move from goldens-only
onto the driver's hash gate (VERDICT r5 task 1). The gate needs a STABLE
on-disk corpus both sides can read — the Spark queries scan these files
through the real source path (spark.read.csv / binaryFile -> mapInPandas
parse), and the DuckDB oracles re-derive the expected rows independently
(read_csv / read_text + JSON functions / regex extraction).

Deterministic: fixed seed, fixed content — regenerating must be
byte-identical (CI-checkable with git diff). Run:

    python tests/gen_source_fixtures.py

Corpus design notes (each case maps to a SURVEY §2 component):

* csv_xy/   P1 role binding, P2 errors->0.0 (empty / garbage / padded /
            trailing-junk / exponent / bare-dot forms), P3 arity=3,
            S1 + per-file dataset ids.
* csv_yx/   the column-encounter-order quirk (convert.go:554-564): the
            Y column precedes X in the header, so xyz_raw[0] carries the
            LAT value — preserved faithfully, no z column (had_z=false).
* geojson/  S2 + E1 (features explode), E2 (MultiLineString one-line-
            per-part), E3 (polygon/multipolygon ring+part flattening),
            F2 falsy drop (null/""/"0"-string dropped, numeric 0 KEPT),
            F3 key routing (name/styletype/id-priority/skip keys),
            P8 %v stringification (ints, bools, simple floats — the
            exponent-switch cases stay in the Go-vector pytest),
            F4/S8: a zero-feature file, an invalid-JSON file and two
            structurally-malformed files that must be isolated.
* gpx/      S4 + E4 (track segments flattened into one line), waypoint /
            route features, missing <ele> -> 0.0 with had_z=true,
            OGR <extensions> attributes, one malformed-XML file isolated.
            Exactly one <trk> and at most one <rte> per file so the
            DuckDB regex oracle can group points without XML parsing.
* kml/      S3 (convert.go:305-385 Go-struct fixed-path binding):
            Document > FIRST Folder only (a decoy second folder is
            ignored), per placemark one direct-child Point, the first
            MultiGeometry > LineString (a second LineString is
            ignored) and the first MultiGeometry > Polygon >
            outerBoundaryIs ring (innerBoundaryIs ignored); bare
            LineStrings outside MultiGeometry ignored; SimpleData
            attributes; 2D coordinates (z -> NaN, normalized to 0.0 on
            the gate); one malformed file isolated. Format-regular so
            the DuckDB oracle can slice with RE2 regex.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

OUT = Path(__file__).resolve().parent / "fixtures" / "sources"


def _csv_xy(d: Path) -> None:
    rng = random.Random(61)
    # P2 error->0.0 cases: Spark CSV reads '' as NULL -> 0.0; padded and
    # trailing-junk strings fail Go ParseFloat -> 0.0 (DuckDB try_cast
    # trims, hence the v=trim(v) guard in the oracle).
    bad = ["", "n/a", " 3.5", "12abc", "--", "4,2"]
    good = lambda: f"{rng.uniform(-180, 180):.6f}"  # noqa: E731
    for f in range(5):
        rows = ["rid,name,x,y,elev,note"]
        n = 12 + 7 * f
        for r in range(n):
            x = good() if rng.random() < 0.8 else rng.choice(bad)
            y = good() if rng.random() < 0.8 else rng.choice(bad)
            z = f"{rng.uniform(0, 4000):.2f}" if rng.random() < 0.6 else rng.choice(["", "1e3", ".5", "5."])
            x = x.replace(",", ";")  # keep the corpus quote-free
            y = y.replace(",", ";")
            rows.append(f"{r},pt_{f}_{r},{x},{y},{z},note {rng.randrange(100)}")
        (d / f"points_{f}.csv").write_text("\n".join(rows) + "\n")


def _csv_yx(d: Path) -> None:
    rng = random.Random(62)
    for f in range(2):
        rows = ["rid,lat,lon,tag"]
        for r in range(9 + 5 * f):
            lat = f"{rng.uniform(-85, 85):.5f}" if rng.random() < 0.85 else ""
            lon = f"{rng.uniform(-180, 180):.5f}" if rng.random() < 0.85 else "oops"
            rows.append(f"{r},{lat},{lon},t{rng.randrange(10)}")
        (d / f"swapped_{f}.csv").write_text("\n".join(rows) + "\n")


def _geojson(d: Path) -> None:
    rng = random.Random(63)

    def pt(z=None):
        c = [round(rng.uniform(-180, 180), 6), round(rng.uniform(-85, 85), 6)]
        if z is not None:
            c.append(round(rng.uniform(0, 1000), 2))
        return c

    def feat(geom, **props):
        return {"type": "Feature", "geometry": geom, "properties": props}

    # g0: points incl. PointZ, routing + falsy-drop properties
    g0 = {
        "type": "FeatureCollection",
        "features": [
            feat({"type": "Point", "coordinates": pt()},
                 name="alpha", styletype="mark", id="17", uid="99",
                 kept_zero=0, dropped_empty="", dropped_null=None,
                 dropped_zero_str="0", tags="skipme", count=7, ok=True),
            feat({"type": "PointZ", "coordinates": pt(z=1)},
                 fid="f-2", osm_id="111", way="skip", ratio=2.5, flag=False),
            feat({"type": "Point", "coordinates": pt()}, name="0"),  # name dropped (falsy "0")
            {"type": "Feature", "geometry": None, "properties": {"name": "nogeom"}},
            feat({"type": "Telescope", "coordinates": [1, 2]}, name="unsupported"),
        ],
    }
    # g1: LineString + empty LineString + MultiLineString (E2: 3 parts)
    g1 = {
        "type": "FeatureCollection",
        "features": [
            feat({"type": "LineString", "coordinates": [pt() for _ in range(5)]}, name="road"),
            feat({"type": "LineString", "coordinates": []}, name="emptyline"),
            feat({"type": "MultiLineStringZ",
                  "coordinates": [[pt(z=1) for _ in range(3)], [pt(z=1) for _ in range(2)],
                                  [pt(z=1) for _ in range(4)]]},
                 name="rivers", uuid="u-7", grade=3),
        ],
    }
    # g2: Polygon with hole + MultiPolygon (2 polys, 3 rings total)
    g2 = {
        "type": "FeatureCollection",
        "features": [
            feat({"type": "Polygon",
                  "coordinates": [[pt() for _ in range(5)], [pt() for _ in range(4)]]},
                 name="lake", styletype="water", area=12.25),
            feat({"type": "MultiPolygon",
                  "coordinates": [[[pt() for _ in range(4)]],
                                  [[pt() for _ in range(5)], [pt() for _ in range(4)]]]},
                 name="islands", id="42"),
        ],
    }
    g3 = {"type": "FeatureCollection", "features": []}  # F4 zero features
    (d / "g0_points.geojson").write_text(json.dumps(g0, separators=(",", ":")))
    (d / "g1_lines.geojson").write_text(json.dumps(g1, separators=(",", ":")))
    (d / "g2_polys.geojson").write_text(json.dumps(g2, separators=(",", ":")))
    (d / "g3_empty.geojson").write_text(json.dumps(g3, separators=(",", ":")))
    # isolation cases: invalid JSON; valid JSON wrong shapes
    (d / "g4_malformed.geojson").write_text('{"type": "FeatureCollection", "features": [')
    (d / "g5_structural.geojson").write_text("[1,2,3]")
    (d / "g6_badfeatures.geojson").write_text('{"type":"FeatureCollection","features":42}')


def _gpx(d: Path) -> None:
    rng = random.Random(64)

    def p(tag: str, ele: bool) -> str:
        lat = f"{rng.uniform(-85, 85):.5f}"
        lon = f"{rng.uniform(-180, 180):.5f}"
        inner = f"<ele>{rng.uniform(0, 3000):.1f}</ele>" if ele else ""
        return f'<{tag} lat="{lat}" lon="{lon}">{inner}</{tag}>'

    # t0: 2 wpts + 1 rte + 1 trk with 2 segments (E4 flatten)
    t0 = (
        '<?xml version="1.0"?><gpx xmlns="http://www.topografix.com/GPX/1/1">'
        + p("wpt", True).replace("</wpt>", "<name>summit</name></wpt>")
        + p("wpt", False).replace("</wpt>", "<name>camp</name></wpt>")
        + "<rte><name>route one</name>"
        + "".join(p("rtept", True) for _ in range(3))
        + "</rte><trk><name>day hike</name><trkseg>"
        + "".join(p("trkpt", True) for _ in range(3))
        + "</trkseg><trkseg>"
        + "".join(p("trkpt", False) for _ in range(2))
        + "</trkseg></trk></gpx>"
    )
    # t1: trk only, 3 segments, mixed ele
    t1 = (
        '<?xml version="1.0"?><gpx xmlns="http://www.topografix.com/GPX/1/1">'
        + "<trk><name>traverse</name>"
        + "".join(
            "<trkseg>" + "".join(p("trkpt", rng.random() < 0.5) for _ in range(k)) + "</trkseg>"
            for k in (2, 4, 3)
        )
        + "</trk></gpx>"
    )
    # t2: single wpt with OGR extension attributes
    t2 = (
        '<?xml version="1.0"?><gpx xmlns="http://www.topografix.com/GPX/1/1" '
        'xmlns:ogr="http://osgeo.org/gdal">'
        + p("wpt", True).replace(
            "</wpt>",
            "<name>beacon</name><extensions><ogr:cnt>5</ogr:cnt>"
            "<ogr:owner>parks</ogr:owner></extensions></wpt>",
        )
        + "</gpx>"
    )
    (d / "t0_mixed.gpx").write_text(t0)
    (d / "t1_track.gpx").write_text(t1)
    (d / "t2_wpt_ext.gpx").write_text(t2)
    (d / "t3_malformed.gpx").write_text("<gpx><trk><trkseg><trkpt lat='1'")


def _kml(d: Path) -> None:
    rng = random.Random(67)

    def coords(n: int, z: bool = True) -> str:
        return " ".join(
            f"{rng.uniform(-180, 180):.6f},{rng.uniform(-85, 85):.6f}"
            + (f",{rng.uniform(0, 500):.2f}" if z else "")
            for _ in range(n)
        )

    def sd(**kv) -> str:
        if not kv:
            return ""
        inner = "".join(f'<SimpleData name="{k}">{v}</SimpleData>' for k, v in kv.items())
        return f"<ExtendedData><SchemaData>{inner}</SchemaData></ExtendedData>"

    def pm(body: str, name: str | None = None, **attrs) -> str:
        nm = f"<name>{name}</name>" if name else ""
        return f"<Placemark>{nm}{sd(**attrs)}{body}</Placemark>"

    def point(z: bool = True) -> str:
        return f"<Point><coordinates>{coords(1, z)}</coordinates></Point>"

    def line(n: int, z: bool = True) -> str:
        return f"<LineString><coordinates>{coords(n, z)}</coordinates></LineString>"

    def poly(n: int, inner: bool = False) -> str:
        extra = (
            "<innerBoundaryIs><LinearRing><coordinates>" + coords(3, False)
            + "</coordinates></LinearRing></innerBoundaryIs>" if inner else ""
        )
        return (
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>" + coords(n, False)
            + "</coordinates></LinearRing></outerBoundaryIs>" + extra + "</Polygon>"
        )

    def doc(folders: str) -> str:
        return ('<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
                f"<Document>{folders}</Document></kml>")

    k0 = doc(
        "<Folder><name>sites</name>"
        + pm(point(True), name="alpha", kind="well", depth="12")
        + pm(point(False), name="beta")
        + pm(point(True), zone="7")
        + "</Folder>"
    )
    # first folder: multigeometry shapes (second LineString + inner ring
    # ignored); DECOY second folder must not bind
    k1 = doc(
        "<Folder><name>paths</name>"
        + pm("<MultiGeometry>" + line(4) + line(3) + poly(5, inner=True) + "</MultiGeometry>",
             name="ridge", grade="steep")
        + pm(point(True) + "<MultiGeometry>" + line(3, False) + "</MultiGeometry>", name="spur")
        + "</Folder><Folder><name>decoy</name>"
        + pm(point(True), name="ghost")
        + "</Folder>"
    )
    # bare LineString outside MultiGeometry ignored; attr-less point kept
    k2 = doc(
        "<Folder><name>odds</name>"
        + pm(line(5), name="ignored-bare-line")
        + pm(point(True))
        + "</Folder>"
    )
    # Document-level placemark, no Folder at all -> zero features
    k4 = doc(pm(point(True), name="orphan"))
    (d / "k0_points.kml").write_text(k0)
    (d / "k1_multi.kml").write_text(k1)
    (d / "k2_odds.kml").write_text(k2)
    (d / "k3_malformed.kml").write_text("<kml><Document><Folder><Placemark><Point></kml>")
    (d / "k4_nofolder.kml").write_text(k4)


def _warc(d: Path) -> None:
    """Round-7: WARC archives (ISO 28500, the Common-Crawl container) for
    q_warc_pages. Two plain .warc + two per-record-gzip-member .warc.gz;
    coverage: warcinfo/request records (filtered out), 200/404/301
    statuses, text/html payloads exercising the html->text chain
    (entities, script/style/comment blocks, case-folded tags),
    application/json and image/png (binary, NULL text), an empty payload,
    a no-reason-phrase status line, and second-resolution WARC-Dates."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from convert_spark.sources import warc as W

    rng = random.Random(77)
    ents = ["&amp;", "&lt;b&gt;", "&quot;q&quot;", "&#39;s&#39;", "&nbsp;", "&amp;nbsp;"]
    for fi in range(4):
        gz = fi >= 2
        recs = [W.build_record("warcinfo", b"software: fixturegen\r\n", date="2026-02-01T00:00:00Z")]
        for ri in range(5 + fi * 2):
            url = f"https://www.site{(fi * 31 + ri * 7) % 23}.co.uk/p{ri}" + ("?q=1" if ri % 3 == 0 else "")
            date = f"2026-02-0{fi + 1}T0{ri % 10}:1{ri % 6}:0{ri % 7}Z"
            if ri % 4 == 3:
                recs.append(W.build_record("request", b"GET / HTTP/1.1\r\nHost: x\r\n\r\n", url=url, date=date))
                continue
            kind = (fi * 5 + ri) % 5

            def coord(v: int) -> str:  # exact 2-decimal string, engine-portable
                return f"{'-' if v < 0 else ''}{abs(v) // 100}.{abs(v) % 100:02d}"

            lat = coord((fi * 31 + ri * 1700) % 18000 - 9000)
            lon = coord((fi * 91 + ri * 3100) % 36000 - 18000)
            geo = f"geo:{lat},{lon}" if ri % 2 == 0 else f"lat {lat} lon {lon}"
            if kind == 0:
                html = (
                    f"<html><head><title>T{fi}.{ri} {rng.choice(ents)}</title>"
                    f"<style>p{{x:{ri}}}</style></head><body><P a='b'>w{ri} "
                    f"{rng.choice(ents)} {geo}</P><script>if({ri}<9){{a=1;}}</script>"
                    f"<!-- c{ri} <i>h</i> -->tail{ri}\n\t end</body></html>"
                ).encode()
                block = W.build_http_response(html, 200, "text/html; charset=utf-8")
            elif kind == 1:
                block = W.build_http_response(
                    f"<body>plain {ri} {rng.choice(ents)} at {geo} <br/>line</body>".encode(),
                    200, "text/html",
                )
            elif kind == 2:
                block = W.build_http_response(
                    json.dumps({"k": ri, "f": fi}).encode(), 200, "application/json"
                )
            elif kind == 3:
                block = W.build_http_response(bytes([rng.randrange(256) for _ in range(48)]), 200, "image/png")
            else:
                status = 404 if ri % 2 else 301
                block = W.build_http_response(b"" if ri % 2 else b"<a href='x'>moved</a>", status, "text/html")
            recs.append(W.build_record("response", block, url=url, date=date))
        # one response whose status line has no reason phrase (valid per spec)
        if fi == 1:
            blk = b"HTTP/1.1 204\r\nContent-Type: text/html\r\n\r\n"
            recs.append(W.build_record("response", blk, url="https://e.com/nc", date="2026-02-02T09:00:00Z"))
        name = f"cc-{fi:03d}.warc" + (".gz" if gz else "")
        (d / name).write_bytes(W.build_warc(recs, gzip_members=gz))


def main() -> None:
    for name, fn in (
        ("csv_xy", _csv_xy),
        ("csv_yx", _csv_yx),
        ("geojson", _geojson),
        ("gpx", _gpx),
        ("kml", _kml),
        ("warc", _warc),
    ):
        d = OUT / name
        d.mkdir(parents=True, exist_ok=True)
        for old in d.iterdir():
            old.unlink()
        fn(d)
        print(name, "->", sorted(x.name for x in d.iterdir()))


if __name__ == "__main__":
    main()
