"""Scalar reference implementation of the WARC source — structurally
disjoint from convert_spark/sources/warc.py: multi-member gzip via the
stdlib ``gzip`` module (the engine chains zlib ``unused_data``), header
parsing via a BytesIO readline walk (the engine uses find/partition
cursor arithmetic), and html text/title via the regex-free character-walk
twin in tests/html_reference_impl.py (the engine runs the Catalyst
chain). Used by gen_kats.kat_warc_pages and the parity pytest."""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime

import html_reference_impl as html_twin


def _read_headers(f: io.BytesIO) -> dict[str, str]:
    hdrs: dict[str, str] = {}
    while True:
        line = f.readline()
        if line in (b"\r\n", b"\n", b""):
            return hdrs
        text = line.decode("latin-1").rstrip("\r\n")
        key, _, val = text.partition(":")
        hdrs[key.strip().lower()] = val.strip()


def parse_archive(data: bytes) -> list[dict]:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # stdlib handles concatenated members
    f = io.BytesIO(data)
    out = []
    while True:
        version = f.readline()
        if not version:
            break
        assert version.startswith(b"WARC/"), version
        hdrs = _read_headers(f)
        block = f.read(int(hdrs["content-length"]))
        assert f.read(4) == b"\r\n\r\n"
        out.append({"headers": hdrs, "block": block})
    return out


def response_rows(name: str, data: bytes) -> list[dict]:
    """The q_warc_pages projection, independently derived."""
    rows = []
    for idx, rec in enumerate(parse_archive(data)):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        bf = io.BytesIO(rec["block"])
        status_line = bf.readline().decode("latin-1").rstrip("\r\n")
        status = int(status_line.split(" ")[1])
        http = _read_headers(bf)
        payload = bf.read()
        ctype = http.get("content-type")
        is_html = bool(ctype) and ctype.lower().startswith("text/html")
        decoded = payload.decode("utf-8") if is_html else None
        rows.append(
            {
                "warc_file": name,
                "record_idx": idx,
                "url": h.get("warc-target-uri"),
                "warc_ts": datetime.fromisoformat(h["warc-date"].replace("Z", "+00:00")).replace(tzinfo=None),
                "http_status": status,
                "content_type": ctype,
                "n_bytes": len(payload),
                "payload_sha": hashlib.sha256(payload).hexdigest(),
                "title": html_twin.html_title(decoded) if is_html else None,
                "text": html_twin.html_text(decoded) if is_html else None,
            }
        )
    return rows


def _surt(url: str) -> str:
    """Scalar SURT — a string-walk restatement of the engine's regex
    grammar (RFC 3986 App B authority split + label reverse)."""
    rest = url
    i = rest.find("://")
    if i >= 0:
        rest = rest[i + 3 :]
    elif rest.startswith("//"):
        rest = rest[2:]
    else:  # relative reference: empty authority, url itself is the path
        path = rest.split("?")[0].split("#")[0]
        return ")" + path
    end = len(rest)
    for ch in "/?#":
        j = rest.find(ch)
        if 0 <= j < end:
            end = j
    auth, tail = rest[:end], rest[end:]
    path = tail.split("?")[0].split("#")[0]
    if "@" in auth:
        auth = auth.split("@", 1)[1]
    host = auth
    if ":" in host and host.rsplit(":", 1)[1].isdigit():
        host = host.rsplit(":", 1)[0]
    host = host.lower()
    return ",".join(reversed(host.split("."))) + ")" + path


def cdx_rows(name: str, data: bytes) -> list[dict]:
    """The warc_cdx projection, independently derived (spans via a
    cursor over the same record-stream the archive parser walks)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    rows = []
    f = io.BytesIO(data)
    while True:
        start = f.tell()
        version = f.readline()
        if not version:
            break
        hdrs = _read_headers(f)
        block = f.read(int(hdrs["content-length"]))
        assert f.read(4) == b"\r\n\r\n"
        end = f.tell()
        if hdrs.get("warc-type") != "response":
            continue
        bf = io.BytesIO(block)
        bf.readline()
        _read_headers(bf)
        payload = bf.read()
        url = hdrs["warc-target-uri"]
        rows.append(
            {
                "surt": _surt(url),
                "ts": datetime.fromisoformat(hdrs["warc-date"].replace("Z", "+00:00")).replace(tzinfo=None),
                "url": url,
                "digest": hashlib.sha256(payload).hexdigest(),
                "warc_file": name,
                "rec_offset": start,
                "rec_length": end - start,
            }
        )
    return rows
