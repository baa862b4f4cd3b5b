"""WARC (ISO 28500) corpus source — the container Common Crawl actually
ships. Distributed read: ``binaryFile`` scan (one task per archive; CC
archives are ~1 GB, so file-level parallelism is the right grain at
cluster scale) -> Arrow-batched ``mapInPandas`` parse -> one row per
selected record, yielding exactly the north_rule pages shape
(url, warc_ts, html, ...) ready for extract.html_to_text.

Format facts used (all public spec):
* a record is ``WARC/1.x CRLF`` header lines ``CRLF`` block(Content-Length
  bytes) ``CRLF CRLF``;
* Common-Crawl ``.warc.gz`` files are CONCATENATED per-record gzip
  members — members are inflated in sequence (zlib wbits=31 +
  ``unused_data`` chaining) and the plain parser runs on the join;
* a ``response`` record's block is an HTTP/1.x message: status line,
  headers, CRLF CRLF, payload.

Malformed input follows the repo's codec convention: declared
``NotImplementedError("malformed WARC: ...")`` raises (never a bare
struct/index error), with ``malformed="skip_file"`` to isolate bad
archives instead (the F4 guard shape: one bad file never kills the job).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

WARC_ROWS_SCHEMA = (
    "warc_file string, record_idx int, warc_type string, url string, "
    "warc_ts timestamp, http_status int, content_type string, payload binary, "
    "rec_offset long, rec_length long"
)


# --- writer (fixtures / datagen; also the round-trip test surface) ----------


def build_record(warc_type: str, block: bytes, url: str | None = None,
                 date: str = "2026-01-01T00:00:00Z", extra: dict[str, str] | None = None) -> bytes:
    headers = [("WARC-Type", warc_type), ("WARC-Date", date)]
    if url is not None:
        headers.append(("WARC-Target-URI", url))
    for k, v in (extra or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(block))))
    head = b"WARC/1.0\r\n" + b"".join(f"{k}: {v}\r\n".encode() for k, v in headers)
    return head + _CRLF + block + _CRLF + _CRLF


def build_http_response(payload: bytes, status: int = 200,
                        content_type: str = "text/html") -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found", 500: "Server Error"}.get(status, "X")
    return (
        f"HTTP/1.1 {status} {reason}\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n".encode() + payload
    )


def build_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Join records into an archive; ``gzip_members=True`` produces the
    Common-Crawl shape (each record its own gzip member)."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out.append(co.compress(rec) + co.flush())
    return b"".join(out)


# --- parser -----------------------------------------------------------------


def _inflate_members(data: bytes) -> bytes:
    """Concatenated-gzip-member inflate via unused_data chaining."""
    out = []
    while data:
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error as e:
            raise NotImplementedError(f"malformed WARC: bad gzip member ({e})") from None
        if not d.eof:
            raise NotImplementedError("malformed WARC: truncated gzip member")
        data = d.unused_data
    return b"".join(out)


def _parse_headers(raw: bytes, what: str) -> dict[str, str]:
    hdrs: dict[str, str] = {}
    for line in raw.split(_CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise NotImplementedError(f"malformed WARC: {what} header line without ':' ({line[:40]!r})")
        hdrs[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return hdrs


def iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc-headers, block) per record; strict cursor walk."""
    for hdrs, block, _span in iter_records_with_spans(data):
        yield hdrs, block


def iter_records_with_spans(
    data: bytes,
) -> Iterator[tuple[dict[str, str], bytes, tuple[int, int]]]:
    """Like iter_records, plus each record's (offset, length) span in the
    archive's RECORD STREAM — for .warc.gz that is the decompressed
    stream (documented CDX deviation: Common Crawl's own index stores
    compressed member offsets; with the 1-record-per-member convention
    the mapping is member order, but this reader does not re-derive
    member byte offsets)."""
    if data[:2] == b"\x1f\x8b":
        data = _inflate_members(data)
    pos = 0
    while pos < len(data):
        if not data.startswith(b"WARC/", pos):
            raise NotImplementedError(f"malformed WARC: expected record at offset {pos}")
        ver_end = data.find(_CRLF, pos)
        hdr_end = data.find(_HDR_END, pos)
        if ver_end < 0 or hdr_end < 0:
            raise NotImplementedError("malformed WARC: unterminated record header")
        hdrs = _parse_headers(data[ver_end + 2 : hdr_end], "record")
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            raise NotImplementedError("malformed WARC: missing/invalid Content-Length") from None
        block_start = hdr_end + 4
        block_end = block_start + clen
        if block_end > len(data):
            raise NotImplementedError("malformed WARC: block overruns archive")
        if data[block_end : block_end + 4] != _HDR_END:
            raise NotImplementedError("malformed WARC: record not CRLF-CRLF terminated")
        yield hdrs, data[block_start:block_end], (pos, block_end + 4 - pos)
        pos = block_end + 4


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    hdr_end = block.find(_HDR_END)
    if hdr_end < 0 or not block.startswith(b"HTTP/"):
        raise NotImplementedError("malformed WARC: response block is not an HTTP message")
    status_line, _, rest = block[:hdr_end].partition(_CRLF)
    parts = status_line.split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise NotImplementedError(f"malformed WARC: bad HTTP status line ({status_line[:40]!r})")
    return int(parts[1]), _parse_headers(rest, "http"), block[hdr_end + 4 :]


def _file_rows(name: str, data: bytes, record_types: tuple[str, ...]):
    for idx, (hdrs, block, span) in enumerate(iter_records_with_spans(data)):
        wtype = hdrs.get("warc-type", "")
        if wtype not in record_types:
            continue
        status, http_hdrs, payload = (None, {}, block)
        if wtype == "response":
            status, http_hdrs, payload = parse_http_response(block)
        yield {
            "warc_file": name,
            "record_idx": idx,
            "warc_type": wtype,
            "url": hdrs.get("warc-target-uri"),
            "warc_ts": hdrs.get("warc-date"),
            "http_status": status,
            "content_type": http_hdrs.get("content-type"),
            "payload": payload,
            "rec_offset": span[0],
            "rec_length": span[1],
        }


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    record_types: tuple[str, ...] = ("response",),
    malformed: str = "error",
) -> DataFrame:
    """Directory of .warc / .warc.gz -> one row per selected record.

    ``malformed="skip_file"`` drops an unparseable ARCHIVE (not record —
    a corrupt byte stream poisons everything after it) and keeps the job
    alive; default is the declared raise."""
    if malformed not in ("error", "skip_file"):
        raise ValueError(f"malformed must be 'error' or 'skip_file', got {malformed!r}")
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    slim = raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("name"), "content"
    )

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for name, content in zip(pdf["name"], pdf["content"]):
                try:
                    rows.extend(_file_rows(name, bytes(content), record_types))
                except NotImplementedError:
                    if malformed == "error":
                        raise
            out = pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_idx", "warc_type", "url",
                    "warc_ts", "http_status", "content_type", "payload",
                    "rec_offset", "rec_length",
                ],
            )
            if len(out):
                out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            else:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return slim.mapInPandas(parse, schema=WARC_ROWS_SCHEMA)


def warc_pages(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """The full ingest composition: WARC archives -> north_rule pages
    (url, warc_ts, html, title, text) — html kept as the raw binary
    payload, text derived by the Catalyst html->text chain for text/html
    responses (NULL otherwise: binary payloads are the multimodal path)."""
    from ..operators.extract import html_text_col, html_title_col

    recs = read_warc(spark, path, glob).filter(F.col("http_status") == 200)
    is_html = F.lower(F.col("content_type")).startswith("text/html")
    decoded = F.decode(F.col("payload"), "UTF-8")
    return recs.select(
        "url",
        "warc_ts",
        F.col("payload").alias("html"),
        F.when(is_html, html_title_col(decoded)).alias("title"),
        F.when(is_html, html_text_col(decoded)).alias("text"),
    )


def warc_cdx(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """CDX-style capture index over the archives (the Common-Crawl/
    Wayback index shape): one row per response capture keyed by SURT +
    timestamp, carrying the payload digest and the record's (file,
    offset, length) span for random access. Offsets are record-stream
    offsets (see iter_records_with_spans for the .warc.gz deviation).
    Sorting by (surt, ts) is exactly the CDX collation — range-
    partitioning on surt gives per-domain locality at crawl scale."""
    from ..functions import urls as U

    recs = read_warc(spark, path, glob)
    u = F.col("url")
    hostport = F.regexp_replace(F.regexp_extract(u, U.URL_RE, 4), U.USERINFO_RE, "")
    host = F.lower(F.regexp_replace(hostport, U.PORT_RE, ""))
    upath = F.regexp_extract(u, U.URL_RE, 5)
    return recs.select(
        U.surt_key(host, upath).alias("surt"),
        F.col("warc_ts").alias("ts"),
        "url",
        F.sha2("payload", 256).alias("digest"),
        "warc_file",
        "rec_offset",
        "rec_length",
    ).orderBy("surt", "ts", "warc_file", "rec_offset")
