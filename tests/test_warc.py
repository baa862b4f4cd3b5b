"""WARC source: writer/parser round trips, engine-vs-twin parity over the
fixture corpus, declared-malformed raises (mutation fuzz), skip_file
isolation, and the pages composition."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from convert_spark.sources import warc as W

import warc_reference_impl as wref

FIX = Path(__file__).resolve().parent / "fixtures" / "sources" / "warc"


def _sample_archive(gz: bool) -> bytes:
    recs = [
        W.build_record("warcinfo", b"software: t\r\n"),
        W.build_record(
            "response",
            W.build_http_response(b"<html><body>A &amp; B</body></html>", 200, "text/html"),
            url="https://a.com/x",
            date="2026-03-01T12:34:56Z",
        ),
        W.build_record("request", b"GET /x HTTP/1.1\r\n\r\n", url="https://a.com/x"),
        W.build_record(
            "response",
            W.build_http_response(b"\x00\x01binary", 200, "image/png"),
            url="https://a.com/i",
        ),
    ]
    return W.build_warc(recs, gzip_members=gz)


class TestRoundTrip:
    @pytest.mark.parametrize("gz", [False, True])
    def test_writer_parser_roundtrip(self, gz):
        data = _sample_archive(gz)
        recs = list(W.iter_records(data))
        assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response", "request", "response"]
        status, http, payload = W.parse_http_response(recs[1][1])
        assert (status, payload) == (200, b"<html><body>A &amp; B</body></html>")
        assert http["content-type"] == "text/html"

    @pytest.mark.parametrize("gz", [False, True])
    def test_twin_agrees(self, gz):
        data = _sample_archive(gz)
        ours = [(h, b) for h, b in W.iter_records(data)]
        theirs = wref.parse_archive(data)
        assert len(ours) == len(theirs)
        for (h, b), t in zip(ours, theirs):
            assert h == t["headers"] and b == t["block"]


class TestSpans:
    @pytest.mark.parametrize("gz", [False, True])
    def test_spans_tile_the_record_stream(self, gz):
        """(offset, length) spans are contiguous, start at 0 and cover
        the whole decompressed record stream — the random-access
        contract the CDX index row hands out."""
        import zlib

        data = _sample_archive(gz)
        stream_len = len(zlib.decompressobj(31).decompress(data)) if gz else len(data)
        if gz:
            from convert_spark.sources.warc import _inflate_members

            stream_len = len(_inflate_members(data))
        pos = 0
        for _h, _b, (off, length) in W.iter_records_with_spans(data):
            assert off == pos and length > 0
            pos = off + length
        assert pos == stream_len

    def test_span_slice_reparses_identically(self):
        """Slicing a plain archive at a record's span yields a 1-record
        archive that parses to the same record (the seek use case)."""
        data = _sample_archive(False)
        recs = list(W.iter_records_with_spans(data))
        for hdrs, block, (off, length) in recs:
            again = list(W.iter_records(data[off : off + length]))
            assert again == [(hdrs, block)]


class TestFixtureParity:
    def test_engine_matches_twin_rows(self, spark):
        got = (
            W.read_warc(spark, str(FIX))
            .select("warc_file", "record_idx", "url", "http_status", "content_type",
                    F.sha2("payload", 256).alias("sha"))
            .orderBy("warc_file", "record_idx")
            .collect()
        )
        want = []
        for p in sorted(FIX.iterdir()):
            want.extend(wref.response_rows(p.name, p.read_bytes()))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g["warc_file"], g["record_idx"], g["url"], g["http_status"], g["content_type"], g["sha"]) == (
                w["warc_file"], w["record_idx"], w["url"], w["http_status"], w["content_type"], w["payload_sha"]
            )


class TestMalformed:
    CASES = [
        b"NOTWARC/1.0\r\n\r\n\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",  # no Content-Length, unterminated
        W.build_record("response", b"x" * 10)[:-6],  # truncated block
        W.build_record("response", b"x")[:-2],  # missing final CRLF
    ]

    @pytest.mark.parametrize("data", CASES)
    def test_declared_raise(self, data):
        with pytest.raises(NotImplementedError, match="malformed WARC"):
            list(W.iter_records(data))

    def test_truncated_gzip_member(self):
        data = W.build_warc([W.build_record("warcinfo", b"a\r\n")], gzip_members=True)
        with pytest.raises(NotImplementedError, match="malformed WARC"):
            list(W.iter_records(data[: len(data) - 5]))

    def test_mutation_fuzz_never_undeclared(self):
        """Byte mutations must raise the declared error or parse — never
        IndexError/struct.error/etc."""
        import random

        rng = random.Random(7)
        base = _sample_archive(False)
        gzbase = _sample_archive(True)
        for src in (base, gzbase):
            for _ in range(300):
                b = bytearray(src)
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                try:
                    for h, blk in W.iter_records(bytes(b)):
                        if h.get("warc-type") == "response" and blk[:5] == b"HTTP/":
                            W.parse_http_response(blk)
                except NotImplementedError:
                    pass
                except (UnicodeDecodeError, ValueError):
                    pass  # header decode/int edge — explicit, not a crash
                # anything else (IndexError, struct.error, zlib.error) fails

    def test_bad_http_status(self):
        with pytest.raises(NotImplementedError, match="status line"):
            W.parse_http_response(b"HTTP/1.1 twohundred OK\r\n\r\n")

    def test_skip_file_isolates(self, spark, tmp_path):
        d = tmp_path / "mix"
        d.mkdir()
        (d / "good.warc").write_bytes(_sample_archive(False))
        (d / "bad.warc").write_bytes(b"WARC/1.0\r\ngarbage")
        with pytest.raises(Exception):
            W.read_warc(spark, str(d)).count()
        got = W.read_warc(spark, str(d), malformed="skip_file").collect()
        assert {r["warc_file"] for r in got} == {"good.warc"}
        assert len(got) == 2


class TestPagesComposition:
    def test_warc_pages_shape(self, spark):
        pages = W.warc_pages(spark, str(FIX))
        rows = pages.collect()
        assert len(rows) > 0
        html_rows = [r for r in rows if r["text"] is not None]
        other = [r for r in rows if r["text"] is None]
        assert html_rows and other  # both payload families present
        assert all(r["url"] and r["warc_ts"] is not None for r in rows)
        # derived text is the Catalyst chain == char-walk twin
        import html_reference_impl as html_twin

        for r in html_rows[:5]:
            assert r["text"] == html_twin.html_text(bytes(r["html"]).decode("utf-8"))

    def test_mapinpandas_only_python_node(self, spark):
        """The only Python exchange is the record walk itself; the html
        derivation stays Catalyst-side on top of it."""
        plan = W.warc_pages(spark, str(FIX))._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1, plan
        assert "BatchEvalPython" not in plan, plan
