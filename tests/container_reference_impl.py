"""Independent scalar twin parser for the container-metadata KAT oracle
(q_media_containers).

Re-implements the PUBLIC container specs — ISO-BMFF (ISO/IEC 14496-12),
Ogg (RFC 3533) with Vorbis-I / Opus (RFC 7845) identification
headers, FLAC STREAMINFO (xiph format spec) and MPEG-1/2 Layer III
frame headers (ISO/IEC 11172-3 / 13818-3, divmod field extraction vs
production's shift/mask) — structurally disjoint from the production
walker
(convert_spark/operators/multimodal.py): production iterates siblings
with ``int.from_bytes`` slices and a generator; this twin reads every
integer through a scalar byte cursor (no ``struct``, no slicing
helpers), descends boxes recursively, and recomputes the Ogg page CRC
bit-by-bit over each byte rather than table-driven. Covers exactly the
corpus ``convert_spark.mediagen.container_payload_for`` emits; anything
else raises ValueError — the KAT builder should never hit it.
"""

from __future__ import annotations


class _Cur:
    """Big-endian-default scalar byte cursor."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("cursor past end")
            v = (v << 8) | self.data[self.pos]
            self.pos += 1
        return v

    def ule(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("cursor past end")
            v |= self.data[self.pos] << (8 * i)
            self.pos += 1
        return v

    def tag(self) -> str:
        t = ""
        for _ in range(4):
            t += chr(self.data[self.pos])
            self.pos += 1
        return t

    def skip(self, n: int) -> None:
        self.pos += n


# ------------------------------------------------------------ ISO-BMFF ---


def _walk_box(data: bytes, pos: int, end: int):
    """(tag, body_start, body_end, next_pos) of the box at pos."""
    c = _Cur(data, pos)
    size = c.u(4)
    tag = c.tag()
    if size == 1:
        size = c.u(8)
    elif size == 0:
        size = end - pos
    if size < c.pos - pos or pos + size > end:
        raise ValueError(f"box {tag} overruns parent")
    return tag, c.pos, pos + size, pos + size


def _children(data: bytes, pos: int, end: int):
    out = []
    while pos + 8 <= end:
        tag, b0, b1, pos = _walk_box(data, pos, end)
        out.append((tag, b0, b1))
    if pos != end:
        raise ValueError("trailing non-box bytes")
    return out


def _parse_trak(data: bytes, b0: int, b1: int) -> dict:
    track_id = None
    timescale = duration = 0
    kind = "unknown"
    codec = ""
    width = height = channels = rate = 0
    for tag, t0, t1 in _children(data, b0, b1):
        if tag == "tkhd":
            c = _Cur(data, t0)
            ver = c.u(1)
            c.skip(3)  # flags
            c.skip(16 if ver == 1 else 8)  # creation + modification times
            track_id = c.u(4)
        elif tag == "mdia":
            for mtag, m0, m1 in _children(data, t0, t1):
                if mtag == "mdhd":
                    c = _Cur(data, m0)
                    ver = c.u(1)
                    c.skip(3)
                    if ver == 1:
                        c.skip(16)
                        timescale = c.u(4)
                        duration = c.u(8)
                    else:
                        c.skip(8)
                        timescale = c.u(4)
                        duration = c.u(4)
                elif mtag == "hdlr":
                    c = _Cur(data, m0)
                    c.skip(8)  # version/flags + pre_defined
                    handler = c.tag()
                    kind = {"vide": "video", "soun": "audio"}.get(handler, "unknown")
                elif mtag == "minf":
                    for ntag, n0, n1 in _children(data, m0, m1):
                        if ntag != "stbl":
                            continue
                        for stag, s0, s1 in _children(data, n0, n1):
                            if stag != "stsd":
                                continue
                            c = _Cur(data, s0)
                            c.skip(4)  # version/flags
                            if c.u(4) == 0:
                                continue
                            etag, e0, e1, _ = _walk_box(data, c.pos, s1)
                            codec = etag
                            ec = _Cur(data, e0)
                            ec.skip(8)  # SampleEntry reserved + data_ref_index
                            if kind == "video":
                                ec.skip(16)  # pre_defined / reserved
                                width = ec.u(2)
                                height = ec.u(2)
                            elif kind == "audio":
                                ec.skip(8)  # reserved
                                channels = ec.u(2)
                                ec.skip(2)  # samplesize
                                ec.skip(4)  # pre_defined + reserved
                                rate = ec.u(4) >> 16
    if track_id is None or timescale == 0:
        raise ValueError("trak missing tkhd/mdhd")
    return {
        "track_id": track_id,
        "track_type": kind,
        "codec": codec,
        "width": width,
        "height": height,
        "n_channels": channels,
        "sample_rate": rate,
        "duration_ms": duration * 1000 // timescale,
    }


def _mp4_rows(data: bytes) -> list[dict]:
    tracks = []
    saw_ftyp = saw_moov = False
    for tag, b0, b1 in _children(data, 0, len(data)):
        if tag == "ftyp":
            saw_ftyp = True
        elif tag == "moov":
            saw_moov = True
            for mtag, m0, m1 in _children(data, b0, b1):
                if mtag == "trak":
                    tracks.append(_parse_trak(data, m0, m1))
    if not (saw_ftyp and saw_moov):
        raise ValueError("missing ftyp/moov")
    return tracks


# ----------------------------------------------------------------- Ogg ---


def _crc_bitwise(page: bytes) -> int:
    """RFC 3533 §6 CRC-32 (poly 0x04C11DB7, unreflected, init 0),
    evaluated bit-serially — independent of the production table."""
    crc = 0
    for byte in page:
        for bit in range(7, -1, -1):
            top = (crc >> 31) & 1
            inbit = (byte >> bit) & 1
            crc = (crc << 1) & 0xFFFFFFFF
            if top ^ inbit:
                crc ^= 0x04C11DB7
    return crc


def _ogg_rows(data: bytes) -> list[dict]:
    streams: dict[int, dict] = {}
    pos = 0
    while pos < len(data):
        c = _Cur(data, pos)
        if c.tag() != "OggS" or c.u(1) != 0:
            raise ValueError("bad Ogg page header")
        header_type = c.u(1)
        granule = c.ule(8)
        if granule >= 1 << 63:
            granule -= 1 << 64
        serial = c.ule(4)
        c.ule(4)  # page sequence
        crc_stored = c.ule(4)
        n_segs = c.u(1)
        lacing = [c.u(1) for _ in range(n_segs)]
        body_start = c.pos
        body_len = sum(lacing)
        page_end = body_start + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page")
        zeroed = data[pos:pos + 22] + b"\x00" * 4 + data[pos + 26:page_end]
        if _crc_bitwise(zeroed) != crc_stored:
            raise ValueError("Ogg CRC mismatch")
        s = streams.setdefault(serial, {"ident": b"", "granule": 0})
        if header_type & 0x02:
            plen = 0
            for v in lacing:
                plen += v
                if v < 255:
                    break
            s["ident"] = data[body_start:body_start + plen]
        if granule >= 0:
            s["granule"] = granule
        pos = page_end
    rows = []
    for serial, s in streams.items():
        ident = s["ident"]
        c = _Cur(ident)
        if ident[:7] == b"\x01vorbis":
            c.skip(7)
            c.ule(4)  # version
            ch = c.u(1)
            rate = c.ule(4)
            dur = s["granule"] * 1000 // rate
            codec = "vorbis"
        elif ident[:8] == b"OpusHead":
            c.skip(8)
            c.u(1)  # version
            ch = c.u(1)
            pre_skip = c.ule(2)
            rate = c.ule(4)
            g = s["granule"] - pre_skip
            dur = (g if g > 0 else 0) * 1000 // 48000
            codec = "opus"
        else:
            raise ValueError("unknown Ogg ident packet")
        rows.append({
            "track_id": serial,
            "track_type": "audio",
            "codec": codec,
            "width": 0,
            "height": 0,
            "n_channels": ch,
            "sample_rate": rate,
            "duration_ms": dur,
        })
    return rows


# ------------------------------------------------------------ FLAC -------


def _flac_rows(data: bytes) -> list[dict]:
    """STREAMINFO via the scalar cursor: the packed 64-bit field is
    decomposed with divmod arithmetic rather than shifts/masks."""
    c = _Cur(data, 4)
    while True:
        hdr = c.u(1)
        ln = c.u(3)
        if hdr % 128 == 0:  # STREAMINFO (type 0)
            if ln < 34:
                raise ValueError("flac: short STREAMINFO")
            c.skip(10)  # block/frame size fields
            packed = c.u(8)
            total = packed % (2**36)
            rest = packed // (2**36)
            bits_per = rest % 32  # 5 bits (bps - 1), unused here
            rest //= 32
            nch = rest % 8 + 1
            rate = rest // 8
            if rate == 0:
                raise ValueError("flac: rate 0")
            _ = bits_per
            return [{
                "track_id": 1, "track_type": "audio", "codec": "flac", "width": 0,
                "height": 0, "n_channels": nch, "sample_rate": rate,
                "duration_ms": total * 1000 // rate,
            }]
        if hdr >= 128:  # last-block flag set, STREAMINFO never seen
            raise ValueError("flac: no STREAMINFO")
        c.skip(ln)


# ------------------------------------------------------------ MP3 --------

_MP3_KBPS = {3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
             2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)}
_MP3_HZ = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000)}


def _mp3_rows(data: bytes) -> list[dict]:
    """MPEG-1/2 Layer III frame-header walk with divmod field
    extraction (production uses shift/mask); ID3v2 prefix and ID3v1
    trailer skipped."""
    pos = 0
    if data[:3] == b"ID3":
        c = _Cur(data, 6)
        sz = 0
        for _ in range(4):
            sz = sz * 128 + c.u(1)
        pos = 10 + sz
        if (data[5] // 16) % 2:  # footer flag
            pos += 10
    frames = 0
    samples = 0
    rate = nch = None
    while pos + 4 <= len(data):
        if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
            break
        b0, b1, b2, b3 = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
        if b0 != 255 or b1 < 0xE0:
            raise ValueError("mp3: lost sync")
        ver = (b1 // 8) % 4
        layer = (b1 // 2) % 4
        if ver not in (2, 3) or layer != 1:
            raise ValueError("mp3: not MPEG-1/2 Layer III")
        br_idx = b2 // 16
        sr_idx = (b2 // 4) % 4
        pad = (b2 // 2) % 2
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("mp3: reserved bitrate/rate")
        hz = _MP3_HZ[ver][sr_idx]
        if rate is None:
            rate = hz
            nch = 1 if b3 // 64 == 3 else 2
        elif hz != rate:
            raise ValueError("mp3: rate change")
        per_frame = 1152 if ver == 3 else 576
        flen = (per_frame // 8) * 1000 * _MP3_KBPS[ver][br_idx] // hz + pad
        if pos + flen > len(data):
            raise ValueError("mp3: truncated frame")
        samples += per_frame
        frames += 1
        pos += flen
    if not frames:
        raise ValueError("mp3: no frames")
    return [{
        "track_id": 1, "track_type": "audio", "codec": "mp3", "width": 0, "height": 0,
        "n_channels": nch, "sample_rate": rate, "duration_ms": samples * 1000 // rate,
    }]


def container_rows(data: bytes) -> tuple[str, list[dict]]:
    """(container_kind, per-track metadata dicts) for one payload."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4", _mp4_rows(data)
    if data[:4] == b"OggS":
        return "ogg", _ogg_rows(data)
    if data[:4] == b"fLaC":
        return "flac", _flac_rows(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi", _avi_rows(data)
    if data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 255 and data[1] >= 0xE0):
        return "mp3", _mp3_rows(data)
    raise ValueError("not an MP4/Ogg/FLAC/MP3/AVI payload")


# ------------------------------------------------------------- AVI -------


def _avi_rows(data: bytes) -> list[dict]:
    """Metadata walk of the classic AVI RIFF form: avih for dims/frame
    count, the first 'vids' strh/strf pair for codec + frame rate.
    Byte-cursor only — no frame decode (the engine's container path
    reads the same headers)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF header")
    end = 8 + int.from_bytes(data[4:8], "little")
    if end > len(data):
        end = len(data)
    w = h = n_frames = 0
    fps = 0
    codec = None

    def walk(pos, stop):
        while pos + 8 <= stop:
            tag = data[pos : pos + 4]
            ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
            yield tag, pos + 8, ln
            pos += 8 + ln + (ln & 1)

    for tag, s, ln in walk(12, end):
        if tag != b"LIST" or data[s : s + 4] != b"hdrl":
            continue
        for t2, s2, l2 in walk(s + 4, s + ln):
            if t2 == b"avih":
                n_frames = int.from_bytes(data[s2 + 16 : s2 + 20], "little")
                w = int.from_bytes(data[s2 + 32 : s2 + 36], "little")
                h = int.from_bytes(data[s2 + 36 : s2 + 40], "little")
            elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                fcc = None
                scale = rate = 0
                comp = None
                for t3, s3, l3 in walk(s2 + 4, s2 + l2):
                    if t3 == b"strh":
                        fcc = data[s3 : s3 + 4]
                        scale = int.from_bytes(data[s3 + 20 : s3 + 24], "little")
                        rate = int.from_bytes(data[s3 + 24 : s3 + 28], "little")
                    elif t3 == b"strf" and fcc == b"vids":
                        comp = int.from_bytes(data[s3 + 16 : s3 + 20], "little")
                if fcc == b"vids" and codec is None:
                    codec = (
                        "dib" if comp == 0
                        else comp.to_bytes(4, "little").decode("ascii", "replace").strip().lower()
                    )
                    fps = rate // scale if scale else 0
    if codec is None or not w or not h:
        raise ValueError("avi: no video stream header")
    return [{
        "codec": codec, "track_id": 1, "track_type": "video",
        "width": w, "height": h, "n_channels": 0,
        "sample_rate": fps,
        "duration_ms": n_frames * 1000 // fps if fps else 0,
    }]
