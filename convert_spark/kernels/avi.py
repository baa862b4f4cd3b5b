"""AVI video container codec from scratch — numpy + kernels/jpeg only.

Public-spec implementation (Microsoft AVI RIFF form, the OpenDML-free
classic layout) so the multimodal path performs GENUINE video frame
decode — not just container metadata — for the two stream codecs that
are derivable from public specs without an external library:

* **MJPG** (Motion JPEG): every ``00dc`` chunk is a complete baseline
  JPEG image, decoded by the from-scratch T.81 codec in
  ``kernels/jpeg.py`` (the same decoder already under the driver's
  hash gate for still JPEG classes).
* **DIB / BI_RGB** (uncompressed): every ``00db`` chunk is a bottom-up
  24-bit BGR raster with 4-byte row padding — the BMP pixel layout
  (kernels/rasters.py) without the file header; decode is pure numpy
  reshaping.

Container layout written/parsed (all little-endian, chunks padded to
even length):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih'  main header: usec/frame, flags, total frames, streams, w, h
        LIST 'strl'
          'strh' stream header: fccType='vids', handler, scale/rate, length
          'strf' BITMAPINFOHEADER: dims, bit count, biCompression fourcc
      LIST 'movi'
        '00dc'/'00db' frame chunks in presentation order
      'idx1'  per-chunk index (ckid, flags, offset from 'movi' fourcc, size)

Any other stream codec (cinepak, h264, ...) raises the one declared
NotImplementedError — that boundary genuinely needs ffmpeg-class
code. Audio streams inside AVI are skipped for frame decode (the
stream machinery parses only the first 'vids' stream).

Like the other from-scratch codecs this is the test-scale
implementation of a per-payload stage; a production cluster decoding
real video corpora swaps pyav/ffmpeg into the SAME mapInPandas call
site (operators/multimodal.decode_media and friends) — bench.py
measures this path's real payloads/sec so the boundary is quantified.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad(b: bytes) -> bytes:
    return b + (b"\x00" if len(b) & 1 else b"")


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + _pad(body)


def _list(four: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", four + body)


def _dib_frame(px: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 -> bottom-up padded BGR rows (BMP layout)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)
    return rows[::-1].tobytes()


def _dib_pixels(body: bytes, w: int, h: int) -> np.ndarray:
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise NotImplementedError("malformed AVI: truncated DIB frame")
    rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return np.ascontiguousarray(bgr[::-1, :, ::-1])  # bottom-up BGR -> RGB


def encode_avi(frames: list[np.ndarray], fps: int, codec: str = "MJPG",
               quality: int = 85) -> bytes:
    """Encode (h, w, 3) RGB uint8 frames as a classic AVI: ``codec``
    'MJPG' (each frame a baseline JPEG via kernels/jpeg.py) or 'DIB'
    (uncompressed BI_RGB). Writes avih/strh/strf + movi + idx1."""
    h, w, _ = frames[0].shape
    n = len(frames)
    if codec == "MJPG":
        from . import jpeg

        ckid = b"00dc"
        payloads = [jpeg.encode_baseline(f, quality=quality) for f in frames]
        compression = struct.unpack("<I", b"MJPG")[0]
        handler = b"MJPG"
    elif codec == "DIB":
        ckid = b"00db"
        payloads = [_dib_frame(f) for f in frames]
        compression = 0  # BI_RGB
        handler = b"DIB "
    else:
        raise NotImplementedError(f"AVI encode codec {codec}: unsupported")
    frame_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),  # usec/frame
        (frame_bytes * fps) & 0xFFFFFFFF,  # advisory byte rate (32-bit field)
        0, 0x10,  # padding, AVIF_HASINDEX
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4h",
        b"vids", handler, 0, 0, 0, 0,
        1, fps, 0, n, frame_bytes, 10_000, 0,  # scale, rate, start, length
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression,
        ((w * 3 + 3) & ~3) * h, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    idx = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx += ckid + struct.pack("<III", 0x10, 4 + len(movi_body), len(p))
        movi_body += _chunk(ckid, p)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (tag, body_start, body_len) walking sibling chunks."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + ln > end:
            raise NotImplementedError("malformed AVI: chunk overruns parent")
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _parse(data: bytes):
    """-> (w, h, fps, n_frames, compression_fourcc, frame_chunks) where
    frame_chunks is the list of (tag, start, len) movi entries. Any
    structurally-corrupt payload raises the one declared
    NotImplementedError (the multimodal malformed-input contract)."""
    try:
        return _parse_inner(data)
    except NotImplementedError:
        raise
    except Exception as exc:  # noqa: BLE001 — truncated/corrupt headers
        raise NotImplementedError(f"malformed AVI: {exc}") from exc


def _parse_inner(data: bytes):
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError("malformed AVI: bad RIFF header")
    w = h = fps = n_frames = 0
    compression = None
    frame_chunks: list[tuple[bytes, int, int]] = []
    for tag, start, ln in _riff_chunks(data, 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])):
        if tag != b"LIST":
            continue
        four = data[start : start + 4]
        if four == b"hdrl":
            for t2, s2, l2 in _riff_chunks(data, start + 4, start + ln):
                if t2 == b"avih":
                    vals = struct.unpack("<10I", data[s2 : s2 + 40])
                    n_frames, w, h = vals[4], vals[8], vals[9]
                elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    fcc_type = scale = rate = 0
                    comp = None
                    for t3, s3, l3 in _riff_chunks(data, s2 + 4, s2 + l2):
                        if t3 == b"strh":
                            fcc_type = data[s3 : s3 + 4]
                            scale, rate = struct.unpack("<II", data[s3 + 20 : s3 + 28])
                        elif t3 == b"strf" and fcc_type == b"vids":
                            (comp,) = struct.unpack("<I", data[s3 + 16 : s3 + 20])
                    if fcc_type == b"vids" and compression is None:
                        compression = comp
                        fps = rate // scale if scale else 0
        elif four == b"movi":
            for t2, s2, l2 in _riff_chunks(data, start + 4, start + ln):
                if t2[2:4] in (b"dc", b"db"):
                    frame_chunks.append((t2, s2, l2))
    if compression is None or not w or not h:
        raise NotImplementedError("malformed AVI: no video stream header")
    return w, h, fps, n_frames or len(frame_chunks), compression, frame_chunks


def header(data: bytes) -> tuple[int, int, int, int]:
    """Cheap parse: (width, height, n_frames, fps) — no frame decode."""
    w, h, fps, n, _, _ = _parse(data)
    return w, h, n, fps


def stream_codec(data: bytes) -> str:
    """Video-stream codec name: 'DIB' for BI_RGB, else the
    biCompression fourcc as text ('MJPG', ...)."""
    compression = _parse(data)[4]
    if compression == 0:
        return "DIB"
    return struct.pack("<I", compression).decode("ascii", "replace")


def decode_avi(data: bytes) -> tuple[list[np.ndarray], int]:
    """-> (frames as (h, w, 3) RGB uint8 arrays, fps). MJPG frames run
    through kernels/jpeg.py; BI_RGB frames are reshaped DIB rasters."""
    w, h, fps, _, compression, chunks = _parse(data)
    mjpg = struct.unpack("<I", b"MJPG")[0]
    frames: list[np.ndarray] = []
    for _tag, s, ln in chunks:
        body = data[s : s + ln]
        if compression == mjpg:
            from . import jpeg

            px = jpeg.decode_baseline(body)
            if px.shape[2] == 1:  # grayscale MJPG frame -> replicate to RGB
                px = np.repeat(px, 3, axis=2)
            frames.append(px)
        elif compression == 0:
            frames.append(_dib_pixels(body, w, h))
        else:
            fourcc = struct.pack("<I", compression)
            raise NotImplementedError(
                f"AVI codec {fourcc!r}: real codec territory (pyav/ffmpeg swap site)"
            )
    if not frames:
        raise NotImplementedError("malformed AVI: no frame chunks")
    return frames, fps
