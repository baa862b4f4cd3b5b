"""BMP and baseline-TIFF raster codecs from scratch — numpy only.

Public-spec implementations (Windows BITMAPINFOHEADER / Adobe TIFF 6.0
baseline) for the multimodal real path. Unlike the entropy-coded
formats (kernels/jpeg.py, kernels/gif.py), these are PURE LAYOUT
formats: decode is byte reshaping + channel reordering, fully
vectorized — no per-pixel Python anywhere, so they run at memcpy-class
speed even in this from-scratch build.

Coverage:

* BMP: BITMAPINFOHEADER (40-byte) BI_RGB — 24-bit BGR and 8-bit
  palettized, bottom-up (positive height) and top-down (negative),
  4-byte row padding. Output RGB uint8.
* TIFF: both byte orders ('II'/'MM'), 8 bits per sample,
  PhotometricInterpretation 1 (grayscale) or 2 (RGB), multi-strip via
  StripOffsets/StripByteCounts/RowsPerStrip; Compression 1
  (uncompressed), 32773 (PackBits RLE), 8/32946 (Deflate) and 5 (LZW
  per TIFF 6.0 §13 — MSB-first codes, 9-bit start, early change),
  with the horizontal-differencing Predictor (tag 317, value 2) the
  compressed shapes ship with in practice.

The layout paths stay pure-numpy; PackBits/LZW are per-strip entropy
loops (the same test-scale boundary as kernels/jpeg.py — the
production swap site is a native TIFF codec at the same call sites).
Everything else (JPEG-in-TIFF, CCITT, 1/4/16-bit TIFF, BMP bitfields,
OS/2 headers) raises the declared NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np


# --- BMP ------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP -> (h, w, 3) RGB uint8."""
    if data[:2] != b"BM" or len(data) < 54:
        raise NotImplementedError("malformed BMP: bad header")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core/OS2 headers: unsupported")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression}: unsupported")
    if w <= 0 or h_raw == 0:
        raise NotImplementedError("malformed BMP: bad dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * bpp // 8 + 3) & ~3
    px = data[pix_off : pix_off + stride * h]
    if len(px) != stride * h:
        raise NotImplementedError("malformed BMP: truncated pixel data")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
    elif bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(data[pal_off : pal_off + 4 * n_colors], dtype=np.uint8)
        if pal.size != 4 * n_colors:
            raise NotImplementedError("malformed BMP: truncated palette")
        pal = pal.reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
        idx = rows[:, :w]
        if int(idx.max(initial=0)) >= n_colors:
            raise NotImplementedError("malformed BMP: palette index out of range")
        rgb = pal[idx]
    else:
        raise NotImplementedError(f"BMP bit depth {bpp}: unsupported")
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(px: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) RGB uint8 -> 24-bit BI_RGB BMP (bottom-up by default)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    body = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return hdr + info + body


# --- TIFF -----------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(src: bytes, out_len: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): control n in [0,127] copies
    n+1 literals, n in [129,255] repeats the next byte 257-n times,
    n == 128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < out_len:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise NotImplementedError("malformed TIFF: truncated PackBits run")
            out += bytes([src[i]]) * (257 - n)
            i += 1
    if len(out) < out_len:
        raise NotImplementedError("malformed TIFF: PackBits underrun")
    return bytes(out[:out_len])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the TIFF convention: runs never cross rows):
    greedy — emit repeat packets for runs of >= 3, literal packets
    otherwise."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), row[i]])
            i = j
            continue
        # literal stretch: until a run of >= 3 starts (or 128 cap)
        lit = i
        while j < n and j - lit < 128:
            k = j + 1
            while k < n and k - j < 128 and row[k] == row[j]:
                k += 1
            if k - j >= 3:
                break
            j = k
        j = min(j, lit + 128, n)
        out += bytes([j - lit - 1]) + row[lit:j]
        i = j
    return bytes(out)


def _tiff_lzw_decode(src: bytes, out_len: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first code packing, 9-bit initial width,
    ClearCode 256 / EOI 257, EARLY CHANGE (width bumps when the next
    code WOULD overflow — at table sizes 511/1023/2047)."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    acc = nbits = 0
    width = 9
    prev: bytes | None = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == EOI:
                if len(out) < out_len:
                    raise NotImplementedError("malformed TIFF: LZW EOI underrun")
                return bytes(out[:out_len])
            if prev is None:
                if code >= len(table):
                    raise NotImplementedError("malformed TIFF: bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise NotImplementedError("malformed TIFF: LZW code out of range")
            out += entry
            prev = entry
            # early change: the writer bumps when its next free code
            # equals 2^w - 1, which the reader sees one append earlier —
            # switch when the table holds 2^w - 2 entries
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= out_len:
                return bytes(out[:out_len])
    if len(out) < out_len:
        raise NotImplementedError("malformed TIFF: truncated LZW stream")
    return bytes(out[:out_len])


def _tiff_lzw_encode(src: bytes) -> bytes:
    """Writer-side twin of ``_tiff_lzw_decode`` (same early-change
    convention), dict-based; emits Clear at start and on table reset."""
    CLEAR, EOI = 256, 257
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits.append((CLEAR, width))
    cur = b""
    for byte in src:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out_bits.append((table[cur], width))
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            # early change: the decoder bumps one code earlier than
            # classic LZW, so the encoder must too
            width += 1
        elif next_code == 4094:
            out_bits.append((CLEAR, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        out_bits.append((table[cur], width))
    out_bits.append((EOI, width))
    acc = nbits = 0
    out = bytearray()
    for code, w in out_bits:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _strip_decode(raw: bytes, compression: int, out_len: int) -> bytes:
    import zlib

    if compression == 1:
        if len(raw) < out_len:
            raise NotImplementedError("malformed TIFF: short uncompressed strip")
        return raw[:out_len]
    if compression == 32773:
        return _packbits_decode(raw, out_len)
    if compression == 5:
        return _tiff_lzw_decode(raw, out_len)
    if compression in (8, 32946):  # Deflate (new + old tag value)
        try:
            out = zlib.decompress(raw)
        except Exception as exc:  # noqa: BLE001
            raise NotImplementedError(f"malformed TIFF: bad deflate strip: {exc}") from exc
        if len(out) < out_len:
            raise NotImplementedError("malformed TIFF: deflate strip underrun")
        return out[:out_len]
    raise NotImplementedError(f"TIFF compression {compression}: unsupported")


def _tiff_entries(data: bytes, endian: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise NotImplementedError("malformed TIFF: IFD offset out of range")
    (n,) = struct.unpack(endian + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(endian + "HH", data[e : e + 4])
        (count,) = struct.unpack(endian + "I", data[e + 4 : e + 8])
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: skippable per the spec
        total = size * count
        if total <= 4:
            raw = data[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(endian + "I", data[e + 8 : e + 12])
            raw = data[off : off + total]
            if len(raw) != total:
                raise NotImplementedError("malformed TIFF: value offset out of range")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # ASCII/RATIONAL not needed for baseline decode
        tags[tag] = list(struct.unpack(endian + fmt * count, raw))
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline uncompressed TIFF -> (h, w, nc) uint8 (nc 1 or 3).
    Malformed payloads raise the one declared NotImplementedError."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise NotImplementedError("malformed TIFF: bad byte-order header")
    try:
        t = _tiff_entries(data, endian)
    except NotImplementedError:
        raise
    except Exception as exc:  # noqa: BLE001 — truncated/corrupt IFD
        raise NotImplementedError(f"malformed TIFF: {exc}") from exc
    try:
        w, h = t[256][0], t[257][0]
        offsets, counts = t[273], t[279]
    except KeyError as exc:
        raise NotImplementedError(f"malformed TIFF: missing required tag {exc}") from exc
    compression = t.get(259, [1])[0]
    bits = t.get(258, [1])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits}: unsupported")
    nc = t.get(277, [len(bits)])[0]
    photometric = t.get(262, [1])[0]
    predictor = t.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}: unsupported")
    if (photometric, nc) not in ((2, 3), (1, 1), (0, 1)):
        raise NotImplementedError(
            f"TIFF photometric {photometric} with {nc} samples: unsupported"
        )
    if len(offsets) != len(counts):
        raise NotImplementedError("malformed TIFF: strip offset/count mismatch")
    rps = t.get(278, [h])[0] or h
    parts = []
    for i, (o, c) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - i * rps)
        if n_rows <= 0:
            raise NotImplementedError("malformed TIFF: more strips than rows")
        parts.append(_strip_decode(data[o : o + c], compression, n_rows * w * nc))
    raw = b"".join(parts)
    if len(raw) != w * h * nc:
        raise NotImplementedError("malformed TIFF: strip data size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
    if predictor == 2:  # horizontal differencing: undo by cumsum along x
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype(np.uint8)
    if photometric == 0:  # WhiteIsZero: invert to BlackIsZero convention
        arr = 255 - arr
    return np.ascontiguousarray(arr)


def encode_tiff(px: np.ndarray, big_endian: bool = False, rows_per_strip: int | None = None,
                compression: int = 1, predictor: int = 1) -> bytes:
    """(h, w, nc) uint8 -> baseline TIFF (nc 1 or 3), in either byte
    order, optionally split into multiple strips so the decoder's
    strip-reassembly path is exercised. ``compression``: 1 none,
    32773 PackBits (per-row packets per the TIFF convention), 8
    Deflate, 5 LZW; ``predictor`` 2 applies horizontal differencing
    before the compressor (the pairing real writers use)."""
    import zlib

    h, w, nc = px.shape
    endian = ">" if big_endian else "<"
    rps = rows_per_strip or h
    if predictor == 2:
        d = px.astype(np.int64)
        d[:, 1:] -= px[:, :-1].astype(np.int64)
        px = (d & 0xFF).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}: unsupported")

    def pack_strip(sub: np.ndarray) -> bytes:
        raw = sub.tobytes()
        if compression == 1:
            return raw
        if compression == 32773:
            row_len = w * nc
            return b"".join(
                _packbits_encode(raw[i : i + row_len]) for i in range(0, len(raw), row_len)
            )
        if compression == 8:
            return zlib.compress(raw)
        if compression == 5:
            return _tiff_lzw_encode(raw)
        raise NotImplementedError(f"TIFF compression {compression}: unsupported")

    strips = [pack_strip(px[y : y + rps]) for y in range(0, h, rps)]
    n_strips = len(strips)
    # IFD entries: Width, Height, BitsPerSample, Compression,
    # Photometric, StripOffsets, SamplesPerPixel, RowsPerStrip,
    # StripByteCounts (+ Predictor when differencing). Layout:
    # header(8) + IFD + out-of-line value area + strip data.
    n = 9 + (1 if predictor == 2 else 0)
    extra_off = 8 + 2 + 12 * n + 4
    extra = bytearray()

    def alloc(fmt: str, values: list[int]) -> int:
        off = extra_off + len(extra)
        extra.extend(struct.pack(endian + fmt * len(values), *values))
        return off

    entries: list[tuple[int, int, int, int]] = [  # (tag, type, count, value)
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, nc, 8) if nc == 1 else (258, 3, nc, alloc("H", [8] * nc)),
        (259, 3, 1, compression),
        (262, 3, 1, 2 if nc == 3 else 1),
        (277, 3, 1, nc),
        (278, 3, 1, rps),
    ]
    if predictor == 2:
        entries.append((317, 3, 1, 2))
    if n_strips == 1:
        data_start = extra_off + len(extra)
        entries.append((273, 4, 1, data_start))
        entries.append((279, 4, 1, len(strips[0])))
    else:
        offs_off = extra_off + len(extra) + 0
        data_start = offs_off + 8 * n_strips
        offs, pos = [], data_start
        for s in strips:
            offs.append(pos)
            pos += len(s)
        alloc("I", offs)
        cnts_off = alloc("I", [len(s) for s in strips])
        entries.append((273, 4, n_strips, offs_off))
        entries.append((279, 4, n_strips, cnts_off))
    entries.sort()  # IFD entries must be tag-ascending per the spec
    ifd = struct.pack(endian + "H", n)
    for tag, typ, count, val in entries:
        if _TIFF_TYPE_SIZE[typ] * count <= 4:
            packed = struct.pack(endian + {3: "H", 4: "I"}[typ], val)
            packed += b"\x00" * (4 - len(packed))
        else:
            packed = struct.pack(endian + "I", val)  # out-of-line offset
        ifd += struct.pack(endian + "HHI", tag, typ, count) + packed
    ifd += struct.pack(endian + "I", 0)  # next-IFD terminator
    hdr = b"MM\x00*" if big_endian else b"II*\x00"
    return hdr + struct.pack(endian + "I", 8) + ifd[: 2 + 12 * n + 4] + bytes(extra) + b"".join(strips)
