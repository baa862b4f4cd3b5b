"""Independent scalar twin decoders for the real-media KAT oracles.

Pure-Python, per-pixel/per-sample re-implementations of the PUBLIC
specs — PNG (RFC 2083 / W3C), JPEG (ITU T.81), WAV (RIFF/PCM +
ITU-T G.711 mu-law/A-law), GIF87a/89a (LZW + animation compositing) —
structurally disjoint from the vectorized production kernels
(convert_spark/operators/multimodal.py, convert_spark/kernels/jpeg.py):

* PNG here unfilters byte-by-byte in plain lists, unpacks sub-byte
  samples with integer shifts, walks Adam7 passes scalar; production is
  numpy cumsum/unpackbits/scatter.
* JPEG here reads the entropy stream bit-by-bit with an index/bit
  cursor, stores blocks as plain 64-lists and evaluates the IDCT with
  explicit u/v loops; production is a 32-bit accumulator reader and
  batched matrix IDCT.
* WAV here parses the RIFF chunk list manually and expands G.711
  codes one byte at a time with scalar if/else arithmetic; production
  uses the stdlib ``wave`` module for PCM and a vectorized 256-entry
  numpy lookup table for G.711.

The twin covers exactly the payload corpus convert_spark.mediagen
emits (all ten PNG IHDR shapes; sequential JPEG plus progressive JPEG
with both spectral selection and successive approximation; Adobe
CMYK/YCCK 4-component JPEG; 12-bit extended-sequential JPEG (16-bit
DQT, level shift 2048); lossless SOF3 JPEG (scalar per-pixel predictor
recurrence vs production's row cumsum); 8/16-bit PCM WAV; G.711 mu-law/A-law
WAV; static and ANIMATED GIF — per-bit LZW cursor, per-pixel
transparency/disposal compositing; BMP and baseline TIFF via scalar
per-pixel reads; AVI video — byte-cursor RIFF walk with MJPG frames
through this module's own scalar JPEG decoder and DIB frames via
per-pixel row loops; IMA and Microsoft ADPCM WAV — per-sample if/else
step/coefficient recurrences vs production's numpy block-lockstep
decode; compressed TIFF — scalar PackBits/LZW expanders and a
per-pixel predictor undo; FLAC — a per-bit cursor with table-free
bitwise CRCs and explicit per-sample predictor loops vs production's
accumulator reader and numpy reconstruction). Everything else raises
ValueError — the KAT builder should never hit it.

Float-parity note (JPEG): both sides compute the IDCT and YCbCr
transform in float64 from the same published constants and round
half-to-even; summation-order ulp differences could in principle flip
a pixel sitting exactly on a rounding boundary, but the payload corpus
is deterministic, and tests/test_kat_cross_sf.py proves agreement on
every payload at all three scale factors — a one-time check, not a
flaky one.
"""

from __future__ import annotations

import math
import struct
import zlib

# ---------------------------------------------------------------- PNG ---

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        yield typ, data[pos + 8 : pos + 8 + ln]
        if typ == b"IEND":
            return
        pos += 12 + ln


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, off: int, n_rows: int, stride: int, bpp: int):
    """Scalar PNG unfilter: returns (rows as lists of ints, bytes used)."""
    rows = []
    prev = [0] * stride
    p = off
    for _ in range(n_rows):
        if p + 1 + stride > len(raw):
            raise ValueError("png: truncated image data")
        ftype = raw[p]
        cur = []
        for i in range(stride):
            x = raw[p + 1 + i]
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = (x + a) & 0xFF
            elif ftype == 2:
                v = (x + b) & 0xFF
            elif ftype == 3:
                v = (x + (a + b) // 2) & 0xFF
            elif ftype == 4:
                v = (x + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"png: filter {ftype}")
            cur.append(v)
        rows.append(cur)
        prev = cur
        p += 1 + stride
    return rows, p - off


def _rows_to_samples(rows, width: int, bit_depth: int, channels: int):
    """Byte rows -> per-pixel sample tuples (ints, native bit depth)."""
    out = []
    for row in rows:
        pix = []
        if bit_depth < 8:
            per_byte = 8 // bit_depth
            mask = (1 << bit_depth) - 1
            for x in range(width):
                byte = row[x // per_byte]
                shift = 8 - bit_depth * (x % per_byte + 1)
                pix.append(((byte >> shift) & mask,))
        elif bit_depth == 8:
            for x in range(width):
                pix.append(tuple(row[x * channels + c] for c in range(channels)))
        else:  # 16
            for x in range(width):
                base = x * channels * 2
                pix.append(
                    tuple(
                        (row[base + 2 * c] << 8) | row[base + 2 * c + 1]
                        for c in range(channels)
                    )
                )
        out.append(pix)
    return out


def png_pixels(data: bytes):
    """Decode a PNG to (pixels, bit_depth) where pixels is a list of
    rows of per-channel int tuples (palette expanded to RGB, sub-byte
    grayscale scaled to 8-bit — mirroring the engine's output contract,
    which is part of the schema, not of the algorithm under test)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("png: bad magic")
    ihdr = None
    plte = None
    idat = bytearray()
    for typ, body in _png_chunks(data):
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat += body
    if ihdr is None:
        raise ValueError("png: no IHDR")
    w, h = struct.unpack(">II", ihdr[0:8])
    bit_depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    channels = _PNG_NCH[color_type]
    raw = zlib.decompress(bytes(idat))

    def stride_of(width: int) -> tuple[int, int]:
        if bit_depth < 8:
            return (width * bit_depth + 7) // 8, 1
        return width * channels * (bit_depth // 8), channels * (bit_depth // 8)

    if interlace == 0:
        stride, bpp = stride_of(w)
        rows, used = _unfilter(raw, 0, h, stride, bpp)
        if used != len(raw):
            raise ValueError("png: trailing image data")
        grid = _rows_to_samples(rows, w, bit_depth, channels)
    elif interlace == 1:
        grid = [[None] * w for _ in range(h)]
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride, bpp = stride_of(pw)
            rows, used = _unfilter(raw, off, ph, stride, bpp)
            off += used
            sub = _rows_to_samples(rows, pw, bit_depth, channels)
            for j in range(ph):
                for i in range(pw):
                    grid[y0 + j * dy][x0 + i * dx] = sub[j][i]
        if off != len(raw):
            raise ValueError("png: adam7 size mismatch")
    else:
        raise ValueError("png: interlace method")

    if color_type == 3:
        if plte is None:
            raise ValueError("png: palette without PLTE")
        table = [tuple(plte[i : i + 3]) for i in range(0, len(plte), 3)]
        grid = [[table[px[0]] for px in row] for row in grid]
        return grid, 8
    if bit_depth < 8:
        hi = (1 << bit_depth) - 1
        grid = [[((px[0] * 255) // hi,) for px in row] for row in grid]
        return grid, 8
    return grid, bit_depth


def png_header(data: bytes):
    if data[:8] != _PNG_MAGIC or data[12:16] != b"IHDR":
        raise ValueError("png: bad header")
    w, h = struct.unpack(">II", data[16:24])
    return "png", w, h, _PNG_NCH[data[25]]


# --------------------------------------------------------------- JPEG ---

_ZZ = [  # zigzag index -> (row, col), from the published order
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

_COS = [
    [
        (math.sqrt(0.125) if u == 0 else 0.5) * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


class _JBits:
    """Bit cursor over the entropy stream: index + bit offset, 0xFF00
    unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.b = 0

    def _cur(self) -> int:
        if self.p >= len(self.d):
            raise ValueError("jpeg: entropy exhausted")
        v = self.d[self.p]
        if v == 0xFF:
            nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
            if nxt != 0x00:
                raise ValueError("jpeg: marker inside entropy read")
        return v

    def bit(self) -> int:
        v = (self._cur() >> (7 - self.b)) & 1
        self.b += 1
        if self.b == 8:
            self.b = 0
            self.p += 2 if self.d[self.p] == 0xFF else 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        """Skip pad bits + find the next marker byte pair."""
        if self.b:
            self.b = 0
            self.p += 2 if self.d[self.p] == 0xFF else 1
        while self.p + 1 < len(self.d):
            if self.d[self.p] == 0xFF and self.d[self.p + 1] != 0x00:
                return
            self.p += 1
        self.p = len(self.d)

    def take_rst(self) -> None:
        self.align_to_marker()
        if not (self.p + 1 < len(self.d) and 0xD0 <= self.d[self.p + 1] <= 0xD7):
            raise ValueError("jpeg: expected RST")
        self.p += 2


def _huff_dict(counts, symbols):
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_sym(bits: _JBits, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.bit()
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("jpeg: bad huffman code")


def _ext(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_pixels(data: bytes):
    """Scalar JPEG decode -> list rows of channel tuples (uint8 range).
    Sequential (interleaved or per-component scans) + progressive with
    BOTH spectral selection AND successive approximation (refine_block
    implements the SA refinement passes; mediagen format class 13 emits
    SA-progressive payloads with sa_levels=1 that this twin decodes for
    the KAT oracle). Arithmetic coding raises ValueError (not in the
    mediagen corpus)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: no SOI")
    qts = {}
    huffs = {}
    frame = None
    coeffs = None
    restart = 0
    adobe = None
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: desync")
        m = data[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if m == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                tab = [[0] * 8 for _ in range(8)]
                for k in range(64):
                    r, c = _ZZ[k]
                    if pq:  # 16-bit entries (12-bit precision files)
                        tab[r][c] = (body[b + 1 + 2 * k] << 8) | body[b + 2 + 2 * k]
                    else:
                        tab[r][c] = body[b + 1 + k]
                qts[tq] = tab
                b += 129 if pq else 65
        elif m == 0xC4:
            b = 0
            while b < len(body):
                tcth = body[b]
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                huffs[(tcth >> 4, tcth & 0x0F)] = _huff_dict(
                    counts, list(body[b + 17 : b + 17 + n])
                )
                b += 17 + n
        elif m in (0xC0, 0xC1, 0xC2, 0xC3):
            prec = body[0]
            if m != 0xC3 and prec not in (8, 12):
                raise ValueError("jpeg: precision")
            h, w = struct.unpack(">HH", body[1:5])
            comps = []
            for i in range(body[5]):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0x0F, "tq": tq}
                )
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mx = (w + 8 * hmax - 1) // (8 * hmax)
            my = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                cw = (w * c["hs"] + hmax - 1) // hmax
                chh = (h * c["vs"] + vmax - 1) // vmax
                c["nbx"] = (cw + 7) // 8
                c["nby"] = (chh + 7) // 8
            frame = {
                "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mx": mx, "my": my, "prog": m == 0xC2, "prec": prec,
                "lossless": m == 0xC3,
            }
            if frame["lossless"]:
                # reconstructed sample grids, scalar recurrence per pixel
                coeffs = [[[0] * w for _ in range(h)] for _ in comps]
            else:
                coeffs = [{} for _ in comps]  # (by,bx) -> zigzag list[64]
        elif m == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif m == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe = body[11]  # APP14 color transform
        elif m == 0xDA:
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            sel = []
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(j for j, c in enumerate(frame["comps"]) if c["id"] == cid)
                sel.append((ci, tt >> 4, tt & 0x0F))
            ss, se, aa = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if frame.get("lossless"):
                pos = _jscan_lossless(data, pos + 2 + ln, frame, sel, ss,
                                      aa & 0x0F, huffs, restart, coeffs)
            else:
                pos = _jscan(data, pos + 2 + ln, frame, sel, ss, se, aa >> 4, aa & 0x0F,
                             huffs, restart, coeffs)
            continue
        elif m in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: unsupported SOF")
        pos += 2 + ln
    if frame is None or coeffs is None:
        raise ValueError("jpeg: no frame")
    if frame.get("lossless"):
        maxmask = (1 << 16) - 1
        shift = frame.get("pt", 0)
        rows = []
        for y in range(frame["h"]):
            row = []
            for x in range(frame["w"]):
                row.append(tuple((g[y][x] << shift) & maxmask for g in coeffs))
            rows.append(row)
        return rows
    return _jfinish(frame, coeffs, qts, adobe)


def _jscan_lossless(data, pos, frame, sel, predictor, pt, huffs, restart, grids) -> int:
    """Scalar T.81 lossless scan: per-sample huffman diff + predictor
    recurrence computed pixel by pixel (production reconstructs whole
    rows with cumsum for the affine predictors — structurally
    disjoint). Modulo-2^16 applied at EVERY step, the literal spec
    recurrence."""
    if restart:
        raise ValueError("jpeg lossless: restart")
    bits = _JBits(data, pos)
    w, h = frame["w"], frame["h"]
    default = 1 << (frame["prec"] - pt - 1)
    tabs = [huffs[(0, td)] for _, td, _ in sel]
    for y in range(h):
        for x in range(w):
            for si, (ci, _, _) in enumerate(sel):
                t = _read_sym(bits, tabs[si])
                if t == 16:
                    d = 32768
                elif t:
                    d = _ext(bits.bits(t), t)
                else:
                    d = 0
                g = grids[ci]
                if y == 0 and x == 0:
                    p = default
                elif y == 0:
                    p = g[0][x - 1]
                elif x == 0:
                    p = g[y - 1][0]
                else:
                    ra, rb, rc = g[y][x - 1], g[y - 1][x], g[y - 1][x - 1]
                    if predictor == 1:
                        p = ra
                    elif predictor == 2:
                        p = rb
                    elif predictor == 3:
                        p = rc
                    elif predictor == 4:
                        p = ra + rb - rc
                    elif predictor == 5:
                        p = ra + ((rb - rc) >> 1)
                    elif predictor == 6:
                        p = rb + ((ra - rc) >> 1)
                    elif predictor == 7:
                        p = (ra + rb) >> 1
                    else:
                        raise ValueError("jpeg lossless: predictor")
                g[y][x] = (p + d) & 0xFFFF
    frame["pt"] = pt
    bits.align_to_marker()
    return bits.p


def _block(coeffs, ci, by, bx):
    key = (by, bx)
    if key not in coeffs[ci]:
        coeffs[ci][key] = [0] * 64
    return coeffs[ci][key]


def _jscan(data, pos, frame, sel, ss, se, ah, al, huffs, restart, coeffs) -> int:
    prog = frame["prog"]
    if not prog:
        ss, se, ah, al = 0, 63, 0, 0
    bits = _JBits(data, pos)
    preds = {ci: 0 for ci, _, _ in sel}
    eobrun = [0]

    def refine_block(ta, zz):
        """Progressive AC successive-approximation refinement (scalar
        re-derivation of T.81 G.1.2.3.2, independent of the kernel)."""
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        actab = huffs[(1, ta)]
        if eobrun[0] == 0:
            while k <= se:
                sym = _read_sym(bits, actab)
                r, s = sym >> 4, sym & 0x0F
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun[0] = 1 << r  # inclusive of this block
                        if r:
                            eobrun[0] += bits.bits(r)
                        break
                else:
                    if s != 1:
                        raise ValueError("jpeg: refinement magnitude")
                    val = p1 if bits.bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        if bits.bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            if val:
                                zz[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun[0] > 0:
            while k <= se:
                if zz[k] != 0 and bits.bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun[0] -= 1

    def one_block(ci, td, ta, zz):
        if prog and ah != 0:  # refinement scans
            if ss == 0:
                if bits.bit():
                    zz[0] |= 1 << al
                return
            refine_block(ta, zz)
            return
        if ss == 0:  # DC (plus full band when sequential)
            t = _read_sym(bits, huffs[(0, td)])
            diff = _ext(bits.bits(t), t) if t else 0
            preds[ci] += diff
            zz[0] = preds[ci] << al
        if se == 0:
            return
        if prog and eobrun[0] > 0:
            eobrun[0] -= 1
            return
        k = max(ss, 1)
        actab = huffs[(1, ta)]
        while k <= se:
            sym = _read_sym(bits, actab)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                if prog:
                    eobrun[0] = (1 << r) - 1
                    if r:
                        eobrun[0] += bits.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("jpeg: band overflow")
            zz[k] = _ext(bits.bits(s), s) << al
            k += 1

    if len(sel) > 1:
        units = frame["mx"] * frame["my"]
    else:
        c = frame["comps"][sel[0][0]]
        units = c["nbx"] * c["nby"]
    for u in range(units):
        if restart and u and u % restart == 0:
            bits.take_rst()
            for ci in preds:
                preds[ci] = 0
            eobrun[0] = 0
        if len(sel) > 1:
            my, mx = divmod(u, frame["mx"])
            for ci, td, ta in sel:
                c = frame["comps"][ci]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        one_block(ci, td, ta,
                                  _block(coeffs, ci, my * c["vs"] + by, mx * c["hs"] + bx))
        else:
            ci, td, ta = sel[0]
            c = frame["comps"][ci]
            by, bx = divmod(u, c["nbx"])
            one_block(ci, td, ta, _block(coeffs, ci, by, bx))
    bits.align_to_marker()
    return bits.p


def _jfinish(frame, coeffs, qts, adobe=None):
    w, h = frame["w"], frame["h"]
    level = float(1 << (frame["prec"] - 1))
    maxv = (1 << frame["prec"]) - 1
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        q = qts[comp["tq"]]
        blocks = {}
        for (by, bx), zz in coeffs[ci].items():
            nat = [[0.0] * 8 for _ in range(8)]
            for k in range(64):
                r, c = _ZZ[k]
                nat[r][c] = float(zz[k] * q[r][c])
            # two-stage IDCT mirroring the production association order:
            # tmp[x][v] = sum_u COS[u][x] * nat[u][v]; px = tmp @ COS
            tmp = [
                [sum(_COS[u][x] * nat[u][v] for u in range(8)) for v in range(8)]
                for x in range(8)
            ]
            px = [
                [sum(tmp[x][v] * _COS[v][y] for v in range(8)) + level for y in range(8)]
                for x in range(8)
            ]
            blocks[(by, bx)] = px
        planes.append(blocks)
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            samples = []
            for ci, comp in enumerate(frame["comps"]):
                ry = frame["vmax"] // comp["vs"]
                rx = frame["hmax"] // comp["hs"]
                py, pxx = y // ry, x // rx
                blk = planes[ci].get((py // 8, pxx // 8))
                v = level if blk is None else blk[py % 8][pxx % 8]
                samples.append(v)
            row.append(tuple(samples))
        rows.append(row)

    def to8(v: float) -> int:
        r = round(v)  # round-half-even, same as np.rint
        return 0 if r < 0 else (maxv if r > maxv else int(r))

    ncomp = len(frame["comps"])
    if ncomp == 1:
        return [[(to8(px[0]),) for px in row] for row in rows]
    if ncomp == 4:
        # Adobe CMYK family: transform=2 is YCCK (YCbCr of the INVERTED
        # C,M,Y; K passes through); transform=0 stores inverted ink;
        # output true ink amounts — independently per Adobe TN #5116
        out = []
        for row in rows:
            orow = []
            for s0, s1, s2, s3 in row:
                if adobe == 2:
                    cb, cr = s1 - level, s2 - level
                    orow.append((
                        maxv - to8(s0 + 1.402 * cr),
                        maxv - to8(s0 - 0.344136 * cb - 0.714136 * cr),
                        maxv - to8(s0 + 1.772 * cb),
                        maxv - to8(s3),
                    ))
                elif adobe == 0:
                    orow.append((maxv - to8(s0), maxv - to8(s1), maxv - to8(s2), maxv - to8(s3)))
                elif adobe is None:
                    orow.append((to8(s0), to8(s1), to8(s2), to8(s3)))
                else:
                    raise ValueError("jpeg: bad adobe transform for CMYK")
            out.append(orow)
        return out
    if ncomp != 3:
        raise ValueError("jpeg: component count")
    out = []
    for row in rows:
        orow = []
        for y, cb, cr in row:
            cb -= level
            cr -= level
            orow.append(
                (
                    to8(y + 1.402 * cr),
                    to8(y - 0.344136 * cb - 0.714136 * cr),
                    to8(y + 1.772 * cb),
                )
            )
        out.append(orow)
    return out


def jpeg_header(data: bytes):
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        m = data[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            pos += 2
            continue
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return "jpeg", w, h, data[pos + 9]
        pos += 2 + ln
    raise ValueError("jpeg: no SOF")


# ---------------------------------------------------------------- WAV ---


def wav_parse(data: bytes):
    """Manual RIFF walk (no stdlib wave): returns (n_channels,
    samp_width, rate, frames, pcm_bytes, audio_fmt). Accepts PCM
    (fmt 1) and G.711 mu-law/A-law (fmt 7/6, one byte per sample)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF header")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, nch, rate = struct.unpack("<HHI", fmt[0:8])
    bits_per = struct.unpack("<H", fmt[14:16])[0]
    if audio_fmt not in (1, 6, 7):
        raise ValueError("wav: unsupported audio format")
    sw = bits_per // 8
    frames = len(pcm) // (nch * sw)
    return nch, sw, rate, frames, pcm, audio_fmt


def g711_expand(code: int, audio_fmt: int) -> int:
    """One G.711 code byte -> linear int16, scalar if/else arithmetic
    straight from ITU-T G.711 (deliberately not the production numpy
    table build). Mu-law (fmt 7): complement, biased-mantissa segment
    shift; A-law (fmt 6): XOR 0x55, segments 0/1 special-cased, and a
    SET sign bit (0x80) means POSITIVE."""
    if audio_fmt == 7:
        u = ~code & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def wav_header(data: bytes):
    nch, _, rate, frames, _, _ = wav_parse(data)
    return "wav", frames, rate, nch


def wav_frame_windows(data: bytes, n_frames: int):
    """sha256[:16] of each of ``n_frames`` fixed-stride PCM windows
    (split on frame boundaries, window i covering sample frames
    [i*n/n_frames, (i+1)*n/n_frames)) — the twin of the engine's
    frames_real, with the PCM bytes recovered by the manual RIFF walk.
    G.711 windows hash the DECODED little-endian int16 stream (sample
    content, not wire bytes), mirroring the engine's convention."""
    import hashlib

    nch, sw, _, n, pcm, audio_fmt = wav_parse(data)
    if audio_fmt in (6, 7):
        pcm = b"".join(struct.pack("<h", g711_expand(b, audio_fmt)) for b in pcm)
        sw = 2
    fb = nch * sw
    bounds = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        hashlib.sha256(pcm[bounds[i] * fb : bounds[i + 1] * fb]).hexdigest()[:16]
        for i in range(n_frames)
    ]


def wav_samples(data: bytes):
    """Per-channel raw integer sample lists (int16 signed / uint8;
    G.711 expanded per byte to linear int16)."""
    nch, sw, _, frames, pcm, audio_fmt = wav_parse(data)
    chans = [[] for _ in range(nch)]
    for f in range(frames):
        for c in range(nch):
            off = (f * nch + c) * sw
            if audio_fmt in (6, 7):
                v = g711_expand(pcm[off], audio_fmt)
            elif sw == 2:
                (v,) = struct.unpack_from("<h", pcm, off)
            elif sw == 1:
                v = pcm[off]
            else:
                raise ValueError("wav: sample width")
            chans[c].append(v)
    return chans


# ----------------------------------------------------- twin interfaces ---


def header(data: bytes):
    """(kind, width, height, n_channels) — mirrors the engine's
    decode_real schema mapping (WAV: width=frames, height=rate)."""
    if data[:8] == _PNG_MAGIC:
        return png_header(data)
    if data[:3] == b"\xff\xd8\xff":
        return jpeg_header(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return avi_header(data)
    if data[:4] == b"fLaC":
        return flac_header(data)
    if data[:4] == b"RIFF":
        tag = wav_fmt_tag(data)
        if tag == 0x11:
            return adpcm_header(data)
        if tag == 0x02:
            return ms_adpcm_header(data)
        return wav_header(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_header(data)
    if data[:2] == b"BM":
        return bmp_header(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return tiff_header(data)
    raise ValueError("unknown payload format")


def channel_stats(data: bytes):
    """Per-channel (n, sum, min, max) over raw integer samples: PNG
    pixels at native depth (palette expanded, sub-byte scaled to 8-bit),
    JPEG uint8 pixels, WAV int16/uint8 PCM samples."""
    if data[:8] == _PNG_MAGIC:
        grid, _ = png_pixels(data)
        nch = len(grid[0][0])
        chans = [[px[c] for row in grid for px in row] for c in range(nch)]
        kind = "png"
    elif data[:3] == b"\xff\xd8\xff":
        grid = jpeg_pixels(data)
        nch = len(grid[0][0])
        chans = [[px[c] for row in grid for px in row] for c in range(nch)]
        kind = "jpeg"
    elif data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return avi_channel_stats(data)
    elif data[:4] == b"fLaC":
        return flac_channel_stats(data)
    elif data[:4] == b"RIFF":
        tag = wav_fmt_tag(data)
        if tag == 0x11:
            chans = adpcm_samples(data)[0]
        elif tag == 0x02:
            chans = ms_adpcm_samples(data)[0]
        else:
            chans = wav_samples(data)
        kind = "wav"
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_channel_stats(data)
    elif data[:2] == b"BM" or data[:4] in (b"II*\x00", b"MM\x00*"):
        grid = bmp_pixels(data) if data[:2] == b"BM" else tiff_pixels(data)
        nch = len(grid[0][0])
        chans = [[px[c] for row in grid for px in row] for c in range(nch)]
        kind = "bmp" if data[:2] == b"BM" else "tiff"
    else:
        raise ValueError("unknown payload format")
    return kind, [
        (len(ch), sum(ch), min(ch), max(ch)) for ch in chans
    ]


# --- GIF (CompuServe GIF89a spec) ----------------------------------------------
#
# Scalar twin of convert_spark/kernels/gif.py, deliberately disjoint in
# structure: a one-bit-at-a-time LSB cursor (production accumulates
# whole bytes), an LZW dictionary of per-code INT LISTS (production
# concatenates bytes objects), explicit per-pixel compositing loops
# (production uses numpy fancy indexing / slice assignment), and
# interlace resolved by walking the four passes row by row (production
# applies one precomputed row permutation).


class _GifBits:
    """LSB-first bit cursor over the concatenated LZW sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("gif: LZW bit stream exhausted")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v


def gif_lzw(mcs: int, data: bytes, n_px: int):
    """GIF LZW decode to a flat list of ``n_px`` palette indices."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bits = _GifBits(data)
    table = [[i] for i in range(clear)] + [[], []]
    width = mcs + 1
    out: list[int] = []
    prev = None
    while len(out) < n_px:
        code = bits.read(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = list(table[code])
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("gif: LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_px:
        raise ValueError("gif: LZW stream short")
    return out[:n_px]


def _gif_subblocks(data: bytes, pos: int):
    parts = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(parts), pos
        parts += data[pos : pos + n]
        pos += n


def gif_parse(data: bytes):
    """Scalar container walk -> (width, height, bg_rgb, frames), each
    frame a dict of x/y/w/h, palette (list of (r, g, b)), indices (flat
    row-major list, deinterlaced), delay_cs, transparent, disposal."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg_idx = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else (0, 0, 0)
    frames = []
    delay, transparent, disposal = 0, None, 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            body, pos = _gif_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                disposal = (body[0] >> 2) & 7
                delay = body[1] | (body[2] << 8)
                transparent = body[3] if body[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block {block}")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        fpacked = data[pos + 8]
        pos += 9
        palette = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        if palette is None:
            raise ValueError("gif: no color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _gif_subblocks(data, pos)
        flat = gif_lzw(mcs, lzw, fw * fh)
        if fpacked & 0x40:  # interlaced: walk the four passes
            rows = []
            for y0, dy in ((0, 8), (4, 8), (2, 4), (1, 2)):
                y = y0
                while y < fh:
                    rows.append(y)
                    y += dy
            grid = [[0] * fw for _ in range(fh)]
            for stored, disp_row in enumerate(rows):
                for x in range(fw):
                    grid[disp_row][x] = flat[stored * fw + x]
            flat = [v for row in grid for v in row]
        frames.append(
            {"x": fx, "y": fy, "w": fw, "h": fh, "palette": palette,
             "indices": flat, "delay_cs": delay, "transparent": transparent,
             "disposal": disposal}
        )
        delay, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("gif: no frames")
    return w, h, bg_rgb, frames


def gif_compose(data: bytes):
    """Presented frame sequence: list of row-major [[(r,g,b)...]...]
    canvases (transparency + disposal 0-3 per the documented shared
    conventions)."""
    w, h, bg, frames = gif_parse(data)
    canvas = [[bg for _ in range(w)] for _ in range(h)]
    out = []
    for fr in frames:
        saved = [row[:] for row in canvas] if fr["disposal"] == 3 else None
        for yy in range(fr["h"]):
            for xx in range(fr["w"]):
                idx = fr["indices"][yy * fr["w"] + xx]
                if fr["transparent"] is not None and idx == fr["transparent"]:
                    continue
                if idx >= len(fr["palette"]):
                    raise ValueError("gif: index outside palette")
                canvas[fr["y"] + yy][fr["x"] + xx] = fr["palette"][idx]
        out.append([row[:] for row in canvas])
        if fr["disposal"] == 2:
            for yy in range(fr["h"]):
                for xx in range(fr["w"]):
                    canvas[fr["y"] + yy][fr["x"] + xx] = bg
        elif fr["disposal"] == 3:
            canvas = saved
    return out


def gif_header(data: bytes):
    w, h, _, frames = gif_parse(data)
    return "gif", w, h, len(frames)


def gif_channel_stats(data: bytes):
    first = gif_compose(data)[0]
    chans = [[px[c] for row in first for px in row] for c in range(3)]
    return "gif", [(len(ch), sum(ch), min(ch), max(ch)) for ch in chans]


def gif_frame_hashes(data: bytes, n_frames: int):
    """sha256[:16] per sampled frame: frame i*F//n_frames of the
    composited sequence, hashed over its row-major RGB bytes — the twin
    of the engine's video-style GIF branch in frames_real."""
    import hashlib

    frames = gif_compose(data)
    out = []
    for i in range(n_frames):
        f = frames[i * len(frames) // n_frames]
        raw = bytes(v for row in f for px in row for v in px)
        out.append(hashlib.sha256(raw).hexdigest()[:16])
    return out


# --- BMP / baseline TIFF (pure-layout rasters) ----------------------------------
#
# Scalar twins of convert_spark/kernels/rasters.py: per-pixel struct
# reads and explicit row loops (production is numpy frombuffer/reshape).


def bmp_pixels(data: bytes):
    """BMP -> row-major [[(r,g,b)...]...], per-pixel byte reads."""
    if data[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError("bmp: core header")
    w, h_raw = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp != 0:
        raise ValueError("bmp: compressed")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (w * bpp // 8 + 3) & ~3
    pal = None
    if bpp == 8:
        (nc,) = struct.unpack("<I", data[46:50])
        nc = nc or 256
        po = 14 + hdr_size
        pal = [
            (data[po + 4 * i + 2], data[po + 4 * i + 1], data[po + 4 * i])
            for i in range(nc)
        ]
    elif bpp != 24:
        raise ValueError("bmp: depth")
    rows = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        base = pix_off + src_y * stride
        row = []
        for x in range(w):
            if pal is not None:
                row.append(pal[data[base + x]])
            else:
                b3 = base + 3 * x
                row.append((data[b3 + 2], data[b3 + 1], data[b3]))
        rows.append(row)
    return rows


def _tiff_packbits_s(src: bytes, out_len: int):
    """Scalar PackBits expansion (TIFF 6.0 §9)."""
    out = []
    i = 0
    while i < len(src) and len(out) < out_len:
        n = src[i]
        i += 1
        if n < 128:
            out.extend(src[i : i + n + 1])
            i += n + 1
        elif n > 128:
            out.extend([src[i]] * (257 - n))
            i += 1
    if len(out) < out_len:
        raise ValueError("tiff: packbits underrun")
    return out[:out_len]


def _tiff_lzw_s(src: bytes, out_len: int):
    """Scalar TIFF LZW (spec §13): per-bit MSB-first cursor, string
    table as lists, early width change at table size 2^w - 2."""
    table = [[i] for i in range(256)] + [[], []]
    out = []
    width, acc, nbits = 9, 0, 0
    prev = None
    for byte in src:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:
                if len(out) < out_len:
                    raise ValueError("tiff: lzw underrun")
                return out[:out_len]
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("tiff: lzw code range")
            out.extend(entry)
            prev = entry
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= out_len:
                return out[:out_len]
    if len(out) < out_len:
        raise ValueError("tiff: lzw truncated")
    return out[:out_len]


def tiff_pixels(data: bytes):
    """Baseline TIFF -> row-major channel-tuple rows, scalar IFD walk
    and per-sample reads; Compression 1/5/8/32773 with the scalar
    PackBits/LZW expanders above (Deflate via zlib), horizontal
    Predictor undone per-pixel."""
    if data[:4] == b"II*\x00":
        e = "<"
    elif data[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("tiff: magic")
    (ifd,) = struct.unpack(e + "I", data[4:8])
    (n,) = struct.unpack(e + "H", data[ifd : ifd + 2])
    tags = {}
    for i in range(n):
        at = ifd + 2 + 12 * i
        tag, typ = struct.unpack(e + "HH", data[at : at + 4])
        (count,) = struct.unpack(e + "I", data[at + 4 : at + 8])
        sz = {1: 1, 3: 2, 4: 4}.get(typ)
        if sz is None:
            continue
        if sz * count <= 4:
            raw = data[at + 8 : at + 8 + sz * count]
        else:
            (off,) = struct.unpack(e + "I", data[at + 8 : at + 12])
            raw = data[off : off + sz * count]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack(e + fmt * count, raw))
    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    nc = tags.get(277, [1])[0]
    rps = tags.get(278, [h])[0] or h
    raw = []
    for i, (off, cnt) in enumerate(zip(tags[273], tags[279])):
        n_rows = min(rps, h - i * rps)
        strip = data[off : off + cnt]
        want = n_rows * w * nc
        if comp == 1:
            raw.extend(strip[:want])
        elif comp == 32773:
            raw.extend(_tiff_packbits_s(strip, want))
        elif comp == 5:
            raw.extend(_tiff_lzw_s(strip, want))
        elif comp in (8, 32946):
            raw.extend(zlib.decompress(strip)[:want])
        else:
            raise ValueError("tiff: compression")
    rows = []
    p = 0
    for _ in range(h):
        row = []
        for _x in range(w):
            row.append(tuple(raw[p + c] for c in range(nc)))
            p += nc
        rows.append(row)
    if tags.get(317, [1])[0] == 2:  # horizontal differencing, per pixel
        for row in rows:
            for x in range(1, len(row)):
                row[x] = tuple((row[x][c] + row[x - 1][c]) & 0xFF for c in range(nc))
    if tags.get(262, [1])[0] == 0:  # WhiteIsZero
        rows = [[tuple(255 - v for v in px) for px in row] for row in rows]
    return rows


def bmp_header(data: bytes):
    rows = bmp_pixels(data)
    return "bmp", len(rows[0]), len(rows), 3


def tiff_header(data: bytes):
    rows = tiff_pixels(data)
    return "tiff", len(rows[0]), len(rows), len(rows[0][0])

# --- AVI (Microsoft AVI RIFF form) ----------------------------------------------
#
# Scalar twin of convert_spark/kernels/avi.py: byte-cursor RIFF walk,
# per-pixel DIB row loops, MJPG frames through this module's own scalar
# JPEG decoder (jpeg_pixels) — deliberately no numpy.


def _avi_walk(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if pos + 8 + ln > end:
            raise ValueError("avi: chunk overruns parent")
        yield tag, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def _avi_dib_grid(body: bytes, w: int, h: int):
    stride = (w * 3 + 3) & ~3
    if len(body) < stride * h:
        raise ValueError("avi: truncated DIB frame")
    grid = []
    for y in range(h):
        row_off = (h - 1 - y) * stride  # bottom-up rows
        row = []
        for x in range(w):
            b, g, r = body[row_off + 3 * x : row_off + 3 * x + 3]
            row.append([r, g, b])
        grid.append(row)
    return grid


def avi_parse(data: bytes):
    """-> (w, h, n_frames, fps, frame grids as nested RGB lists)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF header")
    end = min(len(data), 8 + int.from_bytes(data[4:8], "little"))
    w = h = fps = n_frames = 0
    comp = None
    chunks = []
    for tag, s, ln in _avi_walk(data, 12, end):
        if tag != b"LIST":
            continue
        four = data[s : s + 4]
        if four == b"hdrl":
            for t2, s2, l2 in _avi_walk(data, s + 4, s + ln):
                if t2 == b"avih":
                    n_frames = int.from_bytes(data[s2 + 16 : s2 + 20], "little")
                    w = int.from_bytes(data[s2 + 32 : s2 + 36], "little")
                    h = int.from_bytes(data[s2 + 36 : s2 + 40], "little")
                elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    fcc = None
                    scale = rate = 0
                    c = None
                    for t3, s3, l3 in _avi_walk(data, s2 + 4, s2 + l2):
                        if t3 == b"strh":
                            fcc = data[s3 : s3 + 4]
                            scale = int.from_bytes(data[s3 + 20 : s3 + 24], "little")
                            rate = int.from_bytes(data[s3 + 24 : s3 + 28], "little")
                        elif t3 == b"strf" and fcc == b"vids":
                            c = data[s3 + 16 : s3 + 20]
                    if fcc == b"vids" and comp is None:
                        comp = c
                        fps = rate // scale if scale else 0
        elif four == b"movi":
            for t2, s2, l2 in _avi_walk(data, s + 4, s + ln):
                if t2[2:4] in (b"dc", b"db"):
                    chunks.append(data[s2 : s2 + l2])
    if comp is None or not w or not h or not chunks:
        raise ValueError("avi: no video stream")
    grids = []
    for body in chunks:
        if comp == b"MJPG":
            g = jpeg_pixels(body)
            if len(g[0][0]) == 1:  # grayscale MJPG -> replicate to RGB
                g = [[[px[0]] * 3 for px in row] for row in g]
            grids.append(g)
        elif comp == b"\x00\x00\x00\x00":
            grids.append(_avi_dib_grid(body, w, h))
        else:
            raise ValueError(f"avi: codec {comp!r} unsupported")
    return w, h, n_frames or len(grids), fps, grids


def avi_header(data: bytes):
    w, h, n_frames, _, _ = avi_parse(data)
    return "avi", w, h, n_frames


def avi_channel_stats(data: bytes):
    grid = avi_parse(data)[4][0]  # first presented frame
    chans = [[px[c] for row in grid for px in row] for c in range(3)]
    return "avi", [(len(ch), sum(ch), min(ch), max(ch)) for ch in chans]


def avi_frame_hashes(data: bytes, n_frames: int):
    import hashlib

    grids = avi_parse(data)[4]
    out = []
    for i in range(n_frames):
        g = grids[i * len(grids) // n_frames]
        raw = bytes(v for row in g for px in row for v in px)
        out.append(hashlib.sha256(raw).hexdigest()[:16])
    return out


# --- IMA ADPCM WAV (fmt tag 0x11) -----------------------------------------------
#
# Scalar twin of convert_spark/kernels/adpcm.py: per-sample if/else
# decode loop straight from the IMA recommendation, byte-cursor RIFF
# walk (no numpy, no lockstep vectorization).

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def wav_fmt_tag(data: bytes) -> int:
    """Format tag of a RIFF/WAVE payload (scalar chunk walk)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF header")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"fmt ":
            return int.from_bytes(data[pos + 8 : pos + 10], "little")
        pos += 8 + ln + (ln & 1)
    raise ValueError("wav: missing fmt chunk")


def adpcm_parse(data: bytes):
    """-> (nch, rate, block_align, fact_frames_or_None, data_bytes)."""
    pos = 12
    fmt = pcm = fact = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            pcm = body
        elif tag == b"fact" and len(body) >= 4:
            fact = int.from_bytes(body[:4], "little")
        pos += 8 + ln + (ln & 1)
    if fmt is None or pcm is None:
        raise ValueError("wav: missing fmt/data chunk")
    nch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    ba = int.from_bytes(fmt[12:14], "little")
    return nch, rate, ba, fact, pcm


def adpcm_samples(data: bytes):
    """Per-channel int16 sample lists + rate, per-sample scalar decode."""
    nch, rate, ba, fact, pcm = adpcm_parse(data)
    chans = [[] for _ in range(nch)]
    for b in range(len(pcm) // ba):
        block = pcm[b * ba : (b + 1) * ba]
        preds, idxs = [], []
        for c in range(nch):
            v = block[4 * c] | (block[4 * c + 1] << 8)
            if v >= 0x8000:
                v -= 0x10000
            preds.append(v)
            idxs.append(max(0, min(88, block[4 * c + 2])))
            chans[c].append(v)  # header sample IS sample 0
        body = block[4 * nch :]
        n_words = len(body) // (4 * nch)
        for wd in range(n_words):
            for c in range(nch):
                grp = body[(wd * nch + c) * 4 : (wd * nch + c) * 4 + 4]
                for byte in grp:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _IMA_STEPS[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            diff = -diff
                        v = max(-32768, min(32767, preds[c] + diff))
                        preds[c] = v
                        idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX[nib & 7]))
                        chans[c].append(v)
    if fact is not None:
        chans = [ch[:fact] for ch in chans]
    return chans, rate


def adpcm_header(data: bytes):
    chans, rate = adpcm_samples(data)
    return "wav", len(chans[0]) if chans else 0, rate, len(chans)


def adpcm_frame_windows(data: bytes, n_frames: int):
    """Windows hash the DECODED little-endian int16 interleaved stream
    (the engine's decode-then-window convention for compressed audio)."""
    import hashlib

    chans, _ = adpcm_samples(data)
    nch, n = len(chans), len(chans[0]) if chans else 0
    raw = b"".join(
        struct.pack("<h", chans[c][f]) for f in range(n) for c in range(nch)
    )
    fb = nch * 2
    bounds = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        hashlib.sha256(raw[bounds[i] * fb : bounds[i + 1] * fb]).hexdigest()[:16]
        for i in range(n_frames)
    ]


# --- Microsoft ADPCM WAV (fmt tag 0x0002) ---------------------------------------
#
# Scalar twin of kernels/adpcm.py's MS path: per-sample loop with the
# published 7-row coefficient table and 16-entry adaptation table.

_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]


def _s16(lo: int, hi: int) -> int:
    v = lo | (hi << 8)
    return v - 0x10000 if v >= 0x8000 else v


def ms_adpcm_samples(data: bytes):
    """Per-channel int16 sample lists + rate, per-sample scalar decode
    of Microsoft ADPCM blocks (high nibble first, channels rotating)."""
    nch, rate, ba, fact, pcm = adpcm_parse(data)
    chans = [[] for _ in range(nch)]
    for b in range(len(pcm) // ba):
        block = pcm[b * ba : (b + 1) * ba]
        preds = [block[c] for c in range(nch)]
        if any(p >= len(_MS_COEFS) for p in preds):
            raise ValueError("ms-adpcm: predictor index")
        deltas = [_s16(block[nch + 2 * c], block[nch + 2 * c + 1]) for c in range(nch)]
        samp1 = [_s16(block[3 * nch + 2 * c], block[3 * nch + 2 * c + 1]) for c in range(nch)]
        samp2 = [_s16(block[5 * nch + 2 * c], block[5 * nch + 2 * c + 1]) for c in range(nch)]
        for c in range(nch):
            chans[c].append(samp2[c])  # block sample 1
            chans[c].append(samp1[c])  # block sample 2
        nibs = []
        for byte in block[7 * nch :]:
            nibs.append(byte >> 4)
            nibs.append(byte & 0x0F)
        for i in range(len(nibs) // nch):
            for c in range(nch):
                u = nibs[i * nch + c]
                sgn = u - 16 if u >= 8 else u
                c1, c2 = _MS_COEFS[preds[c]]
                pred = (samp1[c] * c1 + samp2[c] * c2) >> 8
                samp = max(-32768, min(32767, pred + sgn * deltas[c]))
                deltas[c] = max(16, (_MS_ADAPT[u] * deltas[c]) >> 8)
                samp2[c] = samp1[c]
                samp1[c] = samp
                chans[c].append(samp)
    if fact is not None:
        chans = [ch[:fact] for ch in chans]
    return chans, rate


def ms_adpcm_header(data: bytes):
    chans, rate = ms_adpcm_samples(data)
    return "wav", len(chans[0]) if chans else 0, rate, len(chans)


def ms_adpcm_frame_windows(data: bytes, n_frames: int):
    import hashlib

    chans, _ = ms_adpcm_samples(data)
    nch, n = len(chans), len(chans[0]) if chans else 0
    raw = b"".join(
        struct.pack("<h", chans[c][f]) for f in range(n) for c in range(nch)
    )
    fb = nch * 2
    bounds = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        hashlib.sha256(raw[bounds[i] * fb : bounds[i + 1] * fb]).hexdigest()[:16]
        for i in range(n_frames)
    ]


# --- FLAC (xiph FLAC format specification) --------------------------------------
#
# Scalar twin of convert_spark/kernels/flac.py: index/bit-offset cursor
# (no accumulator), plain-list sample reconstruction with explicit
# per-sample predictor loops, table-free bitwise CRCs.


class _FBits:
    def __init__(self, data, pos):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n):
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("flac: truncated")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def unary(self):
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _flac_crc8_s(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _flac_crc16_s(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _flac_utf8_s(r):
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: utf8")
        n = (n << 6) | (c & 0x3F)
    return n


def _flac_residual_s(r, block_size, order):
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: residual method")
    pbits = 5 if method == 1 else 4
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_parts = 1 << porder
    if block_size % n_parts:
        raise ValueError("flac: partitions")
    res = []
    for p in range(n_parts):
        cnt = (block_size >> porder) - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            width = r.read(5)
            for _ in range(cnt):
                v = r.read(width) if width else 0
                if width and v >= (1 << (width - 1)):
                    v -= 1 << width
                res.append(v)
        else:
            for _ in range(cnt):
                q = r.unary()
                u = (q << k) | (r.read(k) if k else 0)
                res.append(-((u + 1) >> 1) if u & 1 else u >> 1)
    return res


_FLAC_FIXED_S = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe_s(r, block_size, bps):
    if r.read(1):
        raise ValueError("flac: subframe pad bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
    ebps = bps - wasted

    def signed(v, bits):
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    if t == 0:
        x = [signed(r.read(ebps), ebps)] * block_size
    elif t == 1:
        x = [signed(r.read(ebps), ebps) for _ in range(block_size)]
    elif 8 <= t <= 12:
        order = t - 8
        x = [signed(r.read(ebps), ebps) for _ in range(order)]
        res = _flac_residual_s(r, block_size, order)
        coefs = _FLAC_FIXED_S[order]
        for i in range(order, block_size):
            x.append(res[i - order] + sum(c * x[i - 1 - j] for j, c in enumerate(coefs)))
    elif t >= 32:
        order = (t & 0x1F) + 1
        x = [signed(r.read(ebps), ebps) for _ in range(order)]
        precision = r.read(4) + 1
        shift = r.read(5)
        coefs = [signed(r.read(precision), precision) for _ in range(order)]
        res = _flac_residual_s(r, block_size, order)
        for i in range(order, block_size):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            x.append(res[i - order] + pred)
    else:
        raise ValueError(f"flac: subframe type {t}")
    return [v << wasted for v in x]


_FLAC_BS_S = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_FLAC_RATE_S = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
                0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
                0b1001: 44100, 0b1010: 48000, 0b1011: 96000}
_FLAC_BPS_S = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def flac_samples(data):
    """Per-channel int sample lists + rate — full scalar frame decode
    with CRC-8/CRC-16 verification."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: magic")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            streaminfo = data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("flac: STREAMINFO")
    bits = int.from_bytes(streaminfo[10:18], "big")
    si_rate = bits >> 44
    nch = ((bits >> 41) & 0x7) + 1
    si_bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    chans = [[] for _ in range(nch)]
    rate = si_rate
    while pos < len(data) - 1:
        start = pos
        r = _FBits(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: sync")
        r.read(2)
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _flac_utf8_s(r)
        if bs_code == 0b0110:
            block_size = r.read(8) + 1
        elif bs_code == 0b0111:
            block_size = r.read(16) + 1
        else:
            block_size = _FLAC_BS_S[bs_code]
        if rate_code == 0b1100:
            rate = r.read(8) * 1000
        elif rate_code == 0b1101:
            rate = r.read(16)
        elif rate_code == 0b1110:
            rate = r.read(16) * 10
        elif rate_code == 0:
            rate = si_rate
        else:
            rate = _FLAC_RATE_S[rate_code]
        bps = si_bps if bps_code == 0 else _FLAC_BPS_S[bps_code]
        if _flac_crc8_s(data[start : r.byte]) != r.read(8):
            raise ValueError("flac: header crc")
        if ch_code <= 7:
            sub_bps = [bps] * (ch_code + 1)
        elif ch_code == 0b1000:
            sub_bps = [bps, bps + 1]
        elif ch_code == 0b1001:
            sub_bps = [bps + 1, bps]
        elif ch_code == 0b1010:
            sub_bps = [bps, bps + 1]
        else:
            raise ValueError("flac: channel assignment")
        if len(sub_bps) != nch:
            raise ValueError("flac: channel count")
        subs = [_flac_subframe_s(r, block_size, b) for b in sub_bps]
        r.align()
        end = r.byte
        if _flac_crc16_s(data[start:end]) != int.from_bytes(data[end : end + 2], "big"):
            raise ValueError("flac: frame crc")
        pos = end + 2
        if ch_code == 0b1000:  # left/side
            subs = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
        elif ch_code == 0b1001:  # right/side
            subs = [[rr + s for s, rr in zip(subs[0], subs[1])], subs[1]]
        elif ch_code == 0b1010:  # mid/side
            left = [((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(subs[0], subs[1])]
            subs = [left, [l - s for l, s in zip(left, subs[1])]]
        for c in range(nch):
            chans[c].extend(subs[c])
    if total:
        chans = [ch[:total] for ch in chans]
    return chans, rate


def flac_header(data):
    chans, rate = flac_samples(data)
    return "flac", len(chans[0]) if chans else 0, rate, len(chans)


def flac_channel_stats(data):
    chans, _ = flac_samples(data)
    return "flac", [(len(ch), sum(ch), min(ch), max(ch)) for ch in chans]


def flac_frame_windows(data, n_frames):
    import hashlib

    chans, _ = flac_samples(data)
    nch, n = len(chans), len(chans[0]) if chans else 0
    raw = b"".join(
        struct.pack("<h", chans[c][f]) for f in range(n) for c in range(nch)
    )
    fb = nch * 2
    bounds = [i * n // n_frames for i in range(n_frames + 1)]
    return [
        hashlib.sha256(raw[bounds[i] * fb : bounds[i + 1] * fb]).hexdigest()[:16]
        for i in range(n_frames)
    ]
