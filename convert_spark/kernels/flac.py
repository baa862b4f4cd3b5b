"""FLAC audio codec from scratch — stdlib + numpy only.

Public-spec implementation (the xiph FLAC format specification) of
actual SAMPLE decode — not just the STREAMINFO metadata the container
path already parses. FLAC is lossless, so the correctness gate is
BIT-EXACT: decoded samples must equal the encoder's input integers.

Coverage:

* Stream: fLaC magic, metadata blocks (STREAMINFO parsed, others
  skipped), then fixed-blocksize FRAMES.
* Frame header: sync + blocking strategy, block-size/sample-rate codes
  (including the 8/16-bit get-from-end-of-header escapes), channel
  assignment — independent, left/side, right/side and mid/side stereo
  decorrelation — sample size codes, UTF-8-style frame number, CRC-8
  (poly 0x07) over the header and CRC-16 (poly 0x8005) over the frame.
* Subframes: CONSTANT, VERBATIM, FIXED orders 0-4 and LPC (any order,
  quantized coefficients + shift), each with wasted-bits support and
  Rice-coded residual partitions (4-bit parameter, escape 0b1111 to
  raw binary, 5-bit variant for RICE2).

The entropy side (Rice unary/remainder reads) is inherently bit-serial
— decoded with the same 32-bit-accumulator bit cursor pattern as
kernels/jpeg.py's huffman loop, while the predictor reconstruction
(fixed orders via np.cumsum chains, LPC via the order-deep recurrence)
runs in numpy. Like the other from-scratch codecs this is the
test-scale implementation of a per-payload stage; the production swap
site for megasample corpora is a native libFLAC at the same
mapInPandas call sites, and bench.py measures this path's real
payloads/sec so the boundary is quantified.

The paired encoder exists so convert_spark.mediagen can synthesize
genuine payloads as a pure function of the seed: it emits every
subframe type (constant / verbatim / fixed / LPC with seeded
coefficients) and stereo decorrelation modes, so the decoder's whole
envelope sits under the driver's hash gate. Losslessness makes the
round trip the spec's own oracle; the independent scalar twin in
tests/media_reference_impl.py re-decodes the same bytes per-bit.
"""

from __future__ import annotations

import struct

import numpy as np


# --- CRCs (spec polynomials) ----------------------------------------------

def _crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _crc8_table()
_CRC16 = _crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF))
    return c


# --- bit IO ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of next refill
        self.acc = 0
        self.nbits = 0

    def read(self, bits: int) -> int:
        while self.nbits < bits:
            if self.pos >= len(self.data):
                raise NotImplementedError("malformed FLAC: bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= bits
        v = (self.acc >> self.nbits) & ((1 << bits) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise NotImplementedError("malformed FLAC: bitstream truncated")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            q += self.nbits - top
            self.nbits = top - 1
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res << 1, (-res << 1) - 1)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return np.where(u & 1, -((u + 1) >> 1), u >> 1)


# --- encoder ---------------------------------------------------------------

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _utf8_number(w: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style coded number (frame index): nbytes-wide head
    byte carrying the top payload bits, then 0b10xxxxxx continuations."""
    if n < 0x80:
        w.write(n, 8)
        return
    # capacity at nbytes: (7 - nbytes) head payload bits + 6 bits per
    # continuation byte = 1 + 5*nbytes total (spec UTF-8 coding)
    for nbytes in range(2, 8):
        if n < (1 << (1 + 5 * nbytes)):
            break
    head = (0xFF << (8 - nbytes)) & 0xFF
    w.write(head | ((n >> (6 * (nbytes - 1))) & ((1 << (7 - nbytes)) - 1)), 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise NotImplementedError("malformed FLAC: bad UTF-8 frame number")
    n = b0 & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("malformed FLAC: bad UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _rice_write(w: _BitWriter, res: np.ndarray, bps_cap: int = 30) -> None:
    """One Rice partition (partition order 0): pick k from the mean,
    escape to raw if residuals are too wide."""
    u = _zigzag(res.astype(np.int64))
    mean = float(u.mean()) if u.size else 0.0
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    # escape path if any quotient would be absurd
    if u.size and int(u.max()) >> k > 4096:
        w.write(0b1111, 4)  # escape
        width = max(int(int(np.abs(res).max()).bit_length()) + 1, 1)
        width = min(width, bps_cap)
        w.write(width, 5)
        for v in res.tolist():
            w.write(int(v) & ((1 << width) - 1), width)
        return
    w.write(k, 4)
    for v in u.tolist():
        w.unary(int(v) >> k)
        if k:
            w.write(int(v) & ((1 << k) - 1), k)


def _subframe_write(w: _BitWriter, x: np.ndarray, bps: int, mode: tuple) -> None:
    """mode: ('constant',) ('verbatim',) ('fixed', order) ('lpc', coeffs, shift, precision)."""
    kind = mode[0]
    if kind == "constant" :
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    if kind == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in x.tolist():
            w.write(int(v) & ((1 << bps) - 1), bps)
        return
    if kind == "fixed":
        order = mode[1]
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for v in x[:order].tolist():
            w.write(int(v) & ((1 << bps) - 1), bps)
        res = x.astype(np.int64)
        for _ in range(order):
            res = np.diff(res)
        w.write(0, 2)  # residual method: 4-bit Rice
        w.write(0, 4)  # partition order 0
        _rice_write(w, res)
        return
    # LPC
    _, coefs, shift, precision = mode
    order = len(coefs)
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)
    w.write(0, 1)
    for v in x[:order].tolist():
        w.write(int(v) & ((1 << bps) - 1), bps)
    w.write(precision - 1, 4)
    w.write(shift, 5)
    for c in coefs:
        w.write(int(c) & ((1 << precision) - 1), precision)
    xs = x.astype(np.int64)
    pred = np.zeros(len(xs) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        pred += int(c) * xs[order - 1 - j : len(xs) - 1 - j]
    res = xs[order:] - (pred >> shift)
    w.write(0, 2)  # residual method: 4-bit Rice
    w.write(0, 4)  # partition order 0
    _rice_write(w, res)


def encode_flac(samples: np.ndarray, rate: int, block_size: int = 256,
                modes=None, stereo: str = "independent", bps: int = 16) -> bytes:
    """(frames, nch) int16 -> FLAC stream. ``modes`` is an optional
    per-frame list of per-channel subframe mode tuples (cycled);
    ``stereo`` picks the decorrelation for 2-channel frames:
    'independent', 'left_side', 'right_side' or 'mid_side'."""
    n, nch = samples.shape
    s = samples.astype(np.int64)
    w_hdr = struct.pack(">HH", block_size, block_size)
    streaminfo = (
        w_hdr
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + ((rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n).to_bytes(8, "big")
        + bytes(16)  # md5 unset
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    frame_idx = 0
    pos = 0
    mode_i = 0
    while pos < n:
        bs = min(block_size, n - pos)
        blk = s[pos : pos + bs]
        w = _BitWriter()
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize strategy
        # block size code: escape 0b0111 -> 16-bit (bs-1) at header end
        w.write(0b0111, 4)
        # sample rate code: dedicated table code when one exists, else the
        # 16-bit-Hz escape (rate < 65536), else the tens-of-Hz escape
        # (multiples of 10 under 655360). Anything else fits no frame-header
        # encoding — raise rather than silently truncate to 16 bits.
        rate_to_code = {v: k for k, v in _RATE_CODES.items()}
        if rate in rate_to_code:
            rate_code, rate_tail = rate_to_code[rate], None
        elif 0 < rate < (1 << 16):
            rate_code, rate_tail = 0b1101, rate
        elif rate % 10 == 0 and 0 < rate // 10 < (1 << 16):
            rate_code, rate_tail = 0b1110, rate // 10
        else:
            raise NotImplementedError(
                f"FLAC sample rate {rate} Hz fits no frame-header encoding"
            )
        w.write(rate_code, 4)
        ch_mode = stereo if nch == 2 and bs > 1 else "independent"
        ch_code = {"independent": nch - 1, "left_side": 0b1000,
                   "right_side": 0b1001, "mid_side": 0b1010}[ch_mode]
        w.write(ch_code, 4)
        w.write({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}[bps], 3)
        w.write(0, 1)  # reserved
        _utf8_number(w, frame_idx)
        w.write(bs - 1, 16)
        if rate_tail is not None:
            w.write(rate_tail, 16)
        # writer is byte-aligned here (header is whole bytes): CRC-8
        w.write(crc8(bytes(w.out)), 8)
        # channel streams under the chosen decorrelation
        if ch_mode == "independent":
            chans = [(blk[:, c], bps) for c in range(nch)]
        elif ch_mode == "left_side":
            chans = [(blk[:, 0], bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        elif ch_mode == "right_side":
            chans = [(blk[:, 0] - blk[:, 1], bps + 1), (blk[:, 1], bps)]
        else:  # mid_side
            chans = [((blk[:, 0] + blk[:, 1]) >> 1, bps), (blk[:, 0] - blk[:, 1], bps + 1)]
        for x, cbps in chans:
            mode = (modes[mode_i % len(modes)] if modes else ("verbatim",))
            mode_i += 1
            if mode[0] == "constant" and not np.all(x == x[0]):
                mode = ("verbatim",)  # constant only encodes constants
            if mode[0] in ("fixed", "lpc") and bs <= (mode[1] if mode[0] == "fixed" else len(mode[1])):
                mode = ("verbatim",)
            _subframe_write(w, x, cbps, mode)
        w.align()
        body = bytes(w.out)
        out += body + struct.pack(">H", crc16(body))
        pos += bs
        frame_idx += 1
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def _read_residual(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise NotImplementedError("malformed FLAC: reserved residual method")
    pbits = 5 if method == 1 else 4
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_parts = 1 << porder
    if block_size % n_parts:
        raise NotImplementedError("malformed FLAC: partition order mismatch")
    res = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        cnt = (block_size >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise NotImplementedError("malformed FLAC: partition smaller than order")
        k = r.read(pbits)
        if k == escape:
            width = r.read(5)
            if width:
                vals = np.array([r.read(width) for _ in range(cnt)], dtype=np.int64)
                sign = 1 << (width - 1)
                res[idx : idx + cnt] = (vals ^ sign) - sign
            else:
                res[idx : idx + cnt] = 0
        else:
            u = np.empty(cnt, dtype=np.int64)
            for i in range(cnt):
                q = r.unary()
                u[i] = (q << k) | r.read(k) if k else q
            res[idx : idx + cnt] = _unzigzag(u)
        idx += cnt
    return res


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise NotImplementedError("malformed FLAC: subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
    ebps = bps - wasted

    def signed(v: int, bits: int) -> int:
        s = 1 << (bits - 1)
        return (v ^ s) - s

    if t == 0:  # CONSTANT
        x = np.full(block_size, signed(r.read(ebps), ebps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.array([signed(r.read(ebps), ebps) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = [signed(r.read(ebps), ebps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            x[i] = res[i - order] + sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = [signed(r.read(ebps), ebps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise NotImplementedError("malformed FLAC: invalid LPC precision")
        shift = r.read(5)
        coefs = [signed(r.read(precision), precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        for i in range(order, block_size):
            pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift
            x[i] = res[i - order] + pred
    else:
        raise NotImplementedError(f"FLAC subframe type {t}: reserved")
    return x << wasted


_BS_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
               0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
               0b1001: 44100, 0b1010: 48000, 0b1011: 96000}
_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream -> ((frames, nch) int32 samples, rate). Bit-exact
    per the spec; CRC-8/CRC-16 verified per frame."""
    if data[:4] != b"fLaC":
        raise NotImplementedError("malformed FLAC: bad magic")
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
        raise NotImplementedError("malformed FLAC: missing STREAMINFO")
    bits = int.from_bytes(streaminfo[10:18], "big")
    si_rate = bits >> 44
    nch = ((bits >> 41) & 0x7) + 1
    si_bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    chans_out: list[np.ndarray] = []
    rate = si_rate
    while pos < len(data) - 1:
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise NotImplementedError("malformed FLAC: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            block_size = r.read(8) + 1
        elif bs_code == 0b0111:
            block_size = r.read(16) + 1
        elif bs_code in _BS_CODES:
            block_size = _BS_CODES[bs_code]
        else:
            raise NotImplementedError("malformed FLAC: reserved block size code")
        if rate_code == 0b1100:
            rate = r.read(8) * 1000
        elif rate_code == 0b1101:
            rate = r.read(16)
        elif rate_code == 0b1110:
            rate = r.read(16) * 10
        elif rate_code == 0:
            rate = si_rate
        elif rate_code in _RATE_CODES:
            rate = _RATE_CODES[rate_code]
        else:
            raise NotImplementedError("malformed FLAC: invalid sample rate code")
        bps = si_bps if bps_code == 0 else _BPS_CODES.get(bps_code)
        if bps is None:
            raise NotImplementedError("malformed FLAC: reserved bps code")
        hdr_end = r.pos  # byte-aligned here (header is whole bytes)
        if crc8(data[frame_start:hdr_end]) != r.read(8):
            raise NotImplementedError("malformed FLAC: frame header CRC mismatch")
        if ch_code <= 7:
            n_sub = ch_code + 1
            sub_bps = [bps] * n_sub
        elif ch_code in (0b1000, 0b1001, 0b1010):
            n_sub = 2
            sub_bps = [bps, bps + 1] if ch_code != 0b1001 else [bps + 1, bps]
        else:
            raise NotImplementedError("malformed FLAC: reserved channel assignment")
        if n_sub != nch:
            raise NotImplementedError("malformed FLAC: channel count mismatch")
        subs = [_read_subframe(r, block_size, b) for b in sub_bps]
        r.align()
        body_end = r.pos
        if crc16(data[frame_start:body_end]) != int.from_bytes(data[body_end : body_end + 2], "big"):
            raise NotImplementedError("malformed FLAC: frame CRC-16 mismatch")
        pos = body_end + 2
        if ch_code == 0b1000:  # left/side
            left, side = subs
            subs = [left, left - side]
        elif ch_code == 0b1001:  # right/side
            side, right = subs
            subs = [right + side, right]
        elif ch_code == 0b1010:  # mid/side: mid2 = (L+R), L = (mid2+side)/2
            mid, side = subs
            left = (((mid << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        chans_out.append(np.stack(subs, axis=1))
    if not chans_out:
        raise NotImplementedError("malformed FLAC: no audio frames")
    out = np.concatenate(chans_out, axis=0)
    if total:
        out = out[:total]
    return out.astype(np.int32), rate
