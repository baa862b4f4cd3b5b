"""Deterministic genuine-media payload synthesis for the real-codec
oracle queries (q_media_decode_real / q_media_stats_real).

Every payload is a pure function of its integer seed (the documents
table's ``doc_id``): a PCG64 stream keyed by the seed picks dimensions,
content and per-scanline PNG filter types, and the payload is emitted as
a genuine PNG (the from-scratch writer below — every IHDR shape the spec
allows, including sub-byte depths, palette, 16-bit and Adam7 interlace,
with seeded filter types 0-4), a genuine JPEG (kernels/jpeg.py encoder —
sequential 4:4:4 / 4:2:0 / grayscale / restart markers / progressive),
or a genuine WAV (stdlib ``wave``; 8-bit mono / 16-bit stereo PCM).

The generator is SHARED INPUT between the Spark query and the KAT twin
(tests/media_reference_impl.py): what's under test is the DECODE path,
which the twin re-implements independently per the public specs. PCG64
output is bit-stable across numpy versions by numpy's compatibility
guarantee, so payloads are reproducible forever for a given seed.

Reference parity note: the reference has no media pipeline — this is the
task brief's multimodal component (opaque binary columns + Arrow-batched
decode), with REAL payloads so the driver's hash gate exercises the real
codecs, not the deterministic-fake path.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

N_FORMATS = 16

# Adam7 pass geometry (x0, y0, dx, dy) — PNG spec order
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

# (bit_depth, color_type) per PNG format class
_PNG_KINDS = {
    0: (8, 0),    # gray8
    1: (8, 2),    # rgb8
    2: (8, 6),    # rgba8
    3: (8, 3),    # palette8
    4: (16, 0),   # gray16
    5: (1, 0),    # gray1
    6: (4, 0),    # gray4
    7: (8, 2),    # rgb8 Adam7
    8: (8, 4),    # gray+alpha
    9: (2, 3),    # palette2 (sub-byte palette)
}
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(raw: np.ndarray, prior: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw scanline (int64 in, byte out).
    The writer-side inverse of the decoder's unfilter — left/up/average/
    paeth predictors over reconstructed bytes."""
    n = raw.shape[0]
    left = np.zeros(n, dtype=np.int64)
    left[bpp:] = raw[:-bpp] if bpp <= n else 0
    upleft = np.zeros(n, dtype=np.int64)
    upleft[bpp:] = prior[:-bpp] if bpp <= n else 0
    if ftype == 0:
        out = raw
    elif ftype == 1:
        out = raw - left
    elif ftype == 2:
        out = raw - prior
    elif ftype == 3:
        out = raw - (left + prior) // 2
    else:  # Paeth
        p = left + prior - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft))
        out = raw - pred
    return (out & 0xFF).astype(np.uint8)


def _pack_rows(vals: np.ndarray, bit_depth: int) -> np.ndarray:
    """Pack (h, w) sample values into byte rows at sub-byte depths
    (MSB-first, rows padded to a byte) or pass through at depth 8."""
    if bit_depth == 8:
        return vals.astype(np.uint8)
    h, w = vals.shape
    bits = ((vals[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1).reshape(h, w * bit_depth)
    pad = (-bits.shape[1]) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros((h, pad), dtype=bits.dtype)], axis=1)
    return np.packbits(bits.astype(np.uint8), axis=1)


def write_png(
    vals: np.ndarray,
    bit_depth: int,
    color_type: int,
    rng: np.random.Generator,
    plte: np.ndarray | None = None,
    interlace: int = 0,
) -> bytes:
    """From-scratch PNG writer for every IHDR shape: ``vals`` is
    (h, w) sample values for gray/palette or (h, w, channels) for
    multi-channel / 16-bit images; per-scanline filter types are drawn
    from ``rng`` so the decoder's filter 0-4 paths are all exercised."""
    if vals.ndim == 2:
        h, w = vals.shape
        channels = 1
    else:
        h, w, channels = vals.shape
    sub_byte = bit_depth < 8

    def byte_rows(sub: np.ndarray) -> tuple[np.ndarray, int]:
        """(rows of raw bytes, bpp filter offset) for one (sub-)image."""
        if sub_byte:
            return _pack_rows(sub, bit_depth), 1
        if bit_depth == 16:
            be = sub.astype(">u2")
            return be.reshape(be.shape[0], -1).view(np.uint8), 2 * channels
        return sub.reshape(sub.shape[0], -1).astype(np.uint8), channels

    def filter_image(sub: np.ndarray) -> bytes:
        rows, bpp = byte_rows(sub)
        prior = np.zeros(rows.shape[1], dtype=np.int64)
        out = bytearray()
        for y in range(rows.shape[0]):
            raw = rows[y].astype(np.int64)
            ftype = int(rng.integers(0, 5))
            out.append(ftype)
            out += _filter_row(raw, prior, ftype, bpp).tobytes()
            prior = raw
        return bytes(out)

    if interlace == 0:
        raw = filter_image(vals)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = vals[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filter_image(sub))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def payload_for(seed: int) -> bytes:
    """One genuine media payload, a pure function of ``seed``. Format
    class cycles ``seed % 16``: ten PNG IHDR shapes, four JPEG scan
    shapes, two WAV PCM layouts."""
    fmt = int(seed) % N_FORMATS
    rng = np.random.Generator(np.random.PCG64(0xC0FFEE ^ (int(seed) * 2654435761)))
    w = int(rng.integers(8, 25))
    h = int(rng.integers(8, 25))
    if fmt <= 9:  # PNG
        bit_depth, color_type = _PNG_KINDS[fmt]
        interlace = 1 if fmt == 7 else 0
        if color_type == 3:
            n_colors = int(rng.integers(2, (1 << bit_depth) + 1))
            plte = rng.integers(0, 256, size=(n_colors, 3))
            vals = rng.integers(0, n_colors, size=(h, w))
            return write_png(vals, bit_depth, color_type, rng, plte=plte, interlace=interlace)
        hi = (1 << bit_depth) - 1
        nch = _CHANNELS[color_type]
        shape = (h, w) if nch == 1 and bit_depth < 16 else (h, w, nch)
        vals = rng.integers(0, hi + 1, size=shape)
        if bit_depth == 16:
            vals = vals.reshape(h, w, 1) if vals.ndim == 2 else vals
        return write_png(vals, bit_depth, color_type, rng, interlace=interlace)
    if fmt <= 13:  # JPEG — smooth content so entropy data stays small
        from .kernels import jpeg

        yy, xx = np.mgrid[0:h, 0:w]
        f1, f2 = rng.uniform(3.0, 9.0, size=2)
        p = rng.uniform(0.0, 6.0, size=3)
        px = np.stack(
            [
                (128 + 90 * np.sin(xx / f1 + yy / f2 + ph)).astype(np.uint8)
                for ph in p
            ],
            axis=2,
        )
        if fmt == 10:
            return jpeg.encode_baseline(px[:, :, :1], quality=90)  # grayscale
        if fmt == 11:
            return jpeg.encode_baseline(px, quality=85)  # 4:4:4
        if fmt == 12:
            return jpeg.encode_baseline(px, quality=75, subsample=True, restart_interval=2)
        # progressive WITH successive approximation (the hardest scan shape)
        return jpeg.encode_baseline(px, quality=85, progressive=True, sa_levels=1)
    # WAV
    import wave

    n_frames = int(rng.integers(64, 400))
    rate = int(rng.integers(4, 9)) * 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        if fmt == 14:  # 16-bit stereo
            wf.setnchannels(2)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            samples = rng.integers(-20000, 20000, size=(n_frames, 2)).astype("<i2")
            wf.writeframes(samples.tobytes())
        else:  # 8-bit mono
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(rate)
            samples = rng.integers(0, 256, size=n_frames).astype(np.uint8)
            wf.writeframes(samples.tobytes())
    return buf.getvalue()


def payload_batch(ids: np.ndarray) -> list[bytes]:
    return [payload_for(int(i)) for i in ids]


def payload_df(df):
    """(url, seed) DataFrame -> (url, payload) with genuine media bytes,
    generated inside the Arrow batch on the executors — the payload for
    a row is a pure function of its ``seed``, so the stage is
    deterministic, embarrassingly parallel and shuffle-free."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["seed"].to_numpy()
            yield pd.DataFrame({"url": pdf["url"].to_numpy(), "payload": payload_batch(ids)})

    return df.select("url", "seed").mapInPandas(run, schema="url string, payload binary")
