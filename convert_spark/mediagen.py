"""Deterministic genuine-media payload synthesis for the real-codec
oracle queries (q_media_decode_real / q_media_stats_real).

Every payload is a pure function of its integer seed (the documents
table's ``doc_id``): a PCG64 stream keyed by the seed picks dimensions,
content and per-scanline PNG filter types, and the payload is emitted as
a genuine PNG (the from-scratch writer below — every IHDR shape the spec
allows, including sub-byte depths, palette, 16-bit and Adam7 interlace,
with seeded filter types 0-4), a genuine JPEG (kernels/jpeg.py encoder —
sequential 4:4:4 / 4:2:0 / grayscale / restart markers / progressive),
a genuine WAV (stdlib ``wave``; 8-bit mono / 16-bit stereo PCM, plus
hand-assembled RIFF for ITU-T G.711 mu-law/A-law — format tags 7/6 —
which ``wave`` cannot write), a genuine GIF (kernels/gif.py encoder —
static incl. interlace, and ANIMATED with sub-rect frames, transparency
masks, seeded disposal methods and delays), a genuine AVI VIDEO
(kernels/avi.py — MJPG frames through the from-scratch JPEG encoder, or
uncompressed DIB rasters), or genuine IMA ADPCM compressed audio
(kernels/adpcm.py — IMA fmt tag 0x11 or Microsoft fmt tag 0x02), or
genuine LOSSLESS FLAC (kernels/flac.py — every subframe type and
stereo decorrelation mode, bit-exact round trips).

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

N_FORMATS = 36

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
    class cycles ``seed % 36``: ten PNG IHDR shapes, four JPEG scan
    shapes, two WAV PCM layouts, two Adobe CMYK/YCCK JPEG shapes, two
    G.711 WAV layouts (18 mu-law mono, 19 A-law stereo — every byte
    value is a valid G.711 code, so the compressed stream is drawn
    directly from the seeded rng), two GIF shapes (20 static —
    interlace by seeded coin — and 21 ANIMATED: 3-6 sub-rect frames
    with seeded disposal methods, transparency masks and delays), and
    two 12-bit extended-sequential JPEG shapes (22 grayscale, 23 RGB
    4:4:4 with restart markers), and two LOSSLESS JPEG shapes (SOF3 —
    24 8-bit RGB, 25 16-bit grayscale, predictor seeded 1-7; the
    decode must reproduce the source samples BIT-EXACTLY), a BMP shape
    (26 — 24-bit BI_RGB, top-down by seeded coin) and a baseline TIFF
    shape (27 — seeded byte order, gray/RGB coin, seeded multi-strip
    layout, seeded Compression none/LZW/Deflate/PackBits with a
    horizontal-Predictor coin), two AVI VIDEO shapes (28 MJPG — every frame a real
    baseline JPEG — and 29 uncompressed DIB, each 3-6 frames at a
    seeded fps), two IMA ADPCM WAV shapes (30 mono, 31 stereo —
    genuine 4-bit compressed audio with multi-block layouts and a
    fact-trimmed tail), two MICROSOFT ADPCM WAV shapes (32 mono,
    33 stereo — 7-coefficient linear prediction, adaptive delta) and
    two FLAC shapes (34 mono, 35 stereo — LOSSLESS: the decode must
    reproduce the source samples bit-exactly; seeded subframe-mode
    pool cycling constant/verbatim/fixed 0-4/LPC, seeded block size
    and stereo decorrelation)."""
    fmt = int(seed) % N_FORMATS
    rng = np.random.Generator(np.random.PCG64(0xC0FFEE ^ (int(seed) * 2654435761)))
    w = int(rng.integers(8, 25))
    h = int(rng.integers(8, 25))
    if fmt >= 34:  # FLAC (lossless compressed audio, kernels/flac.py)
        from .kernels import flac

        nch = 1 if fmt == 34 else 2
        rate = int(rng.integers(4, 9)) * 1000
        bs = int(rng.integers(4, 17)) * 16
        n = int(rng.integers(bs + 1, 4 * bs))
        t = np.arange(n)[:, None]
        freq = rng.uniform(5.0, 30.0, size=nch)
        phase = rng.uniform(0.0, 6.0, size=nch)
        amp = rng.uniform(3000.0, 20000.0, size=nch)
        samples = (amp * np.sin(t / freq + phase)).astype(np.int16)
        # seeded subframe-mode pool cycles every type the decoder has:
        # constant/verbatim/fixed 0-4/LPC with seeded quantized coeffs
        pool = [("constant",), ("verbatim",)] + [("fixed", int(o)) for o in rng.permutation(5)]
        order = int(rng.integers(1, 5))
        coefs = [int(c) for c in rng.integers(-2048, 2048, size=order)]
        pool.append(("lpc", coefs, int(rng.integers(6, 13)), 13))
        stereo = ["independent", "left_side", "right_side", "mid_side"][int(rng.integers(0, 4))]
        return flac.encode_flac(samples, rate, block_size=bs, modes=pool, stereo=stereo)
    if fmt >= 30:  # ADPCM WAV (4-bit compressed audio: IMA 30/31, MS 32/33)
        from .kernels import adpcm

        nch = 1 if fmt in (30, 32) else 2
        rate = int(rng.integers(4, 9)) * 1000
        # multiple blocks + a non-multiple tail so the fact trim and
        # block re-seeding both decode under the gate
        if fmt >= 32:  # Microsoft ADPCM: any samples_per_block >= 4 works
            spb = int(rng.integers(8, 60)) * 2
        else:  # IMA: 8k+1 nibble layout
            spb = int(rng.integers(2, 8)) * 8 + 1
        n = int(rng.integers(spb + 1, 4 * spb))
        t = np.arange(n)[:, None]
        freq = rng.uniform(5.0, 30.0, size=nch)
        phase = rng.uniform(0.0, 6.0, size=nch)
        amp = rng.uniform(3000.0, 20000.0, size=nch)
        samples = (amp * np.sin(t / freq + phase)).astype(np.int16)
        if fmt >= 32:
            return adpcm.encode_ms_wav(samples, rate, samples_pb=spb)
        return adpcm.encode_ima_wav(samples, rate, samples_pb=spb)
    if fmt >= 28:  # AVI video (MJPG / uncompressed DIB streams)
        from .kernels import avi

        n_frames = int(rng.integers(3, 7))
        fps = int(rng.integers(5, 31))
        if fmt == 28:  # MJPG: smooth sine frames keep entropy data small
            yy, xx = np.mgrid[0:h, 0:w]
            f1, f2 = rng.uniform(3.0, 9.0, size=2)
            p = rng.uniform(0.0, 6.0, size=3)
            frames = [
                np.stack(
                    [
                        (128 + 90 * np.sin(xx / f1 + yy / f2 + ph + 0.7 * t)).astype(np.uint8)
                        for ph in p
                    ],
                    axis=2,
                )
                for t in range(n_frames)
            ]
            return avi.encode_avi(frames, fps, codec="MJPG", quality=85)
        frames = [
            rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            for _ in range(n_frames)
        ]
        return avi.encode_avi(frames, fps, codec="DIB")
    if fmt >= 26:  # BMP / baseline TIFF (pure-layout rasters)
        from .kernels import rasters

        if fmt == 26:
            px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            return rasters.encode_bmp(px, top_down=bool(rng.integers(0, 2)))
        nc = 3 if rng.integers(0, 2) else 1
        px = rng.integers(0, 256, size=(h, w, nc)).astype(np.uint8)
        return rasters.encode_tiff(
            px,
            big_endian=bool(rng.integers(0, 2)),
            rows_per_strip=int(rng.integers(1, h + 1)),
            # seeded Compression: none / LZW / Deflate / PackBits, with
            # the horizontal Predictor coin the compressed shapes pair
            # with in real crawls
            compression=int(rng.choice([1, 5, 8, 32773])),
            predictor=int(rng.choice([1, 2])),
        )
    if fmt >= 24:  # lossless JPEG (SOF3), bit-exact round trip
        from .kernels import jpeg

        pred = int(rng.integers(1, 8))
        if fmt == 24:  # 8-bit RGB
            px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            return jpeg.encode_lossless(px, predictor=pred)
        px = rng.integers(0, 1 << 16, size=(h, w, 1)).astype(np.uint16)  # 16-bit gray
        return jpeg.encode_lossless(px, predictor=pred, precision=16)
    if fmt >= 22:  # 12-bit extended sequential JPEG (SOF1)
        from .kernels import jpeg

        yy, xx = np.mgrid[0:h, 0:w]
        f1, f2 = rng.uniform(3.0, 9.0, size=2)
        nch = 1 if fmt == 22 else 3
        p = rng.uniform(0.0, 6.0, size=nch)
        px = np.stack(
            [
                (2048 + 1500 * np.sin(xx / f1 + yy / f2 + ph)).astype(np.uint16)
                for ph in p
            ],
            axis=2,
        )
        if fmt == 22:
            return jpeg.encode_baseline(px, quality=90, precision=12)
        return jpeg.encode_baseline(px, quality=85, precision=12, restart_interval=2)
    if fmt >= 20:  # GIF
        from .kernels import gif

        n_colors = int(rng.integers(2, 17))
        palette = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
        base = palette[rng.integers(0, n_colors, size=(h, w))]
        if fmt == 20:  # static, seeded interlace coin
            return gif.encode_gif(
                [{"pixels": base}], w, h,
                bg_index=int(rng.integers(0, n_colors)),
                interlace=bool(rng.integers(0, 2)),
            )
        # animated: full-canvas first frame, then seeded sub-rect frames
        specs = [{"pixels": base, "delay_cs": int(rng.integers(2, 20)), "disposal": 1}]
        for _ in range(int(rng.integers(2, 6))):
            fw = int(rng.integers(2, w + 1))
            fh = int(rng.integers(2, h + 1))
            fx = int(rng.integers(0, w - fw + 1))
            fy = int(rng.integers(0, h - fh + 1))
            nc = int(rng.integers(2, 9))
            pal = rng.integers(0, 256, size=(nc, 3)).astype(np.uint8)
            spec = {
                "pixels": pal[rng.integers(0, nc, size=(fh, fw))],
                "x": fx, "y": fy,
                "delay_cs": int(rng.integers(2, 20)),
                "disposal": int(rng.integers(0, 4)),
            }
            if rng.integers(0, 2):  # transparency coin
                spec["mask"] = rng.random((fh, fw)) > 0.35
            specs.append(spec)
        return gif.encode_gif(
            specs, w, h, bg_index=int(rng.integers(0, n_colors))
        )
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
    if fmt >= 18:  # G.711 WAV (mu-law / A-law)
        from .operators.multimodal import encode_g711_wav

        n_frames = int(rng.integers(64, 400))
        rate = int(rng.integers(4, 9)) * 1000
        if fmt == 18:  # mu-law mono
            comp = rng.integers(0, 256, size=n_frames).astype(np.uint8)
            return encode_g711_wav(7, 1, rate, comp.tobytes())
        comp = rng.integers(0, 256, size=(n_frames, 2)).astype(np.uint8)  # A-law stereo
        return encode_g711_wav(6, 2, rate, comp.tobytes())
    if fmt >= 16:  # Adobe CMYK family (4-component JPEG)
        from .kernels import jpeg

        yy, xx = np.mgrid[0:h, 0:w]
        f1, f2 = rng.uniform(3.0, 9.0, size=2)
        p = rng.uniform(0.0, 6.0, size=4)
        px = np.stack(
            [
                (128 + 90 * np.sin(xx / f1 + yy / f2 + ph)).astype(np.uint8)
                for ph in p
            ],
            axis=2,
        )
        if fmt == 16:  # inverted CMYK (transform 0), baseline + restarts
            return jpeg.encode_baseline(px, quality=85, adobe_transform=0, restart_interval=2)
        # YCCK (transform 2), progressive with successive approximation
        return jpeg.encode_baseline(px, quality=85, adobe_transform=2, progressive=True, sa_levels=1)
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


# ------------------------------------------------------- containers ---
#
# Video/audio CONTAINER payloads (ISO-BMFF "MP4" per ISO/IEC 14496-12,
# Ogg per RFC 3533 with Vorbis-I / RFC 7845 Opus ident headers). Frame
# DECODE stays declared codec territory; what a training-data pipeline
# filters on — dims, duration, codec ids, channel layout — lives in the
# container headers, which these synthesize from the public specs as a
# pure function of the seed. Separate corpus from ``payload_for`` (the
# image/audio classes) so the committed real-media KATs never shift.
# Round 6 adds FLAC STREAMINFO and MPEG-1/2 Layer III MP3 (frame-header
# walks — again metadata, not sample decode) and AVI (class 9 — unlike
# the others its movi stream IS decodable by the media path).

N_CONTAINER_FORMATS = 10


def _box(tag: bytes, body: bytes, largesize: bool = False) -> bytes:
    """One ISO-BMFF box. ``largesize`` emits the size==1 + 64-bit
    largesize form (14496-12 §4.2) so the parser's wide-size branch is
    exercised by the corpus."""
    if largesize:
        return struct.pack(">I", 1) + tag + struct.pack(">Q", len(body) + 16) + body
    return struct.pack(">I", len(body) + 8) + tag + body


_MP4_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mvhd(timescale: int, duration: int) -> bytes:
    body = struct.pack(">B3x", 0)  # version 0, flags 0
    body += struct.pack(">IIII", 0, 0, timescale, duration)  # ctime mtime
    body += struct.pack(">iH2x8x", 0x00010000, 0x0100)  # rate, volume
    body += _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 99)  # predefined, next_track
    return _box(b"mvhd", body)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    body = struct.pack(">B3B", 0, 0, 0, 7)  # version 0, flags=enabled|in_movie|in_preview
    # ctime, mtime, track_ID, reserved(4), duration, reserved(8) — §8.3.2
    body += struct.pack(">III4xI8x", 0, 0, track_id, duration)
    body += struct.pack(">hhh2x", 0, 0, 0x0100 if w == 0 else 0)  # layer, alt_group, volume
    body += _MP4_MATRIX + struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", body)


def _mdhd(timescale: int, duration: int, v1: bool) -> bytes:
    # language "und" packed as 3x5-bit ASCII-0x60 (14496-12 §8.4.2)
    lang = struct.pack(">Hh", 0x55C4, 0)
    if v1:
        return _box(b"mdhd", struct.pack(">B3xQQIQ", 1, 0, 0, timescale, duration) + lang)
    return _box(b"mdhd", struct.pack(">B3xIIII", 0, 0, 0, timescale, duration) + lang)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _box(b"hdlr", struct.pack(">B3x4x", 0) + handler + b"\x00" * 12 + name + b"\x00")


def _stbl(entry: bytes) -> bytes:
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stts = _box(b"stts", struct.pack(">B3xI", 0, 0))
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, 0))
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, 0))
    stco = _box(b"stco", struct.pack(">B3xI", 0, 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _video_entry(fourcc: bytes, w: int, h: int) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)  # reserved, data_ref_index
    body += b"\x00" * 16  # pre_defined/reserved (14496-12 §12.1.3)
    body += struct.pack(">HHII4xH", w, h, 0x00480000, 0x00480000, 1)
    body += b"\x00" * 32  # compressorname (32-byte padded pascal string)
    body += struct.pack(">Hh", 0x0018, -1)  # depth, pre_defined
    return _box(fourcc, body)


def _audio_entry(fourcc: bytes, channels: int, rate: int) -> bytes:
    body = b"\x00" * 6 + struct.pack(">H", 1)
    body += b"\x00" * 8  # reserved
    body += struct.pack(">HH4xI", channels, 16, rate << 16)  # samplerate 16.16
    return _box(fourcc, body)


def _trak(track_id: int, kind: str, fourcc: bytes, w: int, h: int, channels: int,
          rate: int, timescale: int, duration: int, mvhd_ts: int, mdhd_v1: bool) -> bytes:
    if kind == "vide":
        entry = _video_entry(fourcc, w, h)
        xmhd = _box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
        hdlr = _hdlr(b"vide", b"VideoHandler")
    else:
        entry = _audio_entry(fourcc, channels, rate)
        xmhd = _box(b"smhd", struct.pack(">B3xhxx", 0, 0))
        hdlr = _hdlr(b"soun", b"SoundHandler")
    dinf = _box(b"dinf", _box(b"dref", struct.pack(">B3xI", 0, 1)
                              + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1))))
    minf = _box(b"minf", xmhd + dinf + _stbl(entry))
    mdia = _box(b"mdia", _mdhd(timescale, duration, mdhd_v1) + hdlr + minf)
    tkhd_dur = (duration * mvhd_ts) // timescale  # tkhd is on the MOVIE timescale
    return _box(b"trak", _tkhd(track_id, tkhd_dur, w if kind == "vide" else 0,
                               h if kind == "vide" else 0) + mdia)


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC: CRC-32 poly 0x04C11D B7, unreflected, init/xorout 0
    (RFC 3533 §6). Table-driven here; the twin recomputes it bit-by-bit."""
    global _OGG_CRC_TABLE
    try:
        table = _OGG_CRC_TABLE
    except NameError:
        table = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
            table.append(r)
        _OGG_CRC_TABLE = table
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ table[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ogg_page(serial: int, seq: int, granule: int, header_type: int, packets: list[bytes]) -> bytes:
    segs = bytearray()
    body = bytearray()
    for pkt in packets:
        n_full, last = divmod(len(pkt), 255)
        segs += b"\xff" * n_full + bytes([last])  # lacing values (RFC 3533 §5)
        body += pkt
    head = (b"OggS" + struct.pack("<BBqIII", 0, header_type, granule, serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs))
    page = bytearray(head + bytes(body))
    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    return bytes(page)


_MP3_BITRATES = {3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
                 2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000)}


def container_payload_for(seed: int) -> bytes:
    """One genuine container payload, pure function of ``seed``; class
    cycles ``seed % 10``: three MP4 track layouts, an MP4 with 64-bit
    boxes + v1 mdhd, Ogg Vorbis, Ogg Opus, FLAC (STREAMINFO + seeded
    extra metadata blocks), MPEG-1 Layer III MP3 (seeded ID3v2 prefix /
    ID3v1 trailer coins, per-frame padding), MPEG-2 Layer III MP3, and
    a genuine AVI (class 9 — kernels/avi.py, seeded MJPG/DIB codec
    coin, dims, fps and frame count; the container walk reads only the
    headers but the movi payload is a real decodable stream)."""
    fmt = int(seed) % N_CONTAINER_FORMATS
    rng = np.random.Generator(np.random.PCG64(0xB0C5E5 ^ (int(seed) * 2654435761)))
    if fmt == 9:  # AVI container (real MJPG/DIB stream via kernels/avi.py)
        from .kernels import avi

        w = int(rng.integers(8, 25))
        h = int(rng.integers(8, 25))
        fps = int(rng.integers(5, 31))
        n_frames = int(rng.integers(2, 7))
        if rng.integers(0, 2):
            yy, xx = np.mgrid[0:h, 0:w]
            f1, f2 = rng.uniform(3.0, 9.0, size=2)
            p = rng.uniform(0.0, 6.0, size=3)
            frames = [
                np.stack(
                    [(128 + 90 * np.sin(xx / f1 + yy / f2 + ph + 0.9 * t)).astype(np.uint8) for ph in p],
                    axis=2,
                )
                for t in range(n_frames)
            ]
            return avi.encode_avi(frames, fps, codec="MJPG")
        frames = [rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n_frames)]
        return avi.encode_avi(frames, fps, codec="DIB")
    if fmt == 6:  # FLAC: fLaC magic + metadata blocks (format spec §STREAMINFO)
        rate = int(rng.choice([8000, 16000, 22050, 44100, 48000, 96000]))
        ch = int(rng.integers(1, 9))
        bps = int(rng.choice([8, 16, 24]))
        total = int(rng.integers(1, 2**36 // 1000))  # keeps duration_ms in range
        bs_min, bs_max = 4096, 4096
        fs_min, fs_max = int(rng.integers(64, 2**24)), int(rng.integers(64, 2**24))
        bits = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
        streaminfo = (
            struct.pack(">HH", bs_min, bs_max)
            + struct.pack(">I", fs_min)[1:] + struct.pack(">I", fs_max)[1:]
            + bits.to_bytes(8, "big")
            + bytes(rng.integers(0, 256, size=16).astype(np.uint8))  # md5 of PCM
        )
        extra = bool(rng.integers(0, 2))
        out = b"fLaC" + bytes([0x00 if extra else 0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        if extra:  # a VORBIS_COMMENT block (type 4), then last-flag set
            vendor = b"convert-spark"
            vc = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
            out += bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
        # opaque audio frames after the metadata — the parser never reads them
        return out + bytes(rng.integers(0, 256, size=int(rng.integers(8, 120))).astype(np.uint8))
    if fmt >= 7:  # MP3: a walk of genuine MPEG Layer III frame headers
        ver = 3 if fmt == 7 else 2  # header version bits: MPEG-1 / MPEG-2
        br_idx = int(rng.integers(1, 15))
        sr_idx = int(rng.integers(0, 3))
        rate = _MP3_RATES[ver][sr_idx]
        mode = int(rng.integers(0, 4))  # 3 = mono
        out = bytearray()
        if rng.integers(0, 2):  # ID3v2 prefix coin (syncsafe size)
            body = bytes(rng.integers(0, 128, size=int(rng.integers(10, 120))).astype(np.uint8))
            out += b"ID3\x03\x00\x00" + bytes(
                [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F, (len(body) >> 7) & 0x7F, len(body) & 0x7F]
            ) + body
        factor = 144000 if ver == 3 else 72000
        for _ in range(int(rng.integers(8, 64))):
            pad = int(rng.integers(0, 2))
            flen = factor * _MP3_BITRATES[ver][br_idx] // rate + pad
            hdr = bytes([0xFF, 0xE0 | (ver << 3) | (0b01 << 1) | 1,
                         (br_idx << 4) | (sr_idx << 2) | (pad << 1),
                         mode << 6])
            out += hdr + bytes(rng.integers(0, 256, size=flen - 4).astype(np.uint8))
        if rng.integers(0, 2):  # ID3v1 trailer coin
            out += b"TAG" + bytes(rng.integers(32, 127, size=125).astype(np.uint8))
        return bytes(out)
    if fmt <= 3:  # ISO-BMFF
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1mp41")
        mvhd_ts = 1000
        w = int(rng.integers(160, 1920))
        h = int(rng.integers(120, 1080))
        vts = int(rng.integers(1, 5)) * 12288  # video media timescale
        ats = int(rng.choice([8000, 16000, 22050, 44100, 48000]))
        ch = int(rng.integers(1, 3))
        vdur = int(rng.integers(1, 90)) * vts // 3 + int(rng.integers(0, vts))
        adur = int(rng.integers(1, 90)) * ats // 3 + int(rng.integers(0, ats))
        traks = b""
        if fmt in (0, 2, 3):
            traks += _trak(1, "vide", b"hvc1" if fmt == 3 else b"avc1", w, h, 0, 0,
                           vts, vdur, mvhd_ts, mdhd_v1=(fmt == 3))
        if fmt in (1, 2):
            traks += _trak(2 if fmt == 2 else 1, "soun", b"mp4a", 0, 0, ch, ats,
                           ats, adur, mvhd_ts, mdhd_v1=False)
        movie_dur = max((vdur * mvhd_ts) // vts if fmt != 1 else 0,
                        (adur * mvhd_ts) // ats if fmt in (1, 2) else 0)
        moov = _box(b"moov", _mvhd(mvhd_ts, movie_dur) + traks)
        mdat = _box(b"mdat", rng.integers(0, 256, size=int(rng.integers(16, 200))).astype(np.uint8).tobytes(),
                    largesize=(fmt == 3))
        free = _box(b"free", b"\x00" * int(rng.integers(0, 12)))
        return ftyp + moov + free + mdat
    serial = int(rng.integers(1, 2**31 - 1))
    if fmt == 4:  # Ogg Vorbis
        rate = int(rng.choice([8000, 11025, 22050, 44100, 48000]))
        ch = int(rng.integers(1, 3))
        ident = (b"\x01vorbis" + struct.pack("<IB", 0, ch) + struct.pack("<Iiii", rate, 0, 0, 0)
                 + bytes([(8 << 4) | 6]) + b"\x01")  # blocksizes 2^6/2^8, framing bit
        n_samples = int(rng.integers(1, 200)) * rate // 10
        pages = _ogg_page(serial, 0, 0, 0x02, [ident])  # BOS
        pages += _ogg_page(serial, 1, n_samples,
                           0x04, [rng.integers(0, 256, size=int(rng.integers(20, 120))).astype(np.uint8).tobytes()])
        return pages
    # Ogg Opus (RFC 7845 §5.1) — granule position is ALWAYS 48 kHz
    ch = int(rng.integers(1, 3))
    input_rate = int(rng.choice([8000, 16000, 24000, 48000]))
    pre_skip = int(rng.integers(0, 3841))
    ident = (b"OpusHead" + bytes([1, ch]) + struct.pack("<HIhB", pre_skip, input_rate, 0, 0))
    n48 = pre_skip + int(rng.integers(1, 200)) * 4800
    pages = _ogg_page(serial, 0, 0, 0x02, [ident])
    pages += _ogg_page(serial, 1, n48,
                       0x04, [rng.integers(0, 256, size=int(rng.integers(20, 120))).astype(np.uint8).tobytes()])
    return pages


def container_payload_df(df):
    """(url, seed) -> (url, payload) with genuine MP4/Ogg bytes; same
    executor-side pure-function contract as ``payload_df``."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame({
                "url": pdf["url"].to_numpy(),
                "payload": [container_payload_for(int(s)) for s in pdf["seed"].to_numpy()],
            })

    return df.select("url", "seed").mapInPandas(run, schema="url string, payload binary")
