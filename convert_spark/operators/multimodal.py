"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task-brief requirement: treat image/audio/video as opaque ``binary``
columns; implement decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages. Two decode paths:

* ``deterministic_fake=True`` (default for the oracle-checked queries):
  a seeded, content-hash-derived fake decode, so the Spark-side plumbing
  — schema, partitioning, UDF signature, Arrow batch shape — is real and
  tested with an independent DuckDB oracle.
* ``deterministic_fake=False``: REAL header decode for the formats the
  Python stdlib can parse — PNG (IHDR width/height + color-type channel
  count), JPEG (SOF marker scan), WAV (the ``wave`` module; width =
  frames per channel, height = sample rate) — and NotImplementedError
  for every other format, where a full codec (Pillow/ffmpeg/pyav) would
  be invoked on a real cluster. Pixel/sample DECODING (resize, frame
  raster extraction) remains stubbed for the same reason.
"""

from __future__ import annotations

import hashlib
import io
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "url string, media_kind string, n_bytes long, width int, height int, "
    "n_channels int, sha256 string"
)
FEATURE_SCHEMA = "url string, feat array<float>"
FRAME_SCHEMA = "url string, frame_idx int, frame_sha string"


def _fake_dims(digest: bytes) -> tuple[int, int, int]:
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    c = 1 + digest[2] % 3
    return w, h, c


# PNG color type -> channel count (PNG spec, IHDR)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers that carry frame dimensions (not DHT/DAC/RST/...)
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def _decode_png(data: bytes) -> tuple[str, int, int, int]:
    if len(data) < 26 or data[12:16] != b"IHDR":
        raise NotImplementedError("malformed PNG: no IHDR at canonical offset")
    w, h = struct.unpack(">II", data[16:24])
    color_type = data[25]
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type} unsupported")
    return "png", w, h, _PNG_CHANNELS[color_type]


def _decode_jpeg(data: bytes) -> tuple[str, int, int, int]:
    pos = 2  # past SOI
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1  # fill byte (spec: any number of 0xFF pads precede a marker)
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers, no length
            continue
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF:
            if pos + 10 > len(data):  # truncated mid-SOF
                break
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            n_comp = data[pos + 9]
            return "jpeg", w, h, n_comp
        pos += 2 + seg_len
    raise NotImplementedError("malformed JPEG: no SOF marker found")


def _decode_wav(data: bytes) -> tuple[str, int, int, int]:
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        # audio mapping onto the image-shaped schema (documented):
        # width = frames per channel, height = sample rate
        return "wav", wf.getnframes(), wf.getframerate(), wf.getnchannels()


def decode_real(data: bytes) -> tuple[str, int, int, int]:
    """Sniff + header-decode one payload via stdlib: (kind, width, height,
    n_channels). NotImplementedError for formats needing a real codec AND
    for malformed payloads of the supported formats — one declared
    exception type, so a corrupt payload can never kill a Spark task with
    an undeclared struct.error/wave.Error."""
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png(data)
        if data[:3] == b"\xff\xd8\xff":
            return _decode_jpeg(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _decode_wav(data)
    except NotImplementedError:
        raise
    except Exception as exc:  # noqa: BLE001 — truncated/corrupt headers
        raise NotImplementedError(f"malformed media payload: {exc}") from exc
    # STUB: full codec call site (Pillow / soundfile / pyav) for formats
    # the stdlib cannot parse
    raise NotImplementedError("media codec unavailable in this container for this format")


def decode_media(df: DataFrame, binary_col: str = "html", kind: str = "image", deterministic_fake: bool = True) -> DataFrame:
    """Decode stage: binary -> typed metadata row per payload. With
    ``deterministic_fake=False``, PNG/JPEG/WAV headers are decoded for
    real (stdlib; media_kind reports the sniffed format) and other
    formats raise NotImplementedError."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if not deterministic_fake:
                payloads = [bytes(p) if p is not None else b"" for p in pdf[binary_col]]
                decoded = [decode_real(d) for d in payloads]  # per-payload by nature
                yield pd.DataFrame(
                    {
                        "url": pdf["url"].to_numpy(),
                        "media_kind": [d[0] for d in decoded],
                        "n_bytes": np.fromiter(map(len, payloads), dtype=np.int64, count=len(payloads)),
                        "width": np.fromiter((d[1] for d in decoded), dtype=np.int32, count=len(decoded)),
                        "height": np.fromiter((d[2] for d in decoded), dtype=np.int32, count=len(decoded)),
                        "n_channels": np.fromiter((d[3] for d in decoded), dtype=np.int32, count=len(decoded)),
                        "sha256": [hashlib.sha256(d).hexdigest() for d in payloads],
                    }
                )
                continue
            # hashing is inherently per-payload; everything else is columnar
            payloads = [bytes(p) if p is not None else b"" for p in pdf[binary_col]]
            digests = [hashlib.sha256(d).digest() for d in payloads]
            dig = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 32)
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "media_kind": kind,
                    "n_bytes": np.fromiter(map(len, payloads), dtype=np.int64, count=len(payloads)),
                    "width": (64 + dig[:, 0] % 192).astype(np.int32),
                    "height": (64 + dig[:, 1] % 192).astype(np.int32),
                    "n_channels": (1 + dig[:, 2] % 3).astype(np.int32),
                    "sha256": [d.hex() for d in digests],
                }
            )

    return df.select("url", binary_col).mapInPandas(run, schema=DECODE_SCHEMA)


def extract_features(df: DataFrame, binary_col: str = "html", dim: int = 16, deterministic_fake: bool = True) -> DataFrame:
    """Feature-extract stage: binary -> fixed-dim float vector (fake: bytes
    of the sha256 digest scaled to [0,1); real: a vision/audio encoder)."""

    def run(batches):
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("encoders unavailable in this container")
            if not len(pdf):
                continue
            payloads = [bytes(p) if p is not None else b"" for p in pdf[binary_col]]
            digests = [
                hashlib.sha256(d).digest() + hashlib.sha256(d + b"x").digest() for d in payloads
            ]
            dig = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 64)
            feats = (dig[:, :dim] / 255.0).astype(np.float32)  # one vectorized pass
            yield pd.DataFrame({"url": pdf["url"].to_numpy(), "feat": list(feats)})

    return df.select("url", binary_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, binary_col: str = "html", n_frames: int = 3, deterministic_fake: bool = True) -> DataFrame:
    """Frame-sample stage (video semantics): one output row per sampled
    frame — demonstrates the 1->N Arrow fan-out shape."""

    def run(batches):
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("video decoding unavailable in this container")
            if not len(pdf):
                continue
            payloads = [bytes(p) if p is not None else b"" for p in pdf[binary_col]]
            # 1->N fan-out assembled columnar: repeat/tile index arrays, one
            # DataFrame per batch (per-item hashing is the only Python loop)
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf["url"].to_numpy(), n_frames),
                    "frame_idx": np.tile(np.arange(n_frames, dtype=np.int32), len(payloads)),
                    # ASCII frame salt (not bytes([i])): keeps the fake's
                    # hash chain expressible in the plain-SQL oracle
                    # (DuckDB sha256 is VARCHAR-only; NUL bytes don't
                    # survive VARCHAR concat)
                    "frame_sha": [
                        hashlib.sha256(d + str(i).encode()).hexdigest()[:16]
                        for d in payloads
                        for i in range(n_frames)
                    ],
                }
            )

    return df.select("url", binary_col).mapInPandas(run, schema=FRAME_SCHEMA)
