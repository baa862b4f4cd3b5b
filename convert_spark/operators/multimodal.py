"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task-brief requirement: treat image/audio/video as opaque ``binary``
columns; implement decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages. The actual media codecs are NOT in
this container, so the decode step is STUBBED (clearly marked): with
``deterministic_fake=True`` it produces a seeded, content-hash-derived
fake decode so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; with
``deterministic_fake=False`` it raises NotImplementedError where a codec
(Pillow/ffmpeg/...) would be invoked on a real cluster.
"""

from __future__ import annotations

import hashlib

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


def decode_media(df: DataFrame, binary_col: str = "html", kind: str = "image", deterministic_fake: bool = True) -> DataFrame:
    """Decode stage: binary -> typed metadata row per payload."""

    def run(batches):
        for pdf in batches:
            if not deterministic_fake:
                # STUB: real codec call site (Pillow / soundfile / pyav)
                raise NotImplementedError("media codecs unavailable in this container")
            if not len(pdf):
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
