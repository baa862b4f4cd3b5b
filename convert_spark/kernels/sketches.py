"""Similarity sketches: MinHash (+LSH banding) and SimHash.

Dedup operators for the training-data pipeline (task brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine). Pure
numpy/pandas; Spark invokes these per Arrow batch. All hash seeds are
fixed constants so signatures are identical across runs, partitions and
cluster sizes (the reproducibility invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .textkit import fnv1a64_bytes, word_shingles

_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 32) - 1


def _hash_params(n: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n, dtype=np.int64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles -> unique uint64 hashes (FNV-1a)."""
    sh = word_shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    return np.unique(np.array([fnv1a64_bytes(s.encode("utf-8")) for s in sh], dtype=np.uint64))


def minhash_signature(text: str, num_perm: int = 64, k: int = 3, seed: int = 42) -> np.ndarray:
    """(num_perm,) int64 MinHash signature via universal hashing
    h_i(x) = (a_i * x + b_i) mod p, min over shingles."""
    hs = shingle_hashes(text, k).astype(np.object_)  # python ints: exact mod-p math
    a, b = _hash_params(num_perm, seed)
    sig = np.empty(num_perm, dtype=np.int64)
    for i in range(num_perm):
        vals = (int(a[i]) * hs + int(b[i])) % _MERSENNE
        sig[i] = int(vals.min()) & _MAXH
    return sig


def minhash_signatures(texts: pd.Series, num_perm: int = 64, k: int = 3, seed: int = 42) -> np.ndarray:
    """Batch form: (N, num_perm) int64. Vectorized over permutations per doc."""
    a, b = _hash_params(num_perm, seed)
    a_o = a.astype(np.object_)
    b_o = b.astype(np.object_)
    out = np.empty((len(texts), num_perm), dtype=np.int64)
    for row, t in enumerate(texts.fillna("")):
        hs = shingle_hashes(str(t), k).astype(np.object_)
        # (num_perm, n_shingles) exact integer math, then min per perm
        vals = (a_o[:, None] * hs[None, :] + b_o[:, None]) % _MERSENNE
        out[row] = np.array([int(v) & _MAXH for v in vals.min(axis=1)], dtype=np.int64)
    return out


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into ``bands`` rows-per-band groups; each band
    hashes to a bucket key. Docs sharing any band key are candidates."""
    sig = np.asarray(sig, dtype=np.int64)
    rows = sig.size // bands
    keys = []
    for bidx in range(bands):
        chunk = sig[bidx * rows : (bidx + 1) * rows]
        h = fnv1a64_bytes(chunk.tobytes() + bytes([bidx]))
        keys.append(int(h & 0x7FFFFFFFFFFFFFFF))
    return keys


def jaccard_from_signatures(s1: np.ndarray, s2: np.ndarray) -> float:
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    return float((s1 == s2).mean())


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    out = np.empty(len(texts), dtype=np.int64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for row, t in enumerate(texts.fillna("")):
        toks = str(t).split()
        if not toks:
            out[row] = 0
            continue
        hs = np.array([fnv1a64_bytes(w.encode("utf-8")) for w in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sh = int((v > 0).astype(np.uint64) @ (np.uint64(1) << bit_idx))
        out[row] = sh & 0x7FFFFFFFFFFFFFFF
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    cnt = np.zeros_like(x, dtype=np.int64)
    while (x > 0).any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
