"""Independent scalar re-implementations of the text-sketch and ANN
kernels, used ONLY to derive the known-answer tables (tests/gen_kats.py)
and as cross-check oracles for convert_spark.kernels.sketches /
operators.ann.

The production kernels are vectorized numpy (batch FNV vocab maps,
reduceat minhash, matmul LSH/IVF); this file is a deliberately naive
per-token / per-element scalar transliteration of the same PUBLISHED
algorithms (FNV-1a, splitmix64, universal minhash, banding, SimHash,
random-hyperplane LSH, spherical k-means IVF, XXH64) with Python ints and
math.* — so the two implementations share only the algorithm specs and
the seeded constants (numpy RandomState draws, which ARE the spec), not
code or execution strategy. gen_kats derives the KAT parquets from THESE
functions; agreement with the engine is what the driver's correctness
gate then certifies.

Float caveat: cosine sums here are sequential left-to-right, matching the
JVM ``aggregate`` fold the production rerank uses; k-means row sums are
plain sequential Python (numpy uses pairwise summation), so centroid
coordinates may differ from production in the last ulp — the discrete
outputs (assignments, candidates, 6dp-rounded ranks) are insensitive to
this on non-degenerate data, and gen_kats verifies exact equality of the
final tables.
"""

from __future__ import annotations

import hashlib
import math
import struct
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

_M64 = (1 << 64) - 1
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_P31 = (1 << 31) - 1


def fnv1a64_s(data: bytes) -> int:
    h = _FNV_OFFSET
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _M64
    return h


# public FNV-1a test vectors (draft-eastlake-fnv): "" and "a"
assert fnv1a64_s(b"") == 0xCBF29CE484222325
assert fnv1a64_s(b"a") == 0xAF63DC4C8601EC8C


def splitmix64_s(v: int) -> int:
    z = (v * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return z


def shingle_hash_set_s(text: str, k: int = 3) -> list[int]:
    """Sorted unique uint64 word-k-shingle hashes (scalar twin of
    sketches.shingle_hashes): FNV-1a word hashes, rolling
    acc = acc*FNV_PRIME ^ wh combine over the k-window, splitmix64
    finish. < k words hash the full token list; empty text -> [0]
    (the production zero sentinel is NOT mixed)."""
    toks = str(text).split()
    if not toks:
        return [0]
    wh = [fnv1a64_s(w.encode("utf-8")) for w in toks]
    kk = min(k, len(wh))
    out = set()
    for start in range(len(wh) - kk + 1):
        acc = 0
        for j in range(kk):
            acc = ((acc * _FNV_PRIME) & _M64) ^ wh[start + j]
        out.add(splitmix64_s(acc))
    return sorted(out)


def _minhash_params(n: int = 64, seed: int = 42):
    """The seeded universal-hash constants — the numpy draws ARE the spec
    (two sequential randint calls on RandomState(seed))."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _P31, size=n, dtype=np.int64)
    b = rng.randint(0, _P31, size=n, dtype=np.int64)
    return [int(v) for v in a], [int(v) for v in b]


def minhash_signature_s(text: str, num_perm: int = 64, k: int = 3, seed: int = 42) -> list[int]:
    a, b = _minhash_params(num_perm, seed)
    xs = [h >> 33 for h in shingle_hash_set_s(text, k)]  # 31-bit
    sig = []
    for i in range(num_perm):
        best = None
        for x in xs:
            v = (a[i] * x + b[i]) % _P31
            if best is None or v < best:
                best = v
        sig.append(best)
    return sig


def lsh_band_keys_s(sig: list[int], bands: int = 16) -> list[int]:
    """Band keys: FNV-1a over the band's int64 values as little-endian
    bytes plus the band index byte, masked to 63 bits."""
    rows = len(sig) // bands
    keys = []
    for bidx in range(bands):
        chunk = sig[bidx * rows : (bidx + 1) * rows]
        data = b"".join(struct.pack("<q", v) for v in chunk) + bytes([bidx])
        keys.append(fnv1a64_s(data) & 0x7FFFFFFFFFFFFFFF)
    return keys


def simhash64_s(text: str) -> int:
    toks = str(text).split()
    if not toks:
        return 0
    votes = [0] * 64
    for w in toks:
        h = fnv1a64_s(w.encode("utf-8"))
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    sh = 0
    for bit in range(64):
        if votes[bit] > 0:
            sh |= 1 << bit
    return sh & 0x7FFFFFFFFFFFFFFF


def fingerprint64_s(text: str) -> int:
    norm = " ".join(str(text).split())
    digest = hashlib.blake2b(norm.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF


# --- ANN twins ----------------------------------------------------------------


def round6_half_up(x: float) -> float:
    """Spark F.round(double, 6) parity: exact-binary-decimal HALF_UP."""
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def cosine_s(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right fold — the JVM ``aggregate`` order."""

    def dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc = acc + p * q
        return acc

    return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))


def hyperplanes_s(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    """The seeded hyperplane constants (spec = the RandomState draw)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_bits, dim)).astype(np.float64)
    return [[float(v) for v in row] for row in planes]


def lsh_vec_keys_s(vec: list[float], planes: list[list[float]], bands: int, bits_per_band: int) -> list[int]:
    """(band << 32) + bucket keys for one vector, scalar dot products."""
    bits = []
    for plane in planes:
        acc = 0.0
        for p, v in zip(plane, vec):
            acc += p * v
        bits.append(1 if acc > 0 else 0)
    keys = []
    for band in range(bands):
        k = 0
        for j in range(bits_per_band):
            k += bits[band * bits_per_band + j] << j
        keys.append(k + (band << 32))
    return keys


def _rank_topk(cand: dict, k: int) -> list[tuple]:
    """(query_id, ref_id, rank) rows: per query, sims rounded 6dp HALF_UP,
    rank by (sim desc, ref_id asc), keep rank <= k."""
    rows = []
    for qid in sorted(cand):
        scored = sorted(cand[qid], key=lambda t: (-t[1], t[0]))
        for rank, (rid, _s) in enumerate(scored[:k], start=1):
            rows.append((qid, rid, rank))
    return rows


def ann_lsh_topk_s(
    queries: dict, refs: dict, k: int, dim: int = 64, bands: int = 8, bits_per_band: int = 8
) -> list[tuple]:
    """Scalar twin of ann.ann_lsh_topk: queries/refs are {id: [float64]}."""
    planes = hyperplanes_s(dim, bands * bits_per_band)
    buckets: dict[int, list[int]] = {}
    for rid, vec in refs.items():
        for key in lsh_vec_keys_s(vec, planes, bands, bits_per_band):
            buckets.setdefault(key, []).append(rid)
    cand: dict[int, list[tuple]] = {}
    for qid, qv in queries.items():
        seen = set()
        for key in lsh_vec_keys_s(qv, planes, bands, bits_per_band):
            for rid in buckets.get(key, ()):
                if rid != qid and rid not in seen:
                    seen.add(rid)
                    cand.setdefault(qid, []).append((rid, round6_half_up(cosine_s(qv, refs[rid]))))
        cand.setdefault(qid, [])
    return _rank_topk(cand, k)


def xxh64_long_s(v: int, seed: int = 42) -> int:
    """Scalar XXH64 of one int64 (8 little-endian bytes) — Spark
    ``xxhash64(bigint)`` parity (validated in tests). Returns signed."""
    p1, p2, p3, p4, p5 = (
        0x9E3779B185EBCA87,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x85EBCA77C2B2AE63,
        0x27D4EB2F165667C5,
    )

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    h = (seed + p5 + 8) & _M64
    k1 = (v & _M64) * p2 & _M64
    k1 = (rotl(k1, 31) * p1) & _M64
    h ^= k1
    h = (rotl(h, 27) * p1 + p4) & _M64
    h ^= h >> 33
    h = (h * p2) & _M64
    h ^= h >> 29
    h = (h * p3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _normalize_s(vec: list[float]) -> list[float]:
    acc = 0.0
    for v in vec:
        acc += v * v
    n = math.sqrt(acc)
    return [v / n for v in vec]


def spherical_kmeans_s(mat: list[list[float]], k: int, iters: int = 8, seed: int = 42) -> list[list[float]]:
    """Scalar twin of ann._spherical_kmeans: seeded init indices from the
    same RandomState draw (the spec), sequential-sum updates."""
    rng = np.random.RandomState(seed)
    m = [_normalize_s(row) for row in mat]
    init = rng.choice(len(m), size=min(k, len(m)), replace=False)
    cent = [list(m[int(i)]) for i in init]
    dim = len(m[0])
    for _ in range(iters):
        assign = [_argmax_dot(row, cent) for row in m]
        for c in range(len(cent)):
            total = [0.0] * dim
            any_row = False
            for row, a in zip(m, assign):
                if a == c:
                    any_row = True
                    for d in range(dim):
                        total[d] += row[d]
            if any_row:
                n = math.sqrt(sum(v * v for v in total))
                if n > 0:
                    cent[c] = [v / n for v in total]
    return cent


def _argmax_dot(row: list[float], cent: list[list[float]]) -> int:
    best, best_v = 0, None
    for ci, c in enumerate(cent):
        acc = 0.0
        for a, b in zip(row, c):
            acc += a * b
        if best_v is None or acc > best_v:
            best, best_v = ci, acc
    return best


def ivf_topk_s(
    queries: dict, refs: dict, k: int, n_centroids: int = 16, n_probe: int = 4, sample_rows: int = 4096
) -> list[tuple]:
    """Scalar twin of ann.ivf_topk: the training sample is the refs sorted
    by ascending signed xxhash64(ref_id) (Spark's orderBy), truncated."""
    order = sorted(refs, key=lambda rid: (xxh64_long_s(rid), rid))[:sample_rows]
    cent = spherical_kmeans_s([refs[rid] for rid in order], n_centroids)
    r_assign: dict[int, list[int]] = {}
    for rid, vec in refs.items():
        r_assign.setdefault(_argmax_dot(_normalize_s(vec), cent), []).append(rid)
    cand: dict[int, list[tuple]] = {}
    for qid, qv in queries.items():
        qn = _normalize_s(qv)
        sims = []
        for ci, c in enumerate(cent):
            acc = 0.0
            for a, b in zip(qn, c):
                acc += a * b
            sims.append(acc)
        probes = sorted(range(len(cent)), key=lambda ci: (-sims[ci], ci))[: min(n_probe, len(cent))]
        cand.setdefault(qid, [])
        for ci in probes:
            for rid in r_assign.get(ci, ()):
                if rid != qid:
                    cand[qid].append((rid, round6_half_up(cosine_s(qv, refs[rid]))))
    return _rank_topk(cand, k)
