"""Real DCT perceptual hash + deterministic planted image corpus
(VERDICT round-8 "Next round" item 2: replace the md5 pHash stand-in
with the documented 32x32 grayscale -> DCT -> top-left 8x8
median-threshold pHash over ACTUALLY DECODED pixels).

Algorithm (the classic pHash / python-imagehash shape): grayscale,
area-mean resample to 32x32, orthonormal 2-D DCT-II, keep the
top-left 8x8 low-frequency block, threshold each coefficient against
the block median -> 64 bits (row-major, MSB first). Brightness shifts
move only the DC coefficient, so near-duplicates land at hamming ~0
while distinct images land near 32 — the semantic property a payload
md5 cannot exhibit.

The planted corpus makes that property testable end-to-end with no
image libraries: each asset's 64x64 grayscale image is synthesized as
the inverse DCT of an md5-seeded +-A sign spectrum on the 8x8
low-frequency block (zero DC, base level 128). The pHash of such an
image recovers ~the planted sign pattern, so distinct seeds give
near-uniform 64-bit hashes (pairwise hamming ~32) BY CONSTRUCTION,
while every doc_id with doc_id % 50 == 1 is generated as a +8
brightness shift of doc_id - 1's image — a planted near-duplicate
pair per 50 docs, scale-proportional like the text fixture's planted
dups.

The reference repo has no media path at all (its surface is SQL over
Iceberg, IcebergConnection.py:114-116); this backs the tier-X
multimodal extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import hashlib

import numpy as np

from mcp_iceberg_duckdb_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    is_jpeg,
)
from mcp_iceberg_duckdb_spark.functions.png import decode_png, encode_png

PH_BANDS = 4  # 4 bands x 16 bits = 64-bit hash
PH_SIZE = 32  # resample target (pHash spec)
PH_BLOCK = 8  # low-frequency block kept
_GEN_SIZE = 64  # planted source image side
_GEN_AMP = 40.0  # planted spectrum amplitude (keeps pixels in [49,207])
_DUP_STRIDE = 50  # doc_id % 50 == 1 -> near-dup of doc_id - 1
_DUP_SHIFT = 8  # brightness shift of the planted near-duplicate


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix C: (C @ x) is the 1-D DCT of x.
    C[k, j] = alpha(k) * cos(pi * (2j + 1) * k / (2n))."""
    j = np.arange(n)
    k = np.arange(n).reshape(-1, 1)
    c = np.cos(np.pi * (2 * j + 1) * k / (2 * n))
    c *= np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


_DCT32 = dct_matrix(PH_SIZE)
_DCT64 = dct_matrix(_GEN_SIZE)


def phash64(gray: np.ndarray) -> int:
    """64-bit DCT perceptual hash of a 2-D grayscale array whose
    sides are multiples of 32: area-mean resample to 32x32, 2-D DCT,
    top-left 8x8, median threshold (median over all 64 incl. DC, the
    python-imagehash convention), bits row-major MSB-first."""
    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    fy, fx = h // PH_SIZE, w // PH_SIZE
    if fy < 1 or fx < 1 or h != fy * PH_SIZE or w != fx * PH_SIZE:
        raise ValueError(f"image sides must be multiples of {PH_SIZE}")
    g = g.reshape(PH_SIZE, fy, PH_SIZE, fx).mean(axis=(1, 3))
    d = _DCT32 @ g @ _DCT32.T
    block = d[:PH_BLOCK, :PH_BLOCK].ravel()
    med = float(np.median(block))
    out = 0
    for v in block:
        out = (out << 1) | int(v > med)
    return out


def phash_bands(h: int) -> tuple[int, int, int, int]:
    """Split a 64-bit hash into four 16-bit band ints (MSB band
    first) — the banded-hamming LSH keys."""
    return tuple((h >> (16 * (3 - b))) & 0xFFFF for b in range(PH_BANDS))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _seed_signs(seed_id: int) -> np.ndarray:
    """64 deterministic +-1 signs from md5('phash-asset:<id>')."""
    d = hashlib.md5(f"phash-asset:{seed_id}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(d, dtype=np.uint8))[:64]
    return bits.astype(np.float64) * 2.0 - 1.0


def planted_gray(doc_id: int) -> np.ndarray:
    """The deterministic 64x64 uint8 grayscale image for a doc_id:
    inverse DCT of the seed's +-A sign spectrum on the low 8x8 block
    (DC zeroed, base level 128); doc_id % 50 == 1 reuses doc_id - 1's
    spectrum brightness-shifted by +8 (the planted near-duplicate —
    only the DC coefficient moves, so pHash hamming ~0)."""
    did = int(doc_id)
    is_dup = did % _DUP_STRIDE == 1 and did > 0
    seed = did - 1 if is_dup else did
    spec = np.zeros((_GEN_SIZE, _GEN_SIZE))
    spec[:PH_BLOCK, :PH_BLOCK] = (
        _seed_signs(seed).reshape(PH_BLOCK, PH_BLOCK) * _GEN_AMP
    )
    spec[0, 0] = 0.0
    img = _DCT64.T @ spec @ _DCT64  # inverse of orthonormal DCT
    img = 128.0 + img + (_DUP_SHIFT if is_dup else 0)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def planted_png(doc_id: int) -> bytes:
    """planted_gray encoded as a real grayscale PNG via the vendored
    codec — the binary payload of the multimodal asset table."""
    g = planted_gray(doc_id)
    return encode_png(g.shape[1], g.shape[0], g.tobytes(), "L")


_JPEG_QUALITY = 95  # lossy-robustness operating point (margins
# measured at q95: planted pairs <= 6, distinct >= 20, threshold 10)


def planted_jpeg(doc_id: int) -> bytes:
    """planted_gray encoded as a LOSSY baseline JPEG via the vendored
    codec — the payload of the JPEG-robustness pipeline. (The jpeg
    import is module-level: an in-body package import would execute
    on PYTHONPATH-less workers and defeat the by-value pickling.)"""
    g = planted_gray(doc_id)
    return encode_jpeg(
        g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_QUALITY
    )


def planted_mixed_payload(doc_id: int) -> bytes:
    """The mixed-codec corpus: each asset stored in the format a web
    crawl would hand you — doc_id % 3 == 0 -> lossless PNG, 1 ->
    baseline JPEG q95, 2 -> progressive JPEG q95. Planted near-dup
    pairs (ids = 0,1 mod 50) therefore land in DIFFERENT codecs, so
    matching them requires the hash to survive cross-codec decode."""
    did = int(doc_id)
    f = did % 3
    g = planted_gray(did)
    if f == 0:
        return encode_png(g.shape[1], g.shape[0], g.tobytes(), "L")
    if f == 1:
        return encode_jpeg(
            g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_QUALITY
        )
    # module-level imports only: an in-body package import would
    # execute on PYTHONPATH-less workers and defeat by-value pickling
    return encode_jpeg_progressive(
        g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_QUALITY
    )


def mixed_phash(doc_id: int) -> int:
    """pHash of a mixed-codec asset after a real sniff-and-decode
    (PNG signature vs JPEG SOI — never trusting metadata)."""
    payload = planted_mixed_payload(doc_id)
    d = decode_jpeg(payload) if is_jpeg(payload) else decode_png(payload)
    g = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
        d["height"], d["width"]
    )
    return phash64(g)


def jpeg_phash(doc_id: int) -> int:
    """The full lossy pipeline for one doc: planted image -> JPEG
    encode (q95) -> baseline decode -> pHash of the RECONSTRUCTED
    pixels. Deterministic (pure integer/float pipeline)."""
    d = decode_jpeg(planted_jpeg(doc_id))
    g = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
        d["height"], d["width"]
    )
    return phash64(g)


def reference_phash_pairs(
    doc_ids, max_hamming: int, hash_fn=None
) -> list[tuple[int, int, int]]:
    """Local reference for the banded-hamming pHash dedup: computes
    every doc's pHash straight from planted_gray (no PNG round-trip,
    no Spark — an independent data path that would catch a codec or
    plumbing corruption), buckets by 16-bit band, verifies candidates
    at <= max_hamming. Returns sorted (asset_a, asset_b, hamming).
    ``hash_fn`` overrides the per-doc hash (e.g. jpeg_phash for the
    lossy-robustness twin)."""
    if hash_fn is None:
        hash_fn = lambda d: phash64(planted_gray(d))  # noqa: E731
    hashes = {int(d): hash_fn(int(d)) for d in doc_ids}
    buckets: dict[tuple[int, int], list[int]] = {}
    for a, h in hashes.items():
        for band, bval in enumerate(phash_bands(h)):
            buckets.setdefault((band, bval), []).append(a)
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int, int]] = []
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                hd = hamming64(hashes[a], hashes[b])
                if hd <= max_hamming:
                    out.append((a, b, hd))
    out.sort()
    return out
