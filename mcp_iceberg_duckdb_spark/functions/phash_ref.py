"""Independent reference implementation of the pHash pipeline —
the certificate-oracle twin for the multimodal queries (VERDICT
round-9 "Next round" item 2: the oracles previously reused
functions/phash.py's own `phash64`/`planted_gray`, so a defect
inside the hash would have passed both sides).

This module re-derives every step from the WRITTEN SPEC (the
docstrings in functions/phash.py, which are themselves the public
pHash algorithm + this repo's documented corpus construction) using
deliberately different computational routes, and imports NOTHING
from functions/phash.py:

- 2-D DCT-II: direct double-sum from the textbook definition
  X[k,l] = a(k) a(l) sum_m sum_n x[m,n] cos(pi (2m+1) k / 2N)
  cos(pi (2n+1) l / 2N), evaluated coefficient-by-coefficient —
  not the orthonormal-matrix sandwich (C @ x @ C.T) the engine uses.
- area-mean resample: np.add.reduceat along both axes, not
  reshape(...).mean(...).
- median: manual midpoint of the sorted 64 coefficients, not
  np.median.
- planted corpus: the synthesis (inverse-DCT) sum evaluated as a
  tensor contraction over the 8x8 low-frequency block, not the
  matrix inverse transform.
- banding / hamming: int.bit_count and an explicit shift loop.

Round 11 closes the last shared-fate corner (VERDICT r10 item 8):
DECODING now goes through functions/jpeg_ref.py — a second, from-spec
JPEG (baseline + progressive successive approximation, T.81 Annex
F/G procedures) and PNG (RFC 2083 unfiltering) implementation that
imports nothing from the engine codecs. The only engine-codec calls
left are the ENCODERS, and those are corpus construction: the twin
must hash the same payload bytes the engine pipeline stores, so the
encoder is the system under test's input, not shared verification
logic — and a spec-violating encode is caught anyway, because the
independent decoder would reconstruct different pixels than the
engine decoder (cross-checked bit-identical in
tests/test_phash_ref.py). Equivalence of this twin with the engine
implementation, and the mutation tests proving deliberate engine
hash AND decoder bugs are CAUGHT by this twin, live in
tests/test_phash_ref.py.

Same pattern as the f_url_parse RE2 twin (scalars_extra.py)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

# spec constants (re-stated from the documented algorithm, not
# imported: 32x32 resample, 8x8 low-frequency block, 16-bit bands,
# 64x64 planted source, +-40 spectrum amplitude, a near-dup every 50
# docs as a +8 brightness shift of its predecessor)
_SIZE = 32
_BLOCK = 8
_BAND_BITS = 16
_GEN = 64
_AMP = 40.0
_STRIDE = 50
_SHIFT = 8
_JPEG_Q = 95


def _block_mean_ref(gray: np.ndarray) -> np.ndarray:
    """Area-mean resample to 32x32 via add.reduceat on both axes."""
    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    if h % _SIZE or w % _SIZE or h < _SIZE or w < _SIZE:
        raise ValueError(f"image sides must be multiples of {_SIZE}")
    fy, fx = h // _SIZE, w // _SIZE
    rows = np.add.reduceat(g, np.arange(0, h, fy), axis=0)
    both = np.add.reduceat(rows, np.arange(0, w, fx), axis=1)
    return both / float(fy * fx)


def _dct_block_ref(x: np.ndarray) -> np.ndarray:
    """Top-left 8x8 of the orthonormal 2-D DCT-II of a 32x32 array,
    each coefficient evaluated by the textbook double sum."""
    n = _SIZE
    m = np.arange(n)
    out = np.empty((_BLOCK, _BLOCK), dtype=np.float64)
    for k in range(_BLOCK):
        ak = math.sqrt((1.0 if k == 0 else 2.0) / n)
        ck = np.cos(math.pi * (2 * m + 1) * k / (2 * n))
        for l in range(_BLOCK):  # noqa: E741
            al = math.sqrt((1.0 if l == 0 else 2.0) / n)
            cl = np.cos(math.pi * (2 * m + 1) * l / (2 * n))
            out[k, l] = ak * al * float(ck @ x @ cl)
    return out


def phash64_ref(gray: np.ndarray) -> int:
    """Independent 64-bit DCT pHash: resample, direct-sum DCT,
    manual median over all 64 block coefficients (incl. DC), bits
    row-major MSB-first."""
    block = _dct_block_ref(_block_mean_ref(gray)).ravel()
    s = sorted(float(v) for v in block)
    med = 0.5 * (s[31] + s[32])
    h = 0
    for v in block:
        h = (h << 1) | (1 if float(v) > med else 0)
    return h


def bands_ref(h: int) -> tuple[int, ...]:
    """16-bit LSH bands, MSB band first."""
    nb = 64 // _BAND_BITS
    return tuple(
        (h >> (_BAND_BITS * (nb - 1 - b))) & ((1 << _BAND_BITS) - 1)
        for b in range(nb)
    )


def hamming_ref(a: int, b: int) -> int:
    return (a ^ b).bit_count()


def planted_gray_ref(doc_id: int) -> np.ndarray:
    """Independent re-derivation of the documented planted corpus:
    the 64x64 image is the inverse orthonormal DCT of an md5-seeded
    +-40 sign spectrum on the 8x8 low-frequency block (DC zeroed,
    base 128); doc_id % 50 == 1 reuses doc_id - 1's spectrum shifted
    +8. Synthesis evaluated as the textbook reconstruction sum
    x[m,n] = sum_kl a(k) a(l) S[k,l] cos(..k..) cos(..l..)."""
    did = int(doc_id)
    is_dup = did % _STRIDE == 1 and did > 0
    seed = did - 1 if is_dup else did
    digest = hashlib.md5(f"phash-asset:{seed}".encode()).digest()
    bits = [(digest[i // 8] >> (7 - i % 8)) & 1 for i in range(64)]
    spec = (np.array(bits, dtype=np.float64) * 2.0 - 1.0).reshape(
        _BLOCK, _BLOCK
    ) * _AMP
    spec[0, 0] = 0.0
    m = np.arange(_GEN)
    cos_k = np.stack(
        [
            math.sqrt((1.0 if k == 0 else 2.0) / _GEN)
            * np.cos(math.pi * (2 * m + 1) * k / (2 * _GEN))
            for k in range(_BLOCK)
        ]
    )
    img = np.einsum("kl,km,ln->mn", spec, cos_k, cos_k)
    img = 128.0 + img + (_SHIFT if is_dup else 0)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def jpeg_phash_ref(doc_id: int) -> int:
    """The lossy-robustness twin: independent generator -> engine
    JPEG q95 encode (corpus construction, see module docstring) ->
    INDEPENDENT decode (functions/jpeg_ref.py) -> independent pHash
    of the reconstructed pixels."""
    from mcp_iceberg_duckdb_spark.functions.jpeg import encode_jpeg
    from mcp_iceberg_duckdb_spark.functions.jpeg_ref import (
        decode_jpeg_ref,
    )

    g = planted_gray_ref(doc_id)
    d = decode_jpeg_ref(
        encode_jpeg(g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_Q)
    )
    return phash64_ref(
        np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
            d["height"], d["width"]
        )
    )


def mixed_phash_ref(doc_id: int) -> int:
    """Twin of the mixed-codec pipeline: independent generator +
    independent pHash + INDEPENDENT decoders around the engine
    encoders (corpus construction; doc_id % 3: 0 -> PNG, 1 ->
    baseline JPEG q95, 2 -> progressive JPEG q95)."""
    from mcp_iceberg_duckdb_spark.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from mcp_iceberg_duckdb_spark.functions.jpeg_ref import (
        decode_jpeg_ref,
        decode_png_ref,
    )
    from mcp_iceberg_duckdb_spark.functions.png import encode_png

    did = int(doc_id)
    g = planted_gray_ref(did)
    f = did % 3
    if f == 0:
        payload = encode_png(g.shape[1], g.shape[0], g.tobytes(), "L")
    elif f == 1:
        payload = encode_jpeg(
            g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_Q
        )
    else:
        payload = encode_jpeg_progressive(
            g.shape[1], g.shape[0], g.tobytes(), "L", _JPEG_Q
        )
    d = (
        decode_jpeg_ref(payload)
        if payload[:2] == b"\xff\xd8"  # SOI — re-stated, not imported
        else decode_png_ref(payload)
    )
    return phash64_ref(
        np.frombuffer(d["pixels"], dtype=np.uint8).reshape(
            d["height"], d["width"]
        )
    )


def reference_phash_pairs_ref(
    doc_ids, max_hamming: int, hash_fn=None
) -> list[tuple[int, int, int]]:
    """Expected banded-hamming dedup pairs, fully on the independent
    twin: hash every doc (planted_gray_ref + phash64_ref unless
    hash_fn overrides, e.g. jpeg_phash_ref), bucket by 16-bit band,
    verify candidates at <= max_hamming. Banding keeps the reference
    corpus-linear so the decade (sf1) oracle stays tractable.
    Returns sorted (asset_a, asset_b, hamming)."""
    if hash_fn is None:
        hash_fn = lambda d: phash64_ref(planted_gray_ref(d))  # noqa: E731
    hashes = {int(d): hash_fn(int(d)) for d in doc_ids}
    buckets: dict[tuple[int, int], list[int]] = {}
    for a, h in hashes.items():
        for band, bval in enumerate(bands_ref(h)):
            buckets.setdefault((band, bval), []).append(a)
    out: set[tuple[int, int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i, a in enumerate(ids):
            ha = hashes[a]
            for b in ids[i + 1 :]:
                hd = hamming_ref(ha, hashes[b])
                if hd <= max_hamming:
                    out.add((a, b, hd))
    return sorted(out)


def brightness_stats_ref(doc_id: int) -> tuple[float, int]:
    """Independent per-asset (mean, milli-quantized std) for the
    brightness-profile oracle: explicit two-pass sum formulation."""
    g = planted_gray_ref(doc_id).astype(np.float64)
    n = g.size
    mean = float(g.sum()) / n
    var = float(((g - mean) ** 2).sum()) / n
    std_milli = int(math.floor(math.sqrt(var) * 1000.0 + 0.5))
    return mean, std_milli
