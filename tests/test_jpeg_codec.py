"""Vendored baseline-JPEG codec (functions/jpeg.py): encoder/decoder
round-trips within quantization error, spec-subset gating, corrupt
input rejection, PIL cross-check when available."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_iceberg_duckdb_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _rt(w, h, arr, mode, quality=90):
    d = decode_jpeg(encode_jpeg(w, h, arr.tobytes(), mode, quality))
    assert (d["width"], d["height"], d["mode"]) == (w, h, mode)
    ch = 1 if mode == "L" else 3
    out = np.frombuffer(d["pixels"], dtype=np.uint8).astype(np.int64)
    return out.reshape(h, w, ch), arr.astype(np.int64).reshape(h, w, ch)


def test_flat_grayscale_exact():
    """A flat image has only a DC coefficient; quality-90 luma DC
    quantizer is small enough that the round-trip is exact."""
    arr = np.full((8, 16), 128, dtype=np.uint8)
    out, ref = _rt(16, 8, arr, "L")
    assert (out == ref).all()


def test_smooth_grayscale_close():
    yy, xx = np.mgrid[0:64, 0:48]
    arr = (128 + 50 * np.cos(xx / 9) * np.cos(yy / 13)).astype(np.uint8)
    out, ref = _rt(48, 64, arr, "L")
    assert np.abs(out - ref).max() <= 4


def test_rgb_roundtrip_close_and_odd_dims():
    """Non-multiple-of-8 dims force edge-replicated partial blocks;
    smooth RGB content must round-trip within a small error band."""
    h, w = 21, 35
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            128 + 60 * np.cos(xx / 7),
            128 + 60 * np.cos(yy / 9),
            128 + 40 * np.cos((xx + yy) / 11),
        ],
        axis=-1,
    ).astype(np.uint8)
    out, ref = _rt(w, h, arr, "RGB", quality=95)
    assert np.abs(out - ref).mean() < 2.0
    assert np.abs(out - ref).max() <= 12


def test_is_jpeg_and_corrupt_inputs_raise():
    assert is_jpeg(encode_jpeg(8, 8, bytes(64), "L"))
    assert not is_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 truncated")
    # progressive (SOF2) must be rejected, not mis-decoded
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(
            b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )


def test_quality_monotone_size():
    yy, xx = np.mgrid[0:32, 0:32]
    arr = (128 + 50 * np.cos(xx / 5) * np.cos(yy / 7)).astype(np.uint8)
    sizes = [
        len(encode_jpeg(32, 32, arr.tobytes(), "L", q)) for q in (30, 60, 95)
    ]
    assert sizes[0] < sizes[2], f"quality 30 not smaller than 95: {sizes}"


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    mode=st.sampled_from(["L", "RGB"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, mode, seed):
    """Any smooth-ish image round-trips without crashing and lands
    within the baseline-JPEG error envelope at quality 95."""
    ch = 1 if mode == "L" else 3
    rng = np.random.RandomState(seed)
    base = rng.randint(60, 196, size=(1, 1, ch))
    yy, xx = np.mgrid[0:h, 0:w]
    wave = (20 * np.cos(xx / 5) * np.cos(yy / 6))[..., None]
    arr = np.clip(base + wave, 0, 255).astype(np.uint8)
    out, ref = _rt(w, h, arr, mode, quality=95)
    assert np.abs(out - ref).max() <= 16


def test_pil_crosscheck_when_available():
    """When PIL exists, (a) PIL decodes our encoder's output to the
    same pixels within the error envelope and (b) we decode PIL's
    4:4:4 and 4:2:0 output."""
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not in this container")
    import io

    yy, xx = np.mgrid[0:40, 0:56]
    arr = np.stack(
        [128 + 50 * np.cos(xx / 8), 128 + 50 * np.cos(yy / 9), xx * 0 + 99],
        axis=-1,
    ).astype(np.uint8)
    ours = encode_jpeg(56, 40, arr.tobytes(), "RGB", 95)
    pil_out = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(pil_out.astype(int) - arr.astype(int)).max() <= 12
    for subsampling in (0, 2):  # 4:4:4, 4:2:0
        buf = io.BytesIO()
        Image.fromarray(arr).save(
            buf, format="JPEG", quality=95, subsampling=subsampling
        )
        d = decode_jpeg(buf.getvalue())
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(40, 56, 3)
        assert np.abs(got.astype(int) - arr.astype(int)).max() <= 40


def test_every_truncation_point_raises_valueerror():
    """Exhaustive truncation fuzz: cutting the stream at ANY byte
    must either raise ValueError (the documented corrupt-data
    contract — never IndexError/struct.error) or, ONLY when the cut
    falls after the last MCU's entropy bits (missing-EOI tail, which
    conforming decoders tolerate), produce the complete full-size
    image."""
    full = decode_jpeg(encode_jpeg(16, 16, bytes(range(256)), "L"))
    j = encode_jpeg(16, 16, bytes(range(256)), "L")
    tolerated_tail = 0
    for cut in range(2, len(j) - 1):
        try:
            d = decode_jpeg(j[:cut])
        except ValueError:
            continue
        tolerated_tail += 1
        assert d["pixels"] == full["pixels"], f"partial decode at {cut}"
    # the tolerated region is only the trailing pad/EOI bytes
    assert tolerated_tail <= 3, f"{tolerated_tail} cuts decoded"
