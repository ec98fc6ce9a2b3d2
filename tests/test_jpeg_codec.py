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
    encode_jpeg_progressive,
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
    # arithmetic-coded (SOF9) must be rejected, not mis-decoded
    # (progressive SOF2 is decoded as of round 10)
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(
            b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
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


@pytest.mark.parametrize("subsampling", ["444", "422", "440", "420"])
def test_subsampled_rgb_roundtrip(subsampling):
    """MCU-interleaved chroma subsampling round-trips through our own
    decoder: 4:2:2 (h2v1) and 4:4:0 (h1v2) — the web-corpus layouts
    VERDICT r9 flagged as rejected — plus 4:2:0, on smooth content
    where box-downsample + nearest-upsample error stays small. Odd
    dims force partial MCUs on both axes."""
    h, w = 37, 51
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [
            128 + 55 * np.cos(xx / 9),
            128 + 55 * np.cos(yy / 11),
            128 + 35 * np.cos((xx + yy) / 13),
        ],
        axis=-1,
    ).astype(np.uint8)
    j = encode_jpeg(w, h, arr.tobytes(), "RGB", 95, subsampling=subsampling)
    d = decode_jpeg(j)
    assert (d["width"], d["height"], d["mode"]) == (w, h, "RGB")
    out = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 3.0, f"{subsampling}: mean err {err.mean()}"
    assert err.max() <= 24, f"{subsampling}: max err {err.max()}"


def test_subsampling_shrinks_stream():
    """4:2:0 carries 1/2 the chroma blocks of 4:4:4 — the stream must
    actually shrink (proves the subsampled scan layout is emitted,
    not just the header byte)."""
    h, w = 48, 48
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [128 + 50 * np.cos(xx / 5), 128 + 50 * np.cos(yy / 6), xx % 200],
        axis=-1,
    ).astype(np.uint8)
    s444 = len(encode_jpeg(w, h, arr.tobytes(), "RGB", 90, subsampling="444"))
    s420 = len(encode_jpeg(w, h, arr.tobytes(), "RGB", 90, subsampling="420"))
    assert s420 < s444


def test_fill_bytes_and_stray_markers_skipped():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker, and
    TEM (0x01) is a standalone marker with no length — both appear in
    real encoders' output and must not derail segment parsing."""
    j = encode_jpeg(16, 8, bytes(128), "L")
    assert j[:2] == b"\xff\xd8"
    # inject fill bytes + a TEM marker right after SOI
    padded = j[:2] + b"\xff\xff\xff" + j[2:3] + j[3:]  # fills before APP0
    padded = padded[:2] + b"\xff\x01" + padded[2:]  # TEM after SOI
    d = decode_jpeg(padded)
    ref = decode_jpeg(j)
    assert d["pixels"] == ref["pixels"]


def test_corrupt_sos_raises_valueerror():
    """Contract (ADVICE r9): an SOS naming a component absent from
    SOF0, or an SOS before any SOF0, must raise ValueError — not
    StopIteration/TypeError."""
    j = bytearray(encode_jpeg(8, 8, bytes(64), "L"))
    sos = j.find(b"\xff\xda")
    assert sos > 0
    bad = bytearray(j)
    bad[sos + 5] = 9  # scan references component id 9, SOF0 has id 1
    with pytest.raises(ValueError, match="absent from SOF0"):
        decode_jpeg(bytes(bad))
    sof = j.find(b"\xff\xc0")
    no_sof = bytes(j[:sof]) + bytes(j[sos:])  # drop the SOF0 segment
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(no_sof)


def test_bitreader_acc_stays_bounded():
    """ADVICE r9: _BitReader must not accumulate the whole entropy
    stream in acc (quadratic decode). After any number of reads the
    live accumulator is at most one byte."""
    from mcp_iceberg_duckdb_spark.functions.jpeg import _BitReader

    data = bytes([0x5A] * 100_000)
    r = _BitReader(data, 0)
    for _ in range(400_000):
        r.read_bit()
    assert r.acc < 256, f"acc grew to {r.acc.bit_length()} bits"


@pytest.mark.parametrize(
    "mode,subsampling", [("L", "444"), ("RGB", "444"), ("RGB", "420"), ("RGB", "422")]
)
@pytest.mark.parametrize("quality", [30, 90])
def test_progressive_bit_identical_to_baseline(mode, subsampling, quality):
    """Progressive (SOF2) decoding: a progressive stream carries the
    SAME quantized coefficients as the equivalent baseline stream, so
    decoding must produce BIT-IDENTICAL pixels — the strongest
    possible differential between the two entropy pipelines (DC
    first/refine + per-band AC first/refine with EOB runs vs one
    sequential scan). Odd dims force partial MCUs; noise forces ZRL
    and correction-bit paths."""
    h, w = 37, 51
    ch = 1 if mode == "L" else 3
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.clip(
        rng.randint(60, 196, size=(1, 1, ch))
        + (40 * np.cos(xx / 5) * np.cos(yy / 6))[..., None]
        + rng.randint(-20, 21, size=(h, w, ch)),
        0,
        255,
    ).astype(np.uint8)
    base = decode_jpeg(
        encode_jpeg(w, h, arr.tobytes(), mode, quality, subsampling=subsampling)
    )
    prog = decode_jpeg(
        encode_jpeg_progressive(
            w, h, arr.tobytes(), mode, quality, subsampling=subsampling
        )
    )
    assert prog["mode"] == base["mode"]
    assert prog["pixels"] == base["pixels"]


def test_progressive_long_eob_runs():
    """A flat image's AC scans are one cross-block EOB run (63 blocks
    -> EOBn symbol with run > 1) — exercises the decoder's
    eobrun-skip path in both first and refinement scans; a wide
    gradient exercises DC-heavy streams."""
    flat = np.full((64, 64), 77, dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(64, 64, flat.tobytes(), "L", 90))[
            "pixels"
        ]
        == decode_jpeg(encode_jpeg(64, 64, flat.tobytes(), "L", 90))["pixels"]
    )
    grad = np.tile(np.arange(256, dtype=np.uint8), (64, 1))
    assert (
        decode_jpeg(encode_jpeg_progressive(256, 64, grad.tobytes(), "L", 40))[
            "pixels"
        ]
        == decode_jpeg(encode_jpeg(256, 64, grad.tobytes(), "L", 40))["pixels"]
    )


def test_progressive_truncation_contract():
    """Progressive streams are renderable prefixes BY DESIGN: a cut
    may (a) raise ValueError (mid-entropy / mid-segment) or (b) decode
    to a full-size image from the scans received so far (partial
    refinement). Nothing else — no IndexError/KeyError/struct.error
    may escape, and any successful decode must be full-size."""
    arr = np.clip(
        128 + 60 * np.cos(np.mgrid[0:24, 0:24][1] / 4), 0, 255
    ).astype(np.uint8)
    j = encode_jpeg_progressive(24, 24, arr.tobytes(), "L", 90)
    full = decode_jpeg(j)
    partial_ok = 0
    for cut in range(2, len(j) - 1):
        try:
            d = decode_jpeg(j[:cut])
        except ValueError:
            continue
        partial_ok += 1
        assert (d["width"], d["height"]) == (full["width"], full["height"])
    assert partial_ok < len(j) - 3  # some cuts must still fail


def test_progressive_pil_crosscheck_when_available():
    """When PIL exists: decode PIL's own progressive output (the
    real-world bitstream, optimized tables + its scan script) and
    check our encoder's progressive stream decodes in PIL."""
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
    buf = io.BytesIO()
    Image.fromarray(arr).save(
        buf, format="JPEG", quality=95, progressive=True
    )
    d = decode_jpeg(buf.getvalue())
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(40, 56, 3)
    assert np.abs(got.astype(int) - arr.astype(int)).max() <= 40
    ours = encode_jpeg_progressive(56, 40, arr.tobytes(), "RGB", 95)
    pil_out = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert np.abs(pil_out.astype(int) - arr.astype(int)).max() <= 12


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
