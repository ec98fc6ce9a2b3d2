"""Vendored pure-python PNG codec (functions/png.py): spec-derived
filter vectors, encode/decode roundtrips, and corrupt-input behavior.
The filter reconstruction tests hand-assemble IDAT streams per the
PNG spec (§9 filter definitions) so the decoder is checked against
the SPECIFICATION, not against this repo's own encoder."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_iceberg_duckdb_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
)

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_from_raw(width, height, color_type, raw_scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_rgb():
    px = bytes((i * 7) % 256 for i in range(2 * 3 * 3))
    payload = encode_png(3, 2, px, "RGB")
    assert is_png(payload)
    d = decode_png(payload)
    assert (d["width"], d["height"], d["mode"]) == (3, 2, "RGB")
    assert d["pixels"] == px


@pytest.mark.parametrize("mode,ch", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
def test_roundtrip_all_modes(mode, ch):
    w, h = 5, 4
    px = bytes((i * 31 + 7) % 256 for i in range(w * h * ch))
    d = decode_png(encode_png(w, h, px, mode))
    assert (d["width"], d["height"], d["mode"]) == (w, h, mode)
    assert d["pixels"] == px


def test_filter_sub_spec_vector():
    # greyscale 4x1, filter 1 (Sub): recon(x) = raw(x) + recon(x-bpp)
    # encoded deltas 10, 5, 5, 5 -> pixels 10, 15, 20, 25
    raw = bytes([1, 10, 5, 5, 5])
    d = decode_png(_png_from_raw(4, 1, 0, raw))
    assert d["pixels"] == bytes([10, 15, 20, 25])


def test_filter_up_spec_vector():
    # greyscale 3x2: row0 None = [1,2,3]; row1 Up deltas [10,10,10]
    # -> row1 pixels [11,12,13]
    raw = bytes([0, 1, 2, 3]) + bytes([2, 10, 10, 10])
    d = decode_png(_png_from_raw(3, 2, 0, raw))
    assert d["pixels"] == bytes([1, 2, 3, 11, 12, 13])


def test_filter_average_spec_vector():
    # greyscale 2x2: row0 None = [2, 4]; row1 Average deltas [9, 10]
    # recon(0) = 9 + (0 + 2)//2 = 10; recon(1) = 10 + (10 + 4)//2 = 17
    raw = bytes([0, 2, 4]) + bytes([3, 9, 10])
    d = decode_png(_png_from_raw(2, 2, 0, raw))
    assert d["pixels"] == bytes([2, 4, 10, 17])


def test_filter_paeth_spec_vector():
    # greyscale 2x2: row0 None = [10, 20]; row1 Paeth deltas [5, 5].
    # x=0: a=0,b=10,c=0 -> p=10, predictor=b=10 -> 15
    # x=1: a=15,b=20,c=10 -> p=25; pa=10,pb=5,pc=15 -> b=20 -> 25
    raw = bytes([0, 10, 20]) + bytes([4, 5, 5])
    d = decode_png(_png_from_raw(2, 2, 0, raw))
    assert d["pixels"] == bytes([10, 20, 15, 25])


def test_corrupt_inputs_raise_valueerror():
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8\xff jpeg")
    with pytest.raises(ValueError):
        decode_png(_SIG + b"\x00\x00")  # truncated after signature
    # IDAT byte count inconsistent with IHDR dims
    raw = bytes([0, 1, 2, 3])  # one 3-px row, but IHDR claims 2 rows
    with pytest.raises(ValueError):
        decode_png(_png_from_raw(3, 2, 0, raw))
    # interlaced flagged -> unsupported, must raise not mis-decode
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", zlib.compress(bytes([0, 0]))
    ) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)


def test_crc_mismatch_raises():
    """Length-consistent payload corruption must raise, not decode to
    garbage — the docstring's 'raises on corrupt data' contract
    (round-8 ADVICE finding: chunks were not CRC-verified)."""
    payload = bytearray(encode_png(3, 2, bytes(range(18)), "RGB"))
    # flip one bit inside the IDAT *data* (past the 8-byte sig, the
    # 25-byte IHDR chunk, and the new chunk's 8-byte header)
    idat_pos = payload.index(b"IDAT")
    payload[idat_pos + 4 + 5] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    mode=st.sampled_from(["L", "LA", "RGB", "RGBA"]),
    data=st.data(),
)
def test_roundtrip_property(w, h, mode, data):
    ch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    d = decode_png(encode_png(w, h, px, mode))
    assert d["pixels"] == px and (d["width"], d["height"]) == (w, h)


def test_pil_crosscheck_when_available():
    """When PIL exists, its decode of our encoder's output must agree
    — the encoder emits spec-conforming files, not just files our own
    decoder accepts."""
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL not in this container")
    import io

    px = bytes((i * 13) % 256 for i in range(6 * 4 * 3))
    payload = encode_png(6, 4, px, "RGB")
    with Image.open(io.BytesIO(payload)) as img:
        assert (img.width, img.height) == (6, 4)
        assert img.tobytes() == px
