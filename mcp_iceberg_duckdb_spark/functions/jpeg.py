"""Minimal pure-python baseline JPEG codec (decoder + encoder) —
companion to functions/png.py, closing the "real-world multimodal
corpora are JPEG-heavy" gap (VERDICT round-8 "Next round" item 4) so
the featurizer's real decode branch covers JPEG in containers
without PIL.

Scope, deliberately small but REAL:
- decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or
  YCbCr with any power-of-two sampling dividing the max — 4:4:4,
  4:2:0 (h2v2), 4:2:2 (h2v1), 4:4:0 (h1v2), 4:1:1 — restart
  intervals, 0xFF fill bytes (T.81 B.1.1.2), standard JFIF
  YCbCr->RGB. Huffman entropy decode, dequantize, dezigzag, float
  IDCT — actual pixels out, not header fields. Progressive (SOF2),
  arithmetic coding, and 12-bit raise ValueError.
- encoder: baseline, MCU-interleaved 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0
  (or single-component grayscale), Annex K quantization tables with
  IJG quality scaling, the spec's "typical" Huffman tables (ITU-T
  T.81 §K.3). Round-trips through this decoder and through any
  conforming decoder (PIL included).

Built from the public JPEG specification (ITU-T T.81 / ISO 10918-1)
and the JFIF spec; constants below are the spec's own Annex K
tables. The reference repo has no media path at all — this backs the
tier-X multimodal extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

import numpy as np

# ---- spec constants (ITU-T T.81 Annex K) ----

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# "typical" Huffman tables, T.81 §K.3: (BITS counts per code length
# 1..16, HUFFVAL symbol list)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_mat8() -> np.ndarray:
    j = np.arange(8)
    k = np.arange(8).reshape(-1, 1)
    c = np.cos(np.pi * (2 * j + 1) * k / 16) * 0.5
    c[0] *= 1 / np.sqrt(2.0)
    return c


_C8 = _dct_mat8()  # orthonormal-scaled per JPEG convention


def is_jpeg(payload: bytes) -> bool:
    return bytes(payload[:2]) == b"\xff\xd8"


# ---- Huffman code construction (T.81 Annex C) ----


def _build_codes(bits, values):
    """(length, code) per symbol in canonical order."""
    if len(bits) < 16 or sum(bits) > len(values):
        raise ValueError("truncated/corrupt Huffman table definition")
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """{(length, code): symbol} for the decoder."""
    return {
        (ln, code): sym for sym, (ln, code) in _build_codes(bits, values).items()
    }


# ---- bit I/O ----


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST marker handled by caller
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        # _fill only runs at nbits == 0, so the live window is exactly
        # this byte — assigning (not or-ing onto stale history) keeps
        # acc bounded at 8 bits; the old `acc = (acc << 8) | b` grew
        # acc by 8 bits per entropy byte, making every shift O(stream)
        # and whole-image decode quadratic.
        self.acc = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_skip_rst(self) -> None:
        """Consume the pending RST marker at a restart boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_huffman(reader: _BitReader, table) -> int:
    length = 0
    code = 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---- decoder ----


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG. Returns {"width", "height", "mode",
    "pixels"} like decode_png: mode "L" or "RGB", pixels row-major
    interleaved bytes. Raises ValueError outside the supported
    subset or on corrupt data."""
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError) as ex:
        # truncated segments surface as short unpacks / index misses —
        # normalize to the documented corrupt-data contract
        raise ValueError(f"corrupt/truncated JPEG: {ex}") from ex


def _decode_jpeg_inner(payload: bytes) -> dict:
    d = bytes(payload)
    if not is_jpeg(d):
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = None
    comps = None  # list of (cid, h, v, tq)
    restart_interval = 0
    pos = 2
    n = len(d)
    while pos + 4 <= n:
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them so the byte after the last 0xFF is
        # read as the marker, not as segment-length payload.
        while pos + 1 < n and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        seg = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                table = _build_decode_table(bits, values)
                (huff_ac if tc else huff_dc)[th] = table
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = []  # (comp index, dc table, ac table)
            for s in range(ns):
                cs, tda = seg[1 + 2 * s : 3 + 2 * s]
                ci = next(
                    (i for i, c in enumerate(comps) if c[0] == cs), None
                )
                if ci is None:
                    raise ValueError(
                        f"SOS references component id {cs} absent from SOF0"
                    )
                scan.append((ci, tda >> 4, tda & 0xF))
            return _decode_scan(
                d,
                pos + 2 + seglen,
                width,
                height,
                comps,
                scan,
                qt,
                huff_dc,
                huff_ac,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG ended without SOS")


def _decode_scan(
    d, pos, width, height, comps, scan, qt, huff_dc, huff_ac, restart
):
    if width is None or not comps:
        raise ValueError("JPEG missing SOF0 before SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    samplings = sorted((c[1], c[2]) for c in comps)
    nc = len(comps)
    if nc == 1:
        hmax = vmax = 1
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    elif nc == 3:
        # any sampling whose factors are powers of two dividing the
        # max — covers 4:4:4 (1x1), 4:2:0 (h2v2), 4:2:2 (h2v1),
        # 4:4:0 (h1v2), 4:1:1 (h4v1). Upsampling below is generic
        # nearest-neighbor repeat by (hmax/h, vmax/v).
        for c in comps:
            if (
                c[1] not in (1, 2, 4)
                or c[2] not in (1, 2, 4)
                or hmax % c[1]
                or vmax % c[2]
            ):
                raise ValueError(f"unsupported sampling {samplings}")
    else:
        raise ValueError(f"unsupported component count {nc}")

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(d, pos)
    pred = [0] * nc
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.byte_align_skip_rst()
                pred = [0] * nc
            try:
                for ci, tdc, tac in scan:
                    _, ch, cv, tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = _decode_block(
                                reader,
                                huff_dc[tdc],
                                huff_ac[tac],
                                qt[tq],
                                pred,
                                ci,
                            )
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("restart marker misaligned with DRI")
            mcu_count += 1

    if nc == 1:
        out = np.clip(np.round(planes[0][:height, :width] + 128), 0, 255)
        return {
            "width": width,
            "height": height,
            "mode": "L",
            "pixels": out.astype(np.uint8).tobytes(),
        }
    def _upsample(plane, c):
        fy, fx = vmax // c[2], hmax // c[1]
        if fy > 1:
            plane = plane.repeat(fy, axis=0)
        if fx > 1:
            plane = plane.repeat(fx, axis=1)
        return plane

    y = _upsample(planes[0], comps[0])
    cb = _upsample(planes[1], comps[1])
    cr = _upsample(planes[2], comps[2])
    y = y[:height, :width] + 128
    cb = cb[:height, :width]
    cr = cr[:height, :width]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(p), 0, 255) for p in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "mode": "RGB",
        "pixels": rgb.tobytes(),
    }


def _decode_block(reader, dc_table, ac_table, q, pred, ci):
    zz = np.zeros(64, dtype=np.int64)
    t = _decode_huffman(reader, dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz * q
    block = coeffs.reshape(8, 8)
    return _C8.T @ block @ _C8  # IDCT (values still level-shifted)


# ---- encoder ----


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _encode_block(w: _BitWriter, block, qtab, codes_dc, codes_ac, pred, ci):
    d = _C8 @ block @ _C8.T
    zz = np.round(d.reshape(-1)[ZIGZAG] / qtab).astype(np.int64)
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = int(diff).bit_length() if diff else 0
    ln, code = codes_dc[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                ln, code = codes_ac[0x00]  # EOB
                w.write(code, ln)
                break
            run += 1
            if run == 16:
                ln, code = codes_ac[0xF0]  # ZRL
                w.write(code, ln)
                run = 0
            continue
        s = abs(v).bit_length()
        ln, code = codes_ac[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0


_SUBSAMPLINGS = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Encode raw 8-bit pixels (row-major interleaved, like
    encode_png) as a baseline JFIF JPEG. `subsampling` picks the
    chroma layout for RGB input — "444" (h1v1), "422" (h2v1),
    "440" (h1v2), or "420" (h2v2); chroma is box-averaged down and
    the scan is MCU-interleaved per T.81 A.2.3. Single component for
    "L". Round-trips through decode_jpeg and any conforming decoder
    within quantization (+ chroma-resample) error."""
    if mode not in ("L", "RGB"):
        raise ValueError("encode_jpeg supports modes L and RGB")
    if subsampling not in _SUBSAMPLINGS:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ch = 1 if mode == "L" else 3
    hs, vs = _SUBSAMPLINGS[subsampling] if ch == 3 else (1, 1)
    px = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if len(px) != width * height * ch:
        raise ValueError("pixel buffer does not match dimensions")
    px = px.reshape(height, width, ch).astype(np.float64)
    if mode == "RGB":
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        full = [
            0.299 * r + 0.587 * g + 0.114 * b - 128,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        full = [px[..., 0] - 128]
    # pad every plane to whole MCUs up front (edge replicate), then
    # box-average chroma — all block extraction below is exact slices
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    pw, ph = mcus_x * mcu_w, mcus_y * mcu_h
    full = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        for p in full
    ]
    planes = [full[0]]
    for p in full[1:]:
        planes.append(
            p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        )
    # tables kept in ZIGZAG order throughout — the order DQT stores
    # them and the order _encode_block's zigzagged coefficients need
    qy = _quality_scale(_STD_LUMA_Q, quality)[ZIGZAG]
    qc = _quality_scale(_STD_CHROMA_Q, quality)[ZIGZAG]
    qtabs = [qy] + [qc] * (ch - 1)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([qy] if ch == 1 else [qy, qc]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in q)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * ch, ) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([ch])
    for c in range(ch):
        hv = (hs << 4) | vs if c == 0 else 0x11
        out += bytes([c + 1, hv, 0 if c == 0 else 1])
    tables = (
        [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
        if ch == 1
        else [
            (0x00, _DC_LUMA),
            (0x10, _AC_LUMA),
            (0x01, _DC_CHROMA),
            (0x11, _AC_CHROMA),
        ]
    )
    for tid, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tid] + bits + values)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ch) + bytes([ch])
    for c in range(ch):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    cdc_y, cac_y = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    cdc_c, cac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    w = _BitWriter()
    pred = [0] * ch
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):  # luma blocks of this MCU, T.81 A.2.3
                for bx in range(hs):
                    ys, xs = (my * vs + by) * 8, (mx * hs + bx) * 8
                    _encode_block(
                        w,
                        planes[0][ys : ys + 8, xs : xs + 8],
                        qtabs[0],
                        cdc_y,
                        cac_y,
                        pred,
                        0,
                    )
            for c in range(1, ch):
                ys, xs = my * 8, mx * 8
                _encode_block(
                    w,
                    planes[c][ys : ys + 8, xs : xs + 8],
                    qtabs[c],
                    cdc_c,
                    cac_c,
                    pred,
                    c,
                )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
