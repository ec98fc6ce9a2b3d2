"""Minimal pure-python baseline JPEG codec (decoder + encoder) —
companion to functions/png.py, closing the "real-world multimodal
corpora are JPEG-heavy" gap (VERDICT round-8 "Next round" item 4) so
the featurizer's real decode branch covers JPEG in containers
without PIL.

Scope, deliberately small but REAL:
- decoder: baseline sequential (SOF0) AND progressive (SOF2) DCT,
  8-bit, grayscale or YCbCr with any power-of-two sampling dividing
  the max — 4:4:4, 4:2:0 (h2v2), 4:2:2 (h2v1), 4:4:0 (h1v2),
  4:1:1 — restart intervals, 0xFF fill bytes (T.81 B.1.1.2),
  standard JFIF YCbCr->RGB. Huffman entropy decode (progressive:
  DC first/refine + spectral-band AC first/refine with EOB runs,
  Annex G), dequantize, dezigzag, float IDCT — actual pixels out,
  not header fields. Arithmetic coding and 12-bit raise ValueError.
- encoders: baseline (encode_jpeg) and progressive
  (encode_jpeg_progressive), MCU-interleaved 4:4:4 / 4:2:2 / 4:4:0 /
  4:2:0 (or single-component grayscale), Annex K quantization tables
  with IJG quality scaling, the spec's "typical" Huffman tables
  (ITU-T T.81 §K.3; progressive AC scans ship a custom EOBn-capable
  table). Round-trips through this decoder and through any
  conforming decoder (PIL included); progressive decodes
  BIT-IDENTICAL to the equivalent baseline stream.

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


# AC table for the progressive encoder: the spec's "typical" AC
# tables have no room for the EOBn symbols (0x10..0xE0) progressive
# EOB runs need — appending them at length 16 overflows the canonical
# code space — so progressive scans ship this complete custom table:
# every (run, size) symbol for s=1..10, EOB0..EOB14, and ZRL. Four
# high-frequency symbols at length 3, the rest at length 9
# (Kraft 4/8 + 172/512 = 0.836 <= 1; all-ones code unused).
_AC_PROG_SHORT = [0x00, 0x01, 0x11, 0xF0]
_AC_PROG = (
    [0, 0, 4, 0, 0, 0, 0, 0, 172, 0, 0, 0, 0, 0, 0, 0],
    _AC_PROG_SHORT
    + sorted(
        set(
            [(r << 4) | s for r in range(16) for s in range(1, 11)]
            + [r << 4 for r in range(15)]  # EOB0..EOB14
            + [0xF0]
        )
        - set(_AC_PROG_SHORT)
    ),
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
    except (struct.error, IndexError, KeyError) as ex:
        # truncated segments surface as short unpacks / index misses /
        # missing table ids — normalize to the documented corrupt-data
        # contract
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
    progressive = False
    prog = None  # progressive coefficient state (built at first SOS)
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
            if progressive and prog is not None:
                return _reconstruct_progressive(
                    prog, comps, width, height, qt
                )
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
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
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
            if not progressive:
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
            ss, se, ahl = seg[1 + 2 * ns : 4 + 2 * ns]
            if prog is None:
                prog = _init_progressive(comps, width, height)
            pos = _decode_progressive_scan(
                d,
                pos + 2 + seglen,
                prog,
                scan,
                ss,
                se,
                ahl >> 4,
                ahl & 0xF,
                huff_dc,
                huff_ac,
                restart_interval,
                width,
                height,
            )
            continue
        pos += 2 + seglen
    if progressive and prog is not None:
        # missing-EOI tail: all scans decoded — reconstruct anyway,
        # matching the baseline decoder's tolerated-tail contract
        return _reconstruct_progressive(prog, comps, width, height, qt)
    raise ValueError("JPEG ended without SOS")


def _validate_sampling(comps):
    """Normalize + validate component sampling; returns
    (comps, hmax, vmax)."""
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
    return comps, hmax, vmax


def _decode_scan(
    d, pos, width, height, comps, scan, qt, huff_dc, huff_ac, restart
):
    if width is None or not comps:
        raise ValueError("JPEG missing SOF0 before SOS")
    comps, hmax, vmax = _validate_sampling(comps)
    nc = len(comps)

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

    return _assemble(planes, comps, width, height, hmax, vmax)


def _assemble(planes, comps, width, height, hmax, vmax):
    """Crop, upsample chroma, color-convert level-shifted component
    planes into the output dict (shared by the baseline and
    progressive paths)."""
    if len(comps) == 1:
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


# ---- progressive (SOF2) decoding, T.81 Annex G ----
#
# A progressive stream delivers the SAME quantized coefficients as a
# baseline stream, split across scans: DC first (point-transformed by
# Al) then DC refinement bits, and per-component AC scans over
# spectral bands (Ss..Se) at successive approximations (Ah -> Al).
# Decoding accumulates integer coefficients per block across scans
# and reconstructs once at EOI — so a progressive re-encode of the
# same coefficients decodes to BIT-IDENTICAL pixels vs baseline
# (pinned in tests/test_jpeg_codec.py).


def _comp_block_grid(c, width, height, hmax, vmax):
    """(block rows, block cols) of a component's OWN grid — what a
    non-interleaved scan covers (T.81 A.2.2); may be smaller than the
    MCU-padded grid interleaved DC scans cover."""
    cw = -(-(width * c[1]) // hmax)
    chh = -(-(height * c[2]) // vmax)
    return -(-chh // 8), -(-cw // 8)


def _init_progressive(comps, width, height):
    comps_n, hmax, vmax = _validate_sampling(comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    coef = [
        np.zeros((mcus_y * c[2], mcus_x * c[1], 64), dtype=np.int64)
        for c in comps_n
    ]
    return {
        "comps": comps_n,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "coef": coef,
    }


def _dc_unit(reader, zz, dc_table, pred, ci, ah, al):
    if ah == 0:  # first DC scan: Huffman diff, point-transformed
        t = _decode_huffman(reader, dc_table)
        diff = _extend(reader.read_bits(t), t) if t else 0
        pred[ci] += diff
        zz[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if reader.read_bit():
            zz[0] |= 1 << al


def _ac_first(reader, zz, ac_table, ss, se, al, state):
    """First AC scan of a band (Ah=0), with EOB-run support
    (T.81 G.1.2.2 / F.2.2.2)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huffman(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # this block consumes one
            if r:
                eobrun += reader.read_bits(r)
            state["eobrun"] = eobrun
            return
        k += r
        if k > se:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, zz, ac_table, ss, se, al, state):
    """AC refinement scan (Ah=Al+1): newly-nonzero coefficients
    arrive as +-1<<Al; already-nonzero ones receive one correction
    bit each as the scan pointer passes them (T.81 G.1.2.3)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huffman(reader, ac_table)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    state["eobrun"] = eobrun
                    break
                # r == 15: ZRL — skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in AC refinement scan"
                    )
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:  # EOB run: correct every remaining nonzero
            if zz[k] != 0:
                if reader.read_bit() and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _decode_progressive_scan(
    d, pos, prog, scan, ss, se, ah, al, huff_dc, huff_ac, restart, width, height
):
    comps = prog["comps"]
    coef = prog["coef"]
    reader = _BitReader(d, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
    else:
        if len(scan) != 1:
            raise ValueError(
                "progressive AC scans must be non-interleaved (Ns=1)"
            )
        if not (ss <= se <= 63):
            raise ValueError("bad spectral selection")
    pred = [0] * len(comps)
    state = {"eobrun": 0}
    unit = 0
    try:
        if ss == 0 and len(scan) > 1:  # interleaved DC scan: MCU order
            for my in range(prog["mcus_y"]):
                for mx in range(prog["mcus_x"]):
                    if restart and unit and unit % restart == 0:
                        reader.byte_align_skip_rst()
                        pred = [0] * len(comps)
                    for ci, tdc, _tac in scan:
                        _, ch, cv, _tq = comps[ci]
                        for by in range(cv):
                            for bx in range(ch):
                                _dc_unit(
                                    reader,
                                    coef[ci][my * cv + by, mx * ch + bx],
                                    huff_dc[tdc] if ah == 0 else None,
                                    pred,
                                    ci,
                                    ah,
                                    al,
                                )
                    unit += 1
        else:  # non-interleaved: the component's own block grid
            ci, tdc, tac = scan[0]
            c = comps[ci]
            bh, bw = _comp_block_grid(
                c, width, height, prog["hmax"], prog["vmax"]
            )
            for by in range(bh):
                for bx in range(bw):
                    if restart and unit and unit % restart == 0:
                        reader.byte_align_skip_rst()
                        pred = [0] * len(comps)
                        state["eobrun"] = 0
                    zz = coef[ci][by, bx]
                    if ss == 0:
                        _dc_unit(
                            reader,
                            zz,
                            huff_dc[tdc] if ah == 0 else None,
                            pred,
                            ci,
                            ah,
                            al,
                        )
                    elif ah == 0:
                        _ac_first(reader, zz, huff_ac[tac], ss, se, al, state)
                    else:
                        _ac_refine(reader, zz, huff_ac[tac], ss, se, al, state)
                    unit += 1
    except _RestartMarker:
        raise ValueError("restart marker misaligned with DRI")
    return _next_marker_pos(d, reader.pos)


def _next_marker_pos(d, pos):
    """First real marker at/after pos: skips entropy bytes, stuffed
    FF00, fill 0xFFs, and stray RSTn."""
    n = len(d)
    p = pos
    while p + 1 < n:
        if d[p] == 0xFF:
            nxt = d[p + 1]
            if nxt == 0x00:
                p += 2
                continue
            if nxt == 0xFF:
                p += 1
                continue
            if 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n  # no further marker — the missing-EOI tail contract


def _reconstruct_progressive(prog, comps, width, height, qt):
    comps_n, hmax, vmax = prog["comps"], prog["hmax"], prog["vmax"]
    planes = []
    for ci, c in enumerate(comps_n):
        q = qt[c[3]]
        arr = prog["coef"][ci]
        bh, bw = arr.shape[0], arr.shape[1]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                coeffs = np.zeros(64, dtype=np.float64)
                coeffs[ZIGZAG] = arr[by, bx] * q
                blk = coeffs.reshape(8, 8)
                # same matmul as the baseline path -> bit-identical
                # reconstruction of identical coefficients
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C8.T @ blk @ _C8
                )
        planes.append(plane)
    return _assemble(planes, comps_n, width, height, hmax, vmax)


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


def _enc_setup(width, height, pixels, mode, quality, subsampling):
    """Shared encoder front end: level-shifted YCbCr (or L) planes
    padded to whole MCUs (edge replicate), chroma box-averaged down,
    zigzag-order quant tables."""
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
    return planes, qtabs, qy, qc, ch, hs, vs, mcus_x, mcus_y


def _enc_headers(width, height, ch, hs, vs, qy, qc, sof, ac_tables=None):
    """SOI + JFIF APP0 + DQT(s) + SOF (0xC0 baseline / 0xC2
    progressive) + DHTs (the typical tables, or ``ac_tables``
    overriding the AC pair — the progressive encoder's EOBn-capable
    table)."""
    ac_luma, ac_chroma = ac_tables or (_AC_LUMA, _AC_CHROMA)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([qy] if ch == 1 else [qy, qc]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in q)
    out += bytes([0xFF, sof]) + struct.pack(">H", 8 + 3 * ch) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([ch])
    for c in range(ch):
        hv = (hs << 4) | vs if c == 0 else 0x11
        out += bytes([c + 1, hv, 0 if c == 0 else 1])
    tables = (
        [(0x00, _DC_LUMA), (0x10, ac_luma)]
        if ch == 1
        else [
            (0x00, _DC_LUMA),
            (0x10, ac_luma),
            (0x01, _DC_CHROMA),
            (0x11, ac_chroma),
        ]
    )
    for tid, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tid] + bits + values)
    return out


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
    planes, qtabs, qy, qc, ch, hs, vs, mcus_x, mcus_y = _enc_setup(
        width, height, pixels, mode, quality, subsampling
    )
    out = _enc_headers(width, height, ch, hs, vs, qy, qc, sof=0xC0)
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


# ---- progressive encoder (T.81 Annex G) ----
#
# Emits the same quantized coefficients as encode_jpeg, split across
# a simple spec-legal scan script: interleaved DC first (Al=1) + DC
# refinement (Al=0), then per component AC 1..63 first (Al=1) and AC
# refinement (Al=0), with cross-block EOB runs (up to the spec max
# 32767) in both AC scan kinds. Exists so the progressive DECODER is
# round-trip-testable in a container with no image libraries;
# decode(encode_jpeg_progressive(x)) is BIT-IDENTICAL to
# decode(encode_jpeg(x)) at the same quality.


def _sos_header(comp_specs, ss, se, ah, al):
    out = bytearray(
        b"\xff\xda"
        + struct.pack(">H", 6 + 2 * len(comp_specs))
        + bytes([len(comp_specs)])
    )
    for cid, tdc, tac in comp_specs:
        out += bytes([cid, (tdc << 4) | tac])
    out += bytes([ss, se, (ah << 4) | al])
    return out


def _enc_dc_first(w, v, codes_dc, pred, ci):
    diff = v - pred[ci]
    pred[ci] = v
    t = int(diff).bit_length() if diff else 0
    ln, code = codes_dc[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff > 0 else diff + (1 << t) - 1, t)


def _flush_eobrun(w, codes_ac, state):
    """Emit the pending EOB run — symbol (r,0) with r = floor(log2 n)
    plus r extra bits (T.81 G.1.2.2) — followed by the buffered
    correction bits of the run's blocks (refinement scans only)."""
    n = state["eobrun"]
    if n > 0:
        r = n.bit_length() - 1
        ln, code = codes_ac[r << 4]
        w.write(code, ln)
        if r:
            w.write(n - (1 << r), r)
        state["eobrun"] = 0
    for b in state["pending"]:
        w.write(b, 1)
    state["pending"] = []


def _enc_ac_first(w, zz, codes_ac, al, state):
    """First AC scan of band 1..63 at point transform Al (magnitudes
    truncated toward zero per G.1.2.2). Trailing/whole-block zeros
    accumulate into cross-block EOB runs in ``state``."""
    vals = []
    for k in range(1, 64):
        v = int(zz[k])
        mag = abs(v) >> al
        vals.append(mag if v >= 0 else -mag)
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last == -1:  # whole band empty: block joins the EOB run
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(w, codes_ac, state)
        return
    _flush_eobrun(w, codes_ac, state)
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            ln, code = codes_ac[0xF0]
            w.write(code, ln)
            r -= 16
        s = abs(v).bit_length()
        ln, code = codes_ac[(r << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last < 62:
        state["eobrun"] += 1  # this block's tail starts/continues a run
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(w, codes_ac, state)


def _enc_ac_refine(w, zz, codes_ac, al, state):
    """AC refinement of band 1..63 (Ah=Al+1), per T.81 G.1.2.3:
    newly-nonzero coefficients (|v|>>Al == 1) emit (run,1)+sign;
    already-nonzero ones buffer one correction bit, flushed after the
    next symbol so the decoder consumes them as its scan pointer
    passes. Blocks without newly-nonzero coefficients join the
    cross-block EOB run, their correction bits buffered in
    ``state['pending']`` and emitted right after the run symbol."""
    temps = []
    signs = []
    for k in range(1, 64):
        v = int(zz[k])
        temps.append(abs(v) >> al)
        signs.append(v >= 0)
    eob = -1
    for i, t in enumerate(temps):
        if t == 1:
            eob = i
    if eob == -1:  # no newly-nonzero: whole block joins the EOB run
        state["eobrun"] += 1
        state["pending"].extend(t & 1 for t in temps if t > 1)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(w, codes_ac, state)
        return
    _flush_eobrun(w, codes_ac, state)
    r = 0
    br: list[int] = []
    for i, t in enumerate(temps):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            ln, code = codes_ac[0xF0]
            w.write(code, ln)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        ln, code = codes_ac[(r << 4) | 1]
        w.write(code, ln)
        r = 0
        w.write(1 if signs[i] else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
    if r > 0 or br:
        state["eobrun"] += 1  # tail joins the run; corrections pend
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(w, codes_ac, state)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Progressive (SOF2) counterpart of encode_jpeg: identical
    coefficients, delivered as DC-first / DC-refine / per-component
    AC-first / AC-refine scans. Decodes (here and in any conforming
    decoder) to exactly the pixels of the equivalent baseline
    stream."""
    planes, qtabs, qy, qc, ch, hs, vs, mcus_x, mcus_y = _enc_setup(
        width, height, pixels, mode, quality, subsampling
    )
    # quantized coefficient grids (zigzag order), MCU-padded like the
    # decoder's
    coefs = []
    for c in range(ch):
        fh, fv = (hs, vs) if c == 0 else (1, 1)
        bh, bw = mcus_y * fv, mcus_x * fh
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        plane = planes[c]
        for by in range(bh):
            for bx in range(bw):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                d = _C8 @ blk @ _C8.T
                arr[by, bx] = np.round(
                    d.reshape(-1)[ZIGZAG] / qtabs[c]
                ).astype(np.int64)
        coefs.append(arr)

    out = _enc_headers(
        width, height, ch, hs, vs, qy, qc, sof=0xC2,
        ac_tables=(_AC_PROG, _AC_PROG),
    )
    cdc = [_build_codes(*_DC_LUMA)] + [_build_codes(*_DC_CHROMA)] * (ch - 1)
    cac = [_build_codes(*_AC_PROG)] * ch
    comp_ids = [(c + 1, 0 if c == 0 else 1, 0 if c == 0 else 1) for c in range(ch)]
    samp = [(hs, vs) if c == 0 else (1, 1) for c in range(ch)]
    comps_spec = [(c + 1, samp[c][0], samp[c][1], 0) for c in range(ch)]

    # scan 1: DC first, interleaved, Al=1
    out += _sos_header(comp_ids, 0, 0, 0, 1)
    w = _BitWriter()
    pred = [0] * ch
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in range(ch):
                fh, fv = samp[c]
                for by in range(fv):
                    for bx in range(fh):
                        v = int(coefs[c][my * fv + by, mx * fh + bx, 0]) >> 1
                        _enc_dc_first(w, v, cdc[c], pred, c)
    w.flush()
    out += w.out

    # scan 2: DC refinement, interleaved, Al=0 (raw bits)
    out += _sos_header(comp_ids, 0, 0, 1, 0)
    w = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in range(ch):
                fh, fv = samp[c]
                for by in range(fv):
                    for bx in range(fh):
                        w.write(
                            int(coefs[c][my * fv + by, mx * fh + bx, 0]) & 1,
                            1,
                        )
    w.flush()
    out += w.out

    # per component: AC first (Al=1) then AC refine (Al=0), each over
    # the component's OWN block grid (non-interleaved scans)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    for c in range(ch):
        bh, bw = _comp_block_grid(comps_spec[c], width, height, hmax, vmax)
        for ah, al, fn in ((0, 1, _enc_ac_first), (1, 0, _enc_ac_refine)):
            out += _sos_header([comp_ids[c]], 1, 63, ah, al)
            w = _BitWriter()
            state = {"eobrun": 0, "pending": []}
            for by in range(bh):
                for bx in range(bw):
                    fn(w, coefs[c][by, bx], cac[c], al, state)
            _flush_eobrun(w, cac[c], state)
            w.flush()
            out += w.out

    out += b"\xff\xd9"  # EOI
    return bytes(out)
