"""Independent JPEG/PNG DECODERS for the pHash certificate twin —
VERDICT r10 item 8: the twin (functions/phash_ref.py) re-derived
every pHash step but still decoded through the engine's vendored
codec (functions/jpeg.py / png.py), leaving one shared-fate corner: a
decoder bug corrupting pixels identically on both sides would pass
the certificate. This module closes it with a second, from-spec
implementation that imports NOTHING from the engine codecs and takes
deliberately different computational routes:

- Huffman decoding: ITU-T T.81 F.2.2.3's DECODE procedure over the
  canonical MINCODE/MAXCODE/VALPTR arrays built straight from the
  DHT BITS/HUFFVAL lists — not the engine's prebuilt (length, code)
  dictionary lookups.
- Bit input: T.81 F.2.2.5 NEXTBIT (byte-stuffing 0xFF00 handled in
  the reader state machine), magnitude decode via the F.2.2.1 EXTEND
  recurrence.
- Zigzag: derived algorithmically by walking the 8x8 anti-diagonals
  with direction flips — not a hardcoded table.
- IDCT: one precomputed 64x64 basis tensor from the textbook
  synthesis formula s(x,y) = sum_k sum_l a(k)a(l) S(k,l)
  cos((2x+1)k*pi/16) cos((2y+1)l*pi/16), applied as a single tensor
  contraction — not the engine's orthonormal-matrix sandwich.
- Progressive: spectral selection + successive approximation decoded
  per T.81 Annex G (DC first/refine, AC first with EOBn runs, AC
  refinement per G.1.2.3's correction-bit procedure).
- PNG: stdlib zlib inflate + RFC 2083 unfiltering written
  independently (per-filter scanline loops, not the engine's
  paeth/vector forms).

Scope: exactly what the planted twin corpus needs — 8-bit single-
component (grayscale) baseline (SOF0) and progressive (SOF2) streams
without restart markers, and 8-bit grayscale non-interlaced PNG. Any
other stream raises ValueError (the twin never sees one).

Equivalence with the engine decoders on the twin corpus, plus the
mutation test proving a planted engine-decoder bug is CAUGHT, live in
tests/test_phash_ref.py."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _zigzag_order():
    """Zigzag index order derived by the anti-diagonal walk: diagonal
    d holds cells (r, c) with r + c = d, traversed upward on even d
    and downward on odd d (JPEG's convention starts upward from
    (0,0) -> (0,1) -> (1,0): even diagonals run bottom-left to
    top-right)."""
    order = []
    for d in range(15):
        cells = [
            (r, d - r)
            for r in range(max(0, d - 7), min(7, d) + 1)
        ]
        if d % 2 == 0:
            cells.reverse()  # upward: high row first -> toward top
        order.extend(r * 8 + c for r, c in cells)
    return order


_ZZ = _zigzag_order()  # zigzag position -> natural (row-major) index

# textbook synthesis basis: _BASIS[k, l, x, y]
_a = np.array([np.sqrt(0.5)] + [1.0] * 7)
_cs = np.array(
    [[np.cos((2 * x + 1) * k * np.pi / 16.0) for x in range(8)]
     for k in range(8)]
)
_BASIS = 0.25 * np.einsum("k,l,kx,ly->klxy", _a, _a, _cs, _cs)


class _Huff:
    """Canonical Huffman table in T.81 F.2.2.3 form: per code length
    the smallest/largest code and the VALPTR offset into HUFFVAL."""

    def __init__(self, bits, huffval):
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    """T.81 F.2.2.5 NEXTBIT: MSB-first bits from the entropy stream,
    0xFF00 stuffing removed, any other marker ends the stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.hit_marker = False

    def bit(self) -> int:
        if self.nbits == 0:
            if self.hit_marker or self.pos >= len(self.data):
                return 0  # past-the-end padding bits
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.hit_marker = True
                    return 0
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, tbl: _Huff) -> int:
        """The DECODE procedure: extend the code one bit at a time
        until it falls inside the current length's [min, max]."""
        code, length = self.bit(), 1
        while code > tbl.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt Huffman stream")
            code = (code << 1) | self.bit()
        return tbl.huffval[tbl.valptr[length] + code - tbl.mincode[length]]

    def marker_pos(self) -> int:
        """Byte offset of the marker that ended this scan."""
        p = self.pos
        while p < len(self.data):
            if self.data[p] == 0xFF and p + 1 < len(self.data) \
                    and self.data[p + 1] != 0x00:
                return p
            p += 1
        return len(self.data)


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map the t raw magnitude bits to the signed
    coefficient value."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode_jpeg_ref(payload: bytes) -> dict:
    """Decode an 8-bit single-component baseline or progressive JPEG.
    Returns {"width", "height", "mode": "L", "pixels": bytes} —
    the same shape as the engine's decode_jpeg for grayscale."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    width = height = 0
    progressive = False
    comp_q = 0
    coefs = None  # (blocks_y, blocks_x, 64) natural-order int32
    eobrun = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone markers
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        end = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZZ] = qz  # zigzag -> natural
                qt[tq] = nat
                i += 65
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            progressive = marker == 0xC2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision")
            height, width = struct.unpack(">HH", seg[1:5])
            if seg[5] != 1:
                raise ValueError(
                    "independent twin decoder handles single-component "
                    "(grayscale) streams only"
                )
            h, v = seg[7] >> 4, seg[7] & 0x0F
            if (h, v) != (1, 1):
                raise ValueError("subsampled single component")
            comp_q = seg[8]
            by = (height + 7) // 8
            bx = (width + 7) // 8
            coefs = np.zeros((by, bx, 64), dtype=np.int32)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
                i += 17 + n
        elif marker == 0xDA:  # SOS
            if coefs is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != 1:
                raise ValueError("multi-component scan")
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            rdr = _BitReader(payload, end)
            eobrun = 0
            pred = 0
            nblocks = coefs.shape[0] * coefs.shape[1]
            for bi in range(nblocks):
                blk = coefs[bi // coefs.shape[1], bi % coefs.shape[1]]
                if not progressive:
                    # baseline: DC diff + AC run-length to EOB
                    t = rdr.decode(dc_tabs[td])
                    pred += _extend(rdr.bits(t), t)
                    blk[0] = pred
                    k = 1
                    while k <= 63:
                        rs = rdr.decode(ac_tabs[ta])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        blk[_ZZ[k]] = _extend(rdr.bits(s), s)
                        k += 1
                elif ss == 0:
                    if ah == 0:  # DC first
                        t = rdr.decode(dc_tabs[td])
                        pred += _extend(rdr.bits(t), t)
                        blk[0] = pred << al
                    else:  # DC refinement: one correction bit
                        if rdr.bit():
                            blk[0] |= 1 << al
                else:
                    if ah == 0:  # AC first (G.1.2.2)
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = rdr.decode(ac_tabs[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += rdr.bits(r)
                                    break
                                k += 16  # ZRL
                                continue
                            k += r
                            blk[_ZZ[k]] = _extend(rdr.bits(s), s) << al
                            k += 1
                    else:  # AC refinement (G.1.2.3)
                        eobrun = _ac_refine_ref(
                            rdr, blk, ss, se, al, ac_tabs[ta], eobrun
                        )
            pos = rdr.marker_pos()
            continue
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF type 0xFF{marker:02X}")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos = end
    if coefs is None:
        raise ValueError("no frame decoded")
    q = qt[comp_q].astype(np.float64)
    by, bx, _ = coefs.shape
    # dequantize (natural order) and synthesize via the basis tensor
    deq = coefs.astype(np.float64) * q[None, None, :]
    deq = deq.reshape(by, bx, 8, 8)
    px = np.einsum("bckl,klxy->bcxy", deq, _BASIS) + 128.0
    img = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    img = np.clip(np.round(img[:height, :width]), 0, 255).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "mode": "L",
        "pixels": img.tobytes(),
    }


def _ac_refine_ref(rdr, blk, ss, se, al, tbl, eobrun) -> int:
    """T.81 G.1.2.3 AC successive-approximation refinement for one
    block: every already-nonzero coefficient on the band consumes a
    correction bit; zero-history positions are set from (run, 1)
    symbols; an EOBn symbol switches the remainder of this band (and
    the following EOBRUN-1 whole blocks) to correction-bits-only.
    Returns the EOB run remaining AFTER this block."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(idx):
        if rdr.bit() and (blk[idx] & p1) == 0:
            blk[idx] += p1 if blk[idx] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode(tbl)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn: run length includes THIS block
                    eobrun = (1 << r) + (rdr.bits(r) if r else 0)
                    break
                # r == 15 (ZRL): advance over 16 zero-history coefs
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                val = p1 if rdr.bit() else m1
            while k <= se:
                idx = _ZZ[k]
                if blk[idx] != 0:
                    correct(idx)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            idx = _ZZ[k]
            if blk[idx] != 0:
                correct(idx)
            k += 1
        eobrun -= 1
    return eobrun


def decode_png_ref(payload: bytes) -> dict:
    """Independent 8-bit grayscale non-interlaced PNG decode: stdlib
    zlib inflate + per-filter scanline reconstruction written from
    RFC 2083's filter definitions."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, 0, 0, b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError(
                    "twin PNG decoder handles 8-bit grayscale "
                    "non-interlaced only"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = width
    out = np.zeros((height, width), dtype=np.int64)
    off = 0
    for y in range(height):
        ftype = raw[off]
        line = np.frombuffer(
            raw[off + 1 : off + 1 + stride], dtype=np.uint8
        ).astype(np.int64)
        off += 1 + stride
        prev = out[y - 1] if y else np.zeros(width, dtype=np.int64)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub
            acc = 0
            for x in range(width):
                acc = (line[x] + acc) & 0xFF
                out[y, x] = acc
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            left = 0
            for x in range(width):
                left = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
                out[y, x] = left
        elif ftype == 4:  # Paeth
            left = 0
            for x in range(width):
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                left = (line[x] + pred) & 0xFF
                out[y, x] = left
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return {
        "width": width,
        "height": height,
        "mode": "L",
        "pixels": out.astype(np.uint8).tobytes(),
    }
