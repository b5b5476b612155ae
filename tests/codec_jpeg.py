"""Pytest-local baseline JPEG codec (pure python, public ITU T.81
algorithm) — the "third-party codec" for the multimodal
decoder-injection contract tests.

This is a REAL codec, not a stub: the encoder writes genuine JFIF
baseline files (SOI/DQT/SOF0/DHT/SOS markers, canonical Huffman
entropy coding with FF byte-stuffing, FDCT + quantization) and the
decoder parses the markers, rebuilds the Huffman tables FROM THE FILE,
entropy-decodes, dequantizes, inverse-DCTs and unfilters — so any
baseline grayscale JPEG with in-file tables decodes, not just our own
output.  Scope kept to 8-bit grayscale (1 component, no subsampling;
restart intervals RAISE rather than mis-decode): enough to prove the
`decoder=` injection contract
(signature, error channel, batch boundaries) without shipping a
600-line color pipeline into the test tree.

``decode_rgb`` is the injectable: payload bytes -> raw RGB bytes
(gray replicated to 3 channels), matching what
``image_features(decoder=...)`` expects of a codec callable.
"""

from __future__ import annotations

import math
import struct

# standard 8x8 zigzag scan order (zigzag position -> row-major index)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# custom canonical Huffman tables (decoder reads them from DHT, so any
# valid table works): 12 DC categories at length 4; EOB + ZRL + all
# (run 0-15, size 1-10) AC symbols at length 8 (162 codes < 255, and
# the reserved all-ones code is never assigned)
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_BITS = [0] * 7 + [162] + [0] * 8
AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]

QTABLE = [1] * 64  # all-ones: flat blocks round-trip exactly

_C = [1 / math.sqrt(2)] + [1.0] * 7
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)]


def _fdct(block):  # block: 64 level-shifted ints, row-major
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[8 * x + y] * _COS[x][u] * _COS[y][v]
            out[8 * u + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef):  # coef: 64 dequantized ints, row-major
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[8 * u + v] * _COS[x][u] * _COS[y][v]
            out[8 * x + y] = 0.25 * s
    return out


def _canonical_codes(bits, vals):
    """(value -> (code, length)) per the canonical JPEG construction."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:  # pad with 1s per spec
            self.write(1, 1)


def _category(v):
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s


def encode_gray(pixels: list[list[int]]) -> bytes:
    """8-bit grayscale pixel matrix -> baseline JFIF bytes."""
    h, w = len(pixels), len(pixels[0])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = [
                pixels[min(by + r, h - 1)][min(bx + c, w - 1)] - 128
                for r in range(8)
                for c in range(8)
            ]
            coef = _fdct(block)
            quant = [int(round(coef[i] / QTABLE[i])) for i in range(64)]
            zz = [quant[ZIGZAG[i]] for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            s = _category(diff)
            bw.write(*dc_codes[s])
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            for i in range(1, 64):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_codes[0xF0])  # ZRL
                    run -= 16
                sz = _category(zz[i])
                bw.write(*ac_codes[(run << 4) | sz])
                bw.write(zz[i] if zz[i] > 0 else zz[i] + (1 << sz) - 1, sz)
                run = 0
            if run:
                bw.write(*ac_codes[0x00])  # EOB
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xDB, bytes([0]) + bytes(QTABLE[ZIGZAG[i]] for i in range(64)))  # DQT
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))  # SOF0
    out += seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                self.pos += 1
                # only 0x00 is byte-stuffing; a marker inside the scan
                # (RSTn needs a DC-predictor reset this decoder doesn't
                # implement) must raise, not be silently swallowed as
                # stuffing and mis-decode the rest of the image (r10
                # review)
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data "
                        "(restart intervals unsupported)"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count):
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _build_decode_table(bits, vals):
    """(length, code) -> value."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br, table):
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(v, size):
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_gray(payload: bytes) -> tuple[int, int, bytes]:
    """Baseline grayscale JPEG -> (width, height, gray bytes)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables, htables = {}, {}
    w = h = None
    comp_q = comp_dc = comp_ac = 0
    scan_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(body[i + 1 : i + 65])
                q = [0] * 64
                for j in range(64):
                    q[ZIGZAG[j]] = zz[j]
                qtables[tq] = q
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise ValueError("only grayscale (1 component) supported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI — restart intervals need predictor resets
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDA:  # SOS
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 15
            scan_start = pos
            break
        # other segments (APPn, COM): skipped via ln
    if scan_start is None or w is None:
        raise ValueError("truncated JPEG (no SOS/SOF0)")
    q = qtables[comp_q]
    dc_t, ac_t = htables[(0, comp_dc)], htables[(1, comp_ac)]
    br = _BitReader(payload[scan_start:])
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    img = bytearray(bw_ * 8 * bh_ * 8)
    prev_dc = 0
    for by in range(bh_):
        for bx in range(bw_):
            zz = [0] * 64
            s = _huff_decode(br, dc_t)
            diff = _extend(br.bits(s), s) if s else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                rs = _huff_decode(br, ac_t)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = rs >> 4, rs & 15
                i += run
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = _extend(br.bits(size), size)
                i += 1
            coef = [0] * 64
            for j in range(64):
                coef[ZIGZAG[j]] = zz[j] * q[ZIGZAG[j]]
            spatial = _idct(coef)
            for r in range(8):
                row = (by * 8 + r) * bw_ * 8 + bx * 8
                for c in range(8):
                    v = int(round(spatial[8 * r + c])) + 128
                    img[row + c] = 0 if v < 0 else (255 if v > 255 else v)
    # crop padded block grid to w×h
    out = bytearray()
    for r in range(h):
        start = r * bw_ * 8
        out += img[start : start + w]
    return w, h, bytes(out)


def decode_rgb(payload: bytes) -> bytes:
    """The injectable codec callable: JPEG bytes -> raw RGB bytes (gray
    replicated), the pixel contract image_features expects."""
    if payload is None:
        raise ValueError("jpeg decode: payload was None")
    _w, _h, gray = decode_gray(bytes(payload))
    return bytes(b for g in gray for b in (g, g, g))
