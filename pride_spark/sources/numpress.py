"""MS-Numpress codecs (linear / pic / slof) for mzML binary arrays.

Reference capability: jmzReader (bundled by the reference at
``pom.xml:124-129``, jmzreader 2.0.7) decodes MS-Numpress-compressed
``<binaryDataArray>`` payloads transparently, so ProteoWizard-converted
submissions (``msconvert --numpress``) ingest fine there.  This module
closes the same capability here (r10 verdict task #1): the three codecs
from the published MS-Numpress specification (Teleman et al., "Numerical
compression schemes for proteomics mass spectrometry data", Mol Cell
Proteomics 2014; canonical implementation
github.com/ms-numpress/ms-numpress) re-implemented from the published
algorithm in pure python/numpy:

- **linear** (``MS:1002312``): values are fixed-point-scaled to ints;
  the first two are stored whole (4-byte LE each) after the 8-byte
  big-endian fixed point; every later value stores only the *difference
  from its linear extrapolation* ``2·x[i-1] − x[i-2]`` as a
  variable-length half-byte integer.  The m/z codec.
- **pic** (``MS:1002313``): each value rounded to a non-negative int and
  stored as a variable-length half-byte integer — no header at all.
  The ion-count intensity codec.
- **slof** (``MS:1002314``): ``log(x+1)`` fixed-point-scaled to an
  unsigned short (2-byte LE) after the 8-byte fixed point.  The lossy
  high-dynamic-range intensity codec.

Variable-length integers (linear diffs, pic counts) use the numpress
half-byte scheme: one count nibble — ``n ≤ 8`` means *n leading zero
nibbles truncated*, ``n > 8`` means ``n−8`` leading ``0xF`` nibbles
truncated (negative sign-extension) — followed by the remaining
``8−n`` nibbles of the 32-bit value, least-significant first.  Nibbles
pack two per byte, high nibble first; an odd trailing nibble is padded
with a 0 low nibble (the decoders' last-byte guard).

Encoders are provided for symmetric round-trip testing (building
numpress twins of plain fixtures — there is no mzML *writer* in the
engine) and follow the canonical ``optimal*FixedPoint`` selection so
encoded payloads match what a conformant writer would emit.

Performance: decoding is a sequential nibble walk (variable-length
prefix code — inherently order-dependent), run as a tight Python loop
over a pre-split numpy nibble array inside the per-file ``mapInPandas``
ingest kernel, i.e. it parallelizes across files/byte-ranges exactly
like the XML parse around it.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = [
    "decode_linear",
    "decode_pic",
    "decode_slof",
    "encode_linear",
    "encode_pic",
    "encode_slof",
    "optimal_linear_fixed_point",
    "optimal_slof_fixed_point",
]


class NumpressError(ValueError):
    """Corrupt or truncated MS-Numpress payload."""


# ---------------------------------------------------------------------------
# half-byte integer primitives
# ---------------------------------------------------------------------------

def _nibbles(data: bytes, start: int) -> list[int]:
    """Byte payload → flat nibble list (high nibble first), from byte
    offset ``start``."""
    b = np.frombuffer(data, dtype=np.uint8, offset=start)
    out = np.empty(b.size * 2, dtype=np.uint8)
    out[0::2] = b >> 4
    out[1::2] = b & 0xF
    return out.tolist()


def _encode_int(x: int, out: list[int]) -> None:
    """Append the 1-9 nibble encoding of the 32-bit value ``x``
    (two's-complement bit pattern for negatives) to ``out``."""
    x &= 0xFFFFFFFF
    if (x & 0xF0000000) == 0:
        l = 8
        for i in range(8):
            if x & (0xF0000000 >> (4 * i)):
                l = i
                break
        out.append(l)
        for i in range(l, 8):
            out.append((x >> (4 * (i - l))) & 0xF)
    elif (x & 0xF0000000) == 0xF0000000:
        l = 7
        for i in range(8):
            if (x & (0xF0000000 >> (4 * i))) != (0xF0000000 >> (4 * i)):
                l = i
                break
        out.append(l + 8)
        for i in range(l, 8):
            out.append((x >> (4 * (i - l))) & 0xF)
    else:
        out.append(0)
        for i in range(8):
            out.append((x >> (4 * i)) & 0xF)


def _decode_int(nib: list[int], pos: int) -> tuple[int, int]:
    """Decode one variable-length int starting at nibble index ``pos``;
    returns ``(unsigned 32-bit value, next position)``."""
    try:
        head = nib[pos]
    except IndexError:
        raise NumpressError("truncated numpress payload (missing count nibble)")
    pos += 1
    res = 0
    if head <= 8:
        n = head
    else:
        n = head - 8
        for i in range(n):
            res |= 0xF << (28 - 4 * i)
    if n == 8:
        return res, pos
    end = pos + (8 - n)
    if end > len(nib):
        raise NumpressError("truncated numpress payload (short int body)")
    for i, p in enumerate(range(pos, end)):
        res |= nib[p] << (4 * i)
    return res, end


def _pack_nibbles(nib: list[int]) -> bytes:
    if len(nib) % 2:
        nib = nib + [0]  # pad: decoders skip a trailing 0 low nibble
    arr = np.asarray(nib, dtype=np.uint8)
    return ((arr[0::2] << 4) | arr[1::2]).tobytes()


def _to_signed32(x: int) -> int:
    return x - 0x100000000 if x >= 0x80000000 else x


def _fixed_point(data: bytes) -> float:
    """The 8-byte big-endian fixed point.  Only validated when a body
    follows — an empty array encodes as header-only with fixed point 0
    (``optimal*FixedPoint`` of no values), which never divides anything."""
    if len(data) < 8:
        raise NumpressError("numpress payload shorter than its fixed-point header")
    fp = struct.unpack(">d", data[:8])[0]
    if len(data) > 8 and (not (fp > 0) or not math.isfinite(fp)):
        raise NumpressError(f"invalid numpress fixed point {fp!r}")
    return fp


# ---------------------------------------------------------------------------
# linear — m/z arrays
# ---------------------------------------------------------------------------

def optimal_linear_fixed_point(values) -> float:
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return 0.0
    if values.size == 1:
        return math.floor(0x7FFFFFFF / values[0])
    max_d = max(values[0], values[1])
    if values.size > 2:
        extrapol = 2.0 * values[1:-1] - values[:-2]
        diffs = np.ceil(np.abs(values[2:] - extrapol) + 1)
        max_d = max(max_d, float(diffs.max()))
    return math.floor(0x7FFFFFFF / max_d)


def encode_linear(values, fixed_point: float | None = None) -> bytes:
    values = np.asarray(values, dtype=np.float64)
    fp = optimal_linear_fixed_point(values) if fixed_point is None else fixed_point
    out = bytearray(struct.pack(">d", float(fp)))
    if values.size == 0:
        return bytes(out)
    ints = [int(v * fp + 0.5) for v in values]
    for x in ints[:2]:
        if not (0 <= x <= 0xFFFFFFFF):
            raise NumpressError(f"value {x} overflows the linear 32-bit store")
        out += struct.pack("<I", x)
    nib: list[int] = []
    for i in range(2, len(ints)):
        diff = ints[i] - (2 * ints[i - 1] - ints[i - 2])
        if not (-0x80000000 <= diff <= 0x7FFFFFFF):
            raise NumpressError(f"extrapolation diff {diff} overflows int32")
        _encode_int(diff, nib)
    return bytes(out) + _pack_nibbles(nib)


def decode_linear(data: bytes) -> np.ndarray:
    fp = _fixed_point(data)
    n = len(data)
    if n == 8:
        return np.empty(0, dtype=np.float64)
    if n < 12:
        raise NumpressError("corrupt numpress-linear payload (< 12 bytes)")
    i1 = struct.unpack_from("<I", data, 8)[0]
    if n == 12:
        return np.asarray([i1 / fp], dtype=np.float64)
    if n < 16:
        raise NumpressError("corrupt numpress-linear payload (12 < size < 16)")
    i2 = struct.unpack_from("<I", data, 12)[0]
    ints = [i1, i2]
    nib = _nibbles(data, 16)
    pos, total = 0, len(nib)
    while pos < total:
        if pos == total - 1 and nib[pos] == 0:
            break  # trailing pad nibble
        raw, pos = _decode_int(nib, pos)
        diff = _to_signed32(raw)
        ints.append(2 * ints[-1] - ints[-2] + diff)
    return np.asarray(ints, dtype=np.float64) / fp


# ---------------------------------------------------------------------------
# pic — ion-count intensity arrays
# ---------------------------------------------------------------------------

def encode_pic(values) -> bytes:
    nib: list[int] = []
    for v in np.asarray(values, dtype=np.float64):
        x = int(v + 0.5)
        if not (0 <= x <= 0x7FFFFFFF):
            raise NumpressError(f"pic value {v} outside [0, INT_MAX]")
        _encode_int(x, nib)
    return _pack_nibbles(nib)


def decode_pic(data: bytes) -> np.ndarray:
    counts: list[int] = []
    nib = _nibbles(data, 0)
    pos, total = 0, len(nib)
    while pos < total:
        if pos == total - 1 and nib[pos] == 0:
            break
        raw, pos = _decode_int(nib, pos)
        counts.append(raw)
    return np.asarray(counts, dtype=np.float64)


# ---------------------------------------------------------------------------
# slof — short logged float intensity arrays
# ---------------------------------------------------------------------------

def optimal_slof_fixed_point(values) -> float:
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return 0.0
    max_d = max(1.0, float(np.log(values + 1.0).max()))
    return math.floor(0xFFFF / max_d)


def encode_slof(values, fixed_point: float | None = None) -> bytes:
    values = np.asarray(values, dtype=np.float64)
    fp = optimal_slof_fixed_point(values) if fixed_point is None else fixed_point
    out = bytearray(struct.pack(">d", float(fp)))
    if values.size:
        shorts = (np.log(values + 1.0) * fp + 0.5).astype(np.uint16)
        out += shorts.astype("<u2").tobytes()
    return bytes(out)


def decode_slof(data: bytes) -> np.ndarray:
    fp = _fixed_point(data)
    if (len(data) - 8) % 2:
        raise NumpressError("corrupt numpress-slof payload (odd body length)")
    shorts = np.frombuffer(data, dtype="<u2", offset=8).astype(np.float64)
    return np.exp(shorts / fp) - 1.0
