"""Bit-packing kernels: store unsigned ints in ceil(log2(range)) bits.

Generalizes the reference's varint compression (src/test_bincode.rs:17-27)
to fixed-width packed planes (a bit-sliced FastLanes-style layout, see
PAPERS.md). Layout per packed block: the value's low FULL BYTES as
contiguous byte planes (pure ``astype`` copies — no bit math), then one
bit plane (``np.packbits``) per remaining high bit. For the common
9-16-bit token widths this does 1-2 byte copies + ≤8 packbits passes
instead of a width×n bit matrix — measured ~3x faster than the
matrix+packbits formulation it replaces, at identical size (modulo
per-plane padding).

Pure numpy; no per-value Python.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_val: int) -> int:
    """Bits needed for values in [0, max_val]. 0 when max_val == 0."""
    return int(max_val).bit_length()


def packed_nbytes(n: int, width: int) -> int:
    """Exact packed size of n width-bit values in the plane layout."""
    if width == 0 or n == 0:
        return 0
    full_bytes = width // 8
    rem_bits = width - 8 * full_bytes
    return n * full_bytes + rem_bits * ((n + 7) // 8)


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into byte planes + bit planes (see module doc)."""
    if width == 0 or len(vals) == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    parts: list[bytes] = []
    full_bytes = width // 8
    for b in range(full_bytes):
        parts.append(((v >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8).tobytes())
    for bit in range(width - 8 * full_bytes):
        pos = np.uint64(8 * full_bytes + bit)
        parts.append(np.packbits(((v >> pos) & np.uint64(1)).astype(np.uint8)).tobytes())
    return b"".join(parts)


def unpack_bits(buf: np.ndarray | bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits: first ``n`` ``width``-bit values as uint64."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if isinstance(buf, (bytes, memoryview)):
        b = np.frombuffer(buf, dtype=np.uint8)
    else:
        b = np.ascontiguousarray(buf, np.uint8)
    v = np.zeros(n, dtype=np.uint64)
    off = 0
    full_bytes = width // 8
    for plane in range(full_bytes):
        v |= b[off : off + n].astype(np.uint64) << np.uint64(8 * plane)
        off += n
    plane_nbytes = (n + 7) // 8
    for bit in range(width - 8 * full_bytes):
        bits = np.unpackbits(b[off : off + plane_nbytes], count=n)
        v |= bits.astype(np.uint64) << np.uint64(8 * full_bytes + bit)
        off += plane_nbytes
    return v
