"""Bit-packing kernels: store unsigned ints in ceil(log2(range)) bits.

Generalizes the reference's varint compression (src/test_bincode.rs:17-27)
to fixed-width packed lanes (FastLanes-style bit matrices, see PAPERS.md).
Pure numpy: the bit matrix is built with whole-array shifts and packed
with np.packbits — no per-value Python.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_val: int) -> int:
    """Bits needed for values in [0, max_val]. 0 when max_val == 0."""
    return int(max_val).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit big-endian-within-value lanes."""
    if width == 0 or len(vals) == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def unpack_bits(buf: np.ndarray | bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_bits: first ``n`` ``width``-bit values as uint64."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else np.ascontiguousarray(buf, np.uint8)
    bits = np.unpackbits(b, count=n * width).reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return np.bitwise_or.reduce(bits << shifts[None, :], axis=1)


def packed_nbytes(n: int, width: int) -> int:
    return (n * width + 7) // 8
