"""Codec base classes + the internal column value representation.

Columns flow through codecs as either a numpy array (numeric) or an
(offsets, data) pair (string/binary — Arrow-style layout), so every
kernel is a whole-array program. This is the Spark-side analogue of the
reference's ``Iterator<Item = T>`` encode input (src/lib.rs:25-33), with
the iterator replaced by vectorized batches (SURVEY.md §1.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .. import dtypes
from ..format import Footer, PageInfo


@dataclass
class ColumnValues:
    """A typed column of values: numpy for numeric, offsets+data for varlen."""

    tag: int
    vals: np.ndarray | None = None  # numeric tags
    offsets: np.ndarray | None = None  # varlen tags: int64, len n+1
    data: np.ndarray | None = None  # varlen tags: uint8 buffer

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_numpy(cls, arr: np.ndarray) -> "ColumnValues":
        arr = np.ascontiguousarray(arr)
        return cls(tag=dtypes.tag_for_numpy(arr.dtype), vals=arr)

    @classmethod
    def from_pylist(cls, values, tag: int | None = None) -> "ColumnValues":
        if tag is None and not values:
            # empty python list carries no type; default to String (the
            # Arrow/engine path always has a real type — this only affects
            # the pylist convenience constructor)
            tag = dtypes.STRING
        if tag == dtypes.STRING or (tag is None and values and isinstance(values[0], str)):
            bufs = [v.encode("utf-8") for v in values]
            return cls._from_bufs(bufs, dtypes.STRING)
        if tag == dtypes.BINARY or (tag is None and values and isinstance(values[0], (bytes, bytearray))):
            return cls._from_bufs([bytes(v) for v in values], dtypes.BINARY)
        if tag is None:
            return cls.from_numpy(np.asarray(values))
        raise dtypes.UnsupportedDataType(f"cannot build ColumnValues for tag {tag}")

    @classmethod
    def _from_bufs(cls, bufs: list[bytes], tag: int) -> "ColumnValues":
        lens = np.fromiter((len(b) for b in bufs), count=len(bufs), dtype=np.int64)
        offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8).copy() if bufs else np.empty(0, np.uint8)
        return cls(tag=tag, offsets=offsets, data=data)

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "ColumnValues":
        if arr.null_count:
            # Reference format has no nulls (DataType enum src/lib.rs:59-66);
            # reject cleanly at the encode boundary (SURVEY.md §1.5).
            raise dtypes.UnsupportedDataType("null values are not supported by the column format")
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
            arr = arr.cast(pa.large_string() if pa.types.is_string(t) or pa.types.is_large_string(t) else pa.large_binary())
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
            data_buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] is not None else np.empty(0, np.uint8)
            start = int(buf_off[0])
            offsets = (buf_off - start).astype(np.int64)
            data = data_buf[start : start + int(offsets[-1])].copy()
            tag = dtypes.STRING if pa.types.is_string(t) or pa.types.is_large_string(t) else dtypes.BINARY
            return cls(tag=tag, offsets=offsets, data=data)
        return cls.from_numpy(arr.to_numpy(zero_copy_only=False))

    # -- accessors ---------------------------------------------------------

    @property
    def n(self) -> int:
        if self.vals is not None:
            return len(self.vals)
        return len(self.offsets) - 1

    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def to_arrow(self) -> pa.Array:
        if self.tag == dtypes.STRING:
            return pa.Array.from_buffers(
                pa.large_utf8(), self.n, [None, pa.py_buffer(self.offsets.tobytes()), pa.py_buffer(self.data.tobytes())]
            )
        if self.tag == dtypes.BINARY:
            return pa.Array.from_buffers(
                pa.large_binary(), self.n, [None, pa.py_buffer(self.offsets.tobytes()), pa.py_buffer(self.data.tobytes())]
            )
        return pa.array(self.vals)

    def to_pylist(self) -> list:
        if self.vals is not None:
            return self.vals.tolist()
        return self.to_arrow().to_pylist()

    def input_nbytes(self) -> int:
        if self.vals is not None:
            return self.vals.nbytes
        return int(self.data.nbytes + self.offsets.nbytes)

    def slice(self, start: int, stop: int) -> "ColumnValues":
        """Row-range view [start, stop) (copies varlen buffers, rebases offsets)."""
        start = max(0, min(start, self.n))
        stop = max(start, min(stop, self.n))
        if self.vals is not None:
            return ColumnValues(tag=self.tag, vals=self.vals[start:stop])
        off = self.offsets[start : stop + 1]
        base = int(off[0]) if len(off) else 0
        return ColumnValues(
            tag=self.tag,
            offsets=(off - base).astype(np.int64),
            data=self.data[base : int(off[-1])] if len(off) else np.empty(0, np.uint8),
        )

    def equals(self, other: "ColumnValues") -> bool:
        if self.tag != other.tag or self.n != other.n:
            return False
        if self.vals is not None:
            return bool(np.array_equal(self.vals, other.vals))
        return bool(np.array_equal(self.offsets, other.offsets) and np.array_equal(self.data, other.data))

    def value_counts_int64(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted unique int64 values, counts), cached on the instance —
        codec selection (exact integer costing) and the dictionary codecs
        both need it; computing the unique twice per chunk was measured
        at ~15% of the encode path."""
        vc = getattr(self, "_vc_cache", None)
        if vc is None:
            vc = value_counts(self.vals)
            self._vc_cache = vc
        return vc


# bincount beats sort-based unique when the value range is comparable to
# the alphabet (token vocabs): O(n + range) vs O(n log n)
_BINCOUNT_MAX_RANGE = 1 << 22


def value_counts(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted unique int64 values, counts) — bincount fast path for
    narrow ranges, sort-based unique otherwise. Identical output either
    way (resume determinism)."""
    v = v.astype(np.int64, copy=False)
    if len(v) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vmin, vmax = int(v.min()), int(v.max())
    rng = vmax - vmin + 1
    if 0 < rng <= _BINCOUNT_MAX_RANGE and rng <= 8 * len(v) + 65536:
        counts_full = np.bincount(v - vmin, minlength=rng)
        nz = np.flatnonzero(counts_full)
        return nz + vmin, counts_full[nz]
    uniq, counts = np.unique(v, return_counts=True)
    return uniq, counts


@dataclass
class Encoded:
    """Result of a codec encode: pages + page metadata + column-level params."""

    pages: list[bytes]
    page_infos: list[PageInfo]
    params: bytes = b""


def ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), … concatenated — the standard ragged index kernel."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


def cut_pages(sizes: np.ndarray, target: int) -> list[tuple[int, int]]:
    """Split units into pages: accumulate until encoded bytes >= target.

    Exact reference paging rule (src/encode.rs:70-72, 87-89): the unit
    that pushes cumulative size to >= target closes the page, so every
    page except the last is >= target. Units are values (plain) or whole
    runs (RLE — runs never split across pages, src/encode.rs:66-73).
    """
    n = len(sizes)
    if n == 0:
        return []
    csum = np.cumsum(sizes, dtype=np.int64)
    cuts: list[tuple[int, int]] = []
    start = 0
    base = 0
    while start < n:
        # first index where cumulative-within-page >= target
        j = int(np.searchsorted(csum, base + target, side="left"))
        end = min(j + 1, n)
        cuts.append((start, end))
        base = int(csum[end - 1])
        start = end
    return cuts


class Codec:
    codec_id: int = -1
    name: str = "base"

    def supports(self, tag: int) -> bool:
        raise NotImplementedError

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        raise NotImplementedError

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        raise NotImplementedError

    def estimate_size(self, stats: "ColumnStats") -> float:  # noqa: F821
        raise NotImplementedError
