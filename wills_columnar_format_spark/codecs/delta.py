"""Delta bit-packing codec (Parquet DELTA_BINARY_PACKED-style).

For locally-smooth integer sequences (random walks, timestamps,
monotonic ids) the per-page frame-of-reference range is wide but
successive DIFFERENCES are narrow. Per page we store the first value,
the minimum delta, and bit-packed (delta - min_delta):

Page layout: varint(n) ‖ zigzag-varint(first) ‖ zigzag-varint(min_delta)
             ‖ u8(width) ‖ packed (delta - min_delta).

Decode is cumsum(first, deltas) — one vectorized pass. Not in the
reference (its varint is value-local, src/test_bincode.rs:17-27); this
is the published FastLanes/Parquet delta design re-expressed in numpy.
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint
from .base import Codec, ColumnValues, Encoded
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits

# values beyond +-2^62 could overflow the int64 delta math; the selector
# keeps delta off such columns (same guard shape as ForCodec)
_SAFE_MAX = 1 << 62


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def _unzz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


class DeltaCodec(Codec):
    codec_id = 6
    name = "delta"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.INTEGER_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        v = col.vals.astype(np.int64, copy=False)
        n = len(v)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        if n == 0:
            return Encoded(pages=pages, page_infos=infos)
        deltas_all = np.diff(v)
        # rows per page from the global delta width (then exact per page)
        if len(deltas_all):
            gwidth = max(1, bit_width(int(deltas_all.max() - deltas_all.min())))
        else:
            gwidth = 1
        per_page = max(2, (target_page_size * 8) // gwidth)
        offset = 0
        for s in range(0, n, per_page):
            e = min(s + per_page, n)
            chunk = v[s:e]
            d = np.diff(chunk)
            dmin = int(d.min()) if len(d) else 0
            packed_vals = (d - dmin).astype(np.uint64)
            width = bit_width(int(packed_vals.max())) if len(d) else 0
            head = bytearray()
            _write_uvarint(head, e - s)
            _write_uvarint(head, _zz(int(chunk[0])))
            _write_uvarint(head, _zz(dmin))
            head.append(width)
            page = bytes(head) + pack_bits(packed_vals, width)
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s, e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos)

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        chunks = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, off = _read_uvarint(raw, 0)
            first_zz, off = _read_uvarint(raw, off)
            dmin_zz, off = _read_uvarint(raw, off)
            width = int(raw[off])
            off += 1
            first, dmin = _unzz(first_zz), _unzz(dmin_zz)
            out = np.empty(n, dtype=np.int64)
            out[0] = first
            if n > 1:
                d = unpack_bits(raw[off:], n - 1, width).astype(np.int64) + dmin
                np.cumsum(d, out=out[1:])
                out[1:] += first
            chunks.append(out)
        out = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
        tag = footer.data_type
        if tag == dtypes.UNSIGNED_INTEGER:
            return ColumnValues(tag=tag, vals=out.astype(np.uint64))
        if tag == dtypes.UNSIGNED_BYTE:
            return ColumnValues(tag=tag, vals=out.astype(np.uint8))
        if tag == dtypes.SIGNED_BYTE:
            return ColumnValues(tag=tag, vals=out.astype(np.int8))
        return ColumnValues(tag=tag, vals=out)

    def estimate_size(self, stats) -> float:
        width = max(1, int(stats.delta_width))
        return float(packed_nbytes(stats.n, width) + 14)
