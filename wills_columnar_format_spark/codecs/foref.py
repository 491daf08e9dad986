"""Frame-of-reference codec: per-page min subtraction + bit-packed deltas.

Not in the reference (its varint is the closest analogue,
src/test_bincode.rs:17-27); required by the north rule for int32 token
arrays. Each page stores its own reference (min) so locally-clustered
values pack narrowly even when the column range is wide.

Page layout: varint(n) ‖ zigzag-varint(page min) ‖ u8(width) ‖ packed deltas.
width == 0 → constant page (no payload).
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint, zigzag_decode, zigzag_encode
from .base import Codec, ColumnValues, Encoded
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits


class ForCodec(Codec):
    codec_id = 3
    name = "for_bitpack"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.INTEGER_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        v = col.vals.astype(np.int64, copy=False)
        n = len(v)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        if n == 0:
            return Encoded(pages=pages, page_infos=infos)
        # choose rows/page from the global width estimate, then compute the
        # (possibly narrower) exact width per page
        gmin, gmax = int(v.min()), int(v.max())
        gwidth = max(1, bit_width(gmax - gmin))
        per_page = max(1, (target_page_size * 8) // gwidth)
        offset = 0
        for s in range(0, n, per_page):
            e = min(s + per_page, n)
            chunk = v[s:e]
            cmin = int(chunk.min())
            deltas = (chunk - cmin).astype(np.uint64)
            width = bit_width(int(deltas.max()))
            head = bytearray()
            _write_uvarint(head, e - s)
            zz = int(zigzag_encode(np.array([cmin], dtype=np.int64))[0])
            _write_uvarint(head, zz)
            head.append(width)
            page = bytes(head) + pack_bits(deltas, width)
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s, e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos)

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        chunks = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, off = _read_uvarint(raw, 0)
            zz, off = _read_uvarint(raw, off)
            cmin = int(zigzag_decode(np.array([zz], dtype=np.uint64))[0])
            width = int(raw[off])
            off += 1
            deltas = unpack_bits(raw[off:], n, width)
            chunks.append(deltas.astype(np.int64) + cmin)
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
        # NOTE integer chunks are decided by selector.exact_integer_costs
        # (per-page widths computed exactly); this sampled path only runs
        # for direct compute_stats callers
        width = max(0, bit_width(int(stats.vmax - stats.vmin))) if stats.n else 0
        return float(packed_nbytes(stats.n, max(width, 1)) + 12)
