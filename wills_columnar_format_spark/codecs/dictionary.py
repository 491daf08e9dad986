"""Dictionary codec: distinct-value dictionary + bit-packed integer codes.

This is the reference's V2 wish made real ("Dictionary encoding for
better string compression", wills-columnar-format.org:203). The
dictionary lives in the footer's codec params (column-level, like the
reference's column-level ``use_rle`` flag, src/lib.rs:52-57); pages hold
bit-packed codes with width = ceil(log2(|dict|)).

Params layout: varint(|dict|) ‖ dict values (plain payload rules;
varlen: varint lens ×k ‖ bytes).
Page layout: varint(n) ‖ packed code bits.
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint, uvarint_decode, uvarint_encode
from .base import Codec, ColumnValues, Encoded, cut_pages
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits
from .plain import decode_numeric_payload, encode_numeric_payload


def dictionary_encode(col: ColumnValues) -> tuple[ColumnValues, np.ndarray]:
    """(dictionary values, uint64 codes). Dictionary is sorted-unique —
    deterministic for resumable re-encodes (SURVEY.md §7.3). Numeric
    columns reuse the chunk's cached value counts (selector computed
    them already) and index via a range LUT when the alphabet is narrow."""
    if col.tag in dtypes.VARLEN_TAGS:
        import pyarrow.compute as pc

        arr = col.to_arrow()
        uniq = pc.unique(arr).sort()
        codes = pc.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.uint64)
        return ColumnValues.from_arrow(uniq), codes
    from .base import _BINCOUNT_MAX_RANGE

    uniq64, _ = col.value_counts_int64()
    v64 = col.vals.astype(np.int64, copy=False)
    if len(uniq64) == 0:
        return ColumnValues(tag=col.tag, vals=col.vals[:0]), np.empty(0, np.uint64)
    if col.tag == dtypes.UNSIGNED_INTEGER and int(uniq64[0]) < 0:
        # values >= 2^63 wrap negative in the int64 cache, which would
        # store the dictionary out of UNSIGNED order — keep the
        # sorted-unique invariant via the direct unsigned path (a second
        # full sort, accepted: this corner excludes most other codecs
        # anyway and the wrapped-rotation remap isn't worth the subtlety)
        uniq, inverse = np.unique(col.vals, return_inverse=True)
        return ColumnValues(tag=col.tag, vals=uniq), inverse.astype(np.uint64)
    vmin = int(uniq64[0])
    rng = int(uniq64[-1]) - vmin + 1
    if 0 < rng <= _BINCOUNT_MAX_RANGE:
        lut = np.zeros(rng, dtype=np.uint64)
        lut[uniq64 - vmin] = np.arange(len(uniq64), dtype=np.uint64)
        codes = lut[v64 - vmin]
    else:
        codes = np.searchsorted(uniq64, v64).astype(np.uint64)
    return ColumnValues(tag=col.tag, vals=uniq64.astype(col.vals.dtype, copy=False)), codes


class DictCodec(Codec):
    codec_id = 2
    name = "dict"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.TAG_NAMES and tag not in dtypes.FLOAT_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        dictionary, codes = dictionary_encode(col)
        k = dictionary.n
        width = max(1, bit_width(max(k - 1, 0)))
        params = bytearray()
        _write_uvarint(params, k)
        if col.tag in dtypes.VARLEN_TAGS:
            lens_buf, _ = uvarint_encode(dictionary.lengths().astype(np.uint64))
            params += lens_buf.tobytes() + dictionary.data.tobytes()
        else:
            vbuf, _ = encode_numeric_payload(dictionary.vals, col.tag)
            params += vbuf.tobytes()
        # fixed-width codes → count-based page split at the byte target
        per_page = max(1, (target_page_size * 8) // width)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        for s in range(0, len(codes), per_page):
            e = min(s + per_page, len(codes))
            head = bytearray()
            _write_uvarint(head, e - s)
            page = bytes(head) + pack_bits(codes[s:e], width)
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s, e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos, params=bytes(params))

    def _decode_dictionary(self, footer: Footer) -> ColumnValues:
        params = np.frombuffer(footer.params, dtype=np.uint8)
        k, off = _read_uvarint(params, 0)
        tag = footer.data_type
        if tag in dtypes.VARLEN_TAGS:
            lens, used = uvarint_decode(params[off:], k)
            lens = lens.astype(np.int64)
            off += used
            offsets = np.zeros(k + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            data = params[off : off + int(lens.sum())].copy()
            return ColumnValues(tag=tag, offsets=offsets, data=data)
        vals, _ = decode_numeric_payload(params[off:], k, tag)
        return ColumnValues(tag=tag, vals=vals)

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        dictionary = self._decode_dictionary(footer)
        width = max(1, bit_width(max(dictionary.n - 1, 0)))
        code_chunks = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, off = _read_uvarint(raw, 0)
            code_chunks.append(unpack_bits(raw[off:], n, width))
        codes = np.concatenate(code_chunks).astype(np.int64) if code_chunks else np.empty(0, np.int64)
        if footer.data_type in dtypes.VARLEN_TAGS:
            import pyarrow.compute as pc

            return ColumnValues.from_arrow(pc.take(dictionary.to_arrow(), codes))
        return ColumnValues(tag=footer.data_type, vals=dictionary.vals[codes])

    def estimate_size(self, stats) -> float:
        k = stats.est_distinct
        if k <= 0:
            return 0.0
        width = max(1, bit_width(int(k) - 1))
        return float(stats.dict_values_bytes + packed_nbytes(stats.n, width))
