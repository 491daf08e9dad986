"""Plain codec: the bincode-standard-config analogue (reference src/lib.rs:21).

Value wire rules match the reference's asserted bincode sizes
(src/test_bincode.rs:14-53): u8/i8 are raw single bytes; wider ints are
varints (zigzag for signed) so ±1 costs 1 byte; strings cost
varint(len)+len (= len+1 for short strings). Floats (our extension) are
raw little-endian.

Page layout (columnar-within-page for vectorized decode; the reference
streams values sequentially, src/decode.rs:52-66, which a numpy decoder
cannot do efficiently — total size is identical):
  numeric: varint(n) ‖ payload
  varlen:  varint(n) ‖ varint lens ×n ‖ data bytes
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import (
    Footer,
    PageInfo,
    _read_uvarint,
    _write_uvarint,
    uvarint_decode,
    uvarint_encode,
    uvarint_lengths,
    zigzag_decode,
    zigzag_encode,
)
from .base import Codec, ColumnValues, Encoded, cut_pages

_RAW_WIDTH = {dtypes.FLOAT32: 4, dtypes.FLOAT64: 8}
_CANONICAL_DTYPE = {
    dtypes.UNSIGNED_BYTE: np.uint8,
    dtypes.SIGNED_BYTE: np.int8,
    dtypes.UNSIGNED_INTEGER: np.uint64,
    dtypes.SIGNED_INTEGER: np.int64,
    dtypes.FLOAT32: np.float32,
    dtypes.FLOAT64: np.float64,
}


def encode_numeric_payload(vals: np.ndarray, tag: int) -> tuple[np.ndarray, np.ndarray]:
    """Encode numeric values; returns (uint8 buffer, per-value byte lengths)."""
    n = len(vals)
    if tag in (dtypes.UNSIGNED_BYTE, dtypes.SIGNED_BYTE):
        buf = np.ascontiguousarray(vals).view(np.uint8).copy()
        return buf, np.ones(n, dtype=np.int64)
    if tag == dtypes.UNSIGNED_INTEGER:
        return uvarint_encode(vals.astype(np.uint64, copy=False))
    if tag == dtypes.SIGNED_INTEGER:
        return uvarint_encode(zigzag_encode(vals.astype(np.int64, copy=False)))
    if tag in _RAW_WIDTH:
        w = _RAW_WIDTH[tag]
        buf = np.frombuffer(np.ascontiguousarray(vals).tobytes(), dtype=np.uint8).copy()
        return buf, np.full(n, w, dtype=np.int64)
    raise dtypes.UnsupportedDataType(f"numeric payload for tag {tag}")


def decode_numeric_payload(buf: np.ndarray, n: int, tag: int) -> tuple[np.ndarray, int]:
    """Decode ``n`` numeric values; returns (canonical-dtype array, bytes used)."""
    if tag in (dtypes.UNSIGNED_BYTE, dtypes.SIGNED_BYTE):
        out = buf[:n].copy().view(_CANONICAL_DTYPE[tag])
        return out, n
    if tag == dtypes.UNSIGNED_INTEGER:
        return uvarint_decode(buf, n)
    if tag == dtypes.SIGNED_INTEGER:
        u, used = uvarint_decode(buf, n)
        return zigzag_decode(u), used
    if tag in _RAW_WIDTH:
        w = _RAW_WIDTH[tag]
        out = buf[: n * w].copy().view(_CANONICAL_DTYPE[tag])
        return out, n * w
    raise dtypes.UnsupportedDataType(f"numeric payload for tag {tag}")


def numeric_value_sizes(vals: np.ndarray, tag: int) -> np.ndarray:
    if tag in (dtypes.UNSIGNED_BYTE, dtypes.SIGNED_BYTE):
        return np.ones(len(vals), dtype=np.int64)
    if tag == dtypes.UNSIGNED_INTEGER:
        return uvarint_lengths(vals.astype(np.uint64, copy=False))
    if tag == dtypes.SIGNED_INTEGER:
        return uvarint_lengths(zigzag_encode(vals.astype(np.int64, copy=False)))
    return np.full(len(vals), _RAW_WIDTH[tag], dtype=np.int64)


class PlainCodec(Codec):
    codec_id = 0
    name = "plain"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.TAG_NAMES

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        if col.tag in dtypes.VARLEN_TAGS:
            lens = col.lengths()
            len_buf, len_sizes = uvarint_encode(lens.astype(np.uint64))
            sizes = len_sizes + lens  # varint(len) + len bytes per value
            len_ends = np.cumsum(len_sizes)
            for s, e in cut_pages(sizes, target_page_size):
                head = bytearray()
                _write_uvarint(head, e - s)
                lb = len_buf[(len_ends[s - 1] if s else 0) : len_ends[e - 1]]
                db = col.data[col.offsets[s] : col.offsets[e]]
                page = bytes(head) + lb.tobytes() + db.tobytes()
                pages.append(page)
                infos.append(PageInfo(offset, len(page), e - s, e - s))
                offset += len(page)
        else:
            buf, vsizes = encode_numeric_payload(col.vals, col.tag)
            ends = np.cumsum(vsizes)
            for s, e in cut_pages(vsizes, target_page_size):
                head = bytearray()
                _write_uvarint(head, e - s)
                page = bytes(head) + buf[(ends[s - 1] if s else 0) : ends[e - 1]].tobytes()
                pages.append(page)
                infos.append(PageInfo(offset, len(page), e - s, e - s))
                offset += len(page)
        return Encoded(pages=pages, page_infos=infos)

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        tag = footer.data_type
        if tag in dtypes.VARLEN_TAGS:
            all_lens: list[np.ndarray] = []
            all_data: list[np.ndarray] = []
            for p in footer.pages:
                raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
                n, off = _read_uvarint(raw, 0)
                lens, used = uvarint_decode(raw[off:], n)
                lens = lens.astype(np.int64)
                start = off + used
                all_lens.append(lens)
                all_data.append(raw[start : start + int(lens.sum())])
            lens = np.concatenate(all_lens) if all_lens else np.empty(0, np.int64)
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            dbuf = np.concatenate(all_data) if all_data else np.empty(0, np.uint8)
            return ColumnValues(tag=tag, offsets=offsets, data=dbuf.copy())
        chunks = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, off = _read_uvarint(raw, 0)
            vals, _ = decode_numeric_payload(raw[off:], n, tag)
            chunks.append(vals)
        out = np.concatenate(chunks) if chunks else np.empty(0, _CANONICAL_DTYPE.get(tag, np.int64))
        return ColumnValues(tag=tag, vals=out)

    def estimate_size(self, stats) -> float:
        return float(stats.plain_payload_bytes)
