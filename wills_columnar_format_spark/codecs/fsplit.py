"""Float split codec: 16-bit byte-plane decomposition with per-plane
dictionary/bit-packing (an ALP-RD-style layout, see PAPERS.md — Afroozeh
et al., "ALP: Adaptive Lossless floating-Point compression", SIGMOD'24).

Not in the reference (its DataType enum has no floats, src/lib.rs:59-66);
required because embeddings are the dominant bytes of an LLM pipeline and
previously shipped plain (4 B/value). Floats rarely compress as whole
words — the mantissa low bits are near-random — but their HIGH bits
(sign ‖ exponent ‖ leading mantissa) concentrate heavily: real-valued
features occupy a narrow exponent band, so the top 16-bit plane of a
float32 has ~2k distinct patterns per 64k values (~12 bits) instead of
65k. Splitting the IEEE word into 16-bit planes and dictionary+bit-packing
each plane independently captures exactly that structure, and degrades to
raw storage (never worse than plain) when a plane is full-entropy.

The decomposition works on uint bit patterns end to end — NaN payloads,
±0.0 and denormals roundtrip bit-identically.

Big win case: floats upcast from fp16/bf16 model outputs (the common LLM
embedding reality) have constant-zero low planes → the low plane stores
as a single 2-byte constant (ratio ~0.4, see tests/test_codecs.py).

Page layout: varint(n) ‖ planes hi→lo, each:
  u8 mode ‖ payload —
    mode 0 RAW:   n × u16 LE
    mode 1 DICT:  varint(d) ‖ d × u16 LE ‖ u8 width ‖ packed codes
    mode 2 CONST: u16 LE
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint
from .base import Codec, ColumnValues, Encoded
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits

_WORD = {
    dtypes.FLOAT32: (np.uint32, np.float32, 2),  # (word dtype, float dtype, n 16-bit planes)
    dtypes.FLOAT64: (np.uint64, np.float64, 4),
}

_RAW, _DICT, _CONST = 0, 1, 2


def _encode_plane(plane: np.ndarray) -> bytes:
    """Encode one uint16 plane with the cheapest of raw/dict/const.

    Uniques via bincount + cumsum LUT over the 2^16 domain — O(n + 65k),
    ~8x faster than sort-based np.unique on 16k-value pages (and the
    resulting dict is sorted, same wire bytes)."""
    n = len(plane)
    mask = np.zeros(1 << 16, dtype=bool)
    mask[plane] = True  # presence scatter — cheaper than bincount
    d = int(mask.sum())
    if d == 1:
        uniq = np.flatnonzero(mask).astype(np.uint16)
        return bytes([_CONST]) + uniq.tobytes()
    width = bit_width(d - 1)
    dict_cost = 3 + 2 * d + 1 + packed_nbytes(n, width)
    raw_cost = 1 + 2 * n
    if dict_cost < raw_cost:
        uniq = np.flatnonzero(mask).astype(np.uint16)
        lut = np.cumsum(mask, dtype=np.uint32) - 1  # value -> dict code
        inv = lut[plane]
        out = bytearray([_DICT])
        _write_uvarint(out, d)
        out += uniq.tobytes()
        out.append(width)
        out += pack_bits(inv.astype(np.uint64), width)
        return bytes(out)
    return bytes([_RAW]) + plane.tobytes()


def _decode_plane(raw: np.ndarray, off: int, n: int) -> tuple[np.ndarray, int]:
    mode = int(raw[off])
    off += 1
    if mode == _CONST:
        val = raw[off : off + 2].copy().view(np.uint16)[0]
        return np.full(n, val, dtype=np.uint16), off + 2
    if mode == _DICT:
        d, off = _read_uvarint(raw, off)
        uniq = raw[off : off + 2 * d].copy().view(np.uint16)
        off += 2 * d
        width = int(raw[off])
        off += 1
        nb = packed_nbytes(n, width)
        codes = unpack_bits(raw[off : off + nb], n, width)
        return uniq[codes], off + nb
    buf = raw[off : off + 2 * n].copy().view(np.uint16)
    return buf, off + 2 * n


def split_encoded_nbytes(sample: np.ndarray, tag: int) -> int:
    """Exact encoded payload bytes for a sample (selector estimation)."""
    wdt, _, n_planes = _WORD[tag]
    u = np.ascontiguousarray(sample).view(wdt)
    total = 0
    for p in range(n_planes - 1, -1, -1):
        plane = ((u >> np.uint64(16 * p)) & np.uint64(0xFFFF)).astype(np.uint16)
        total += len(_encode_plane(plane))
    return total


class FloatSplitCodec(Codec):
    codec_id = 7
    name = "float_split"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.FLOAT_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        wdt, fdt, n_planes = _WORD[col.tag]
        v = np.ascontiguousarray(col.vals, dtype=fdt).view(wdt)
        n = len(v)
        itemsize = 2 * n_planes
        per_page = max(1, target_page_size // itemsize)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        for s in range(0, max(n, 0), per_page):
            e = min(s + per_page, n)
            u = v[s:e]
            head = bytearray()
            _write_uvarint(head, e - s)
            parts = [bytes(head)]
            for p in range(n_planes - 1, -1, -1):
                plane = ((u >> np.uint64(16 * p)) & np.uint64(0xFFFF)).astype(np.uint16)
                parts.append(_encode_plane(plane))
            page = b"".join(parts)
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s, e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos)

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        tag = footer.data_type
        wdt, fdt, n_planes = _WORD[tag]
        chunks = []
        for pinfo in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=pinfo.byte_len, offset=pinfo.file_offset)
            n, off = _read_uvarint(raw, 0)
            word = np.zeros(n, dtype=wdt)
            for p in range(n_planes - 1, -1, -1):
                plane, off = _decode_plane(raw, off, n)
                word |= plane.astype(wdt) << wdt(16 * p)
            chunks.append(word.view(fdt))
        out = np.concatenate(chunks) if chunks else np.empty(0, fdt)
        return ColumnValues(tag=tag, vals=out)

    def estimate_size(self, stats) -> float:
        return float(stats.fsplit_payload_bytes)
