"""Dict+RLE cascade codec: RLE runs whose values are bit-packed
dictionary codes.

Neither the reference nor our base codecs exploit BOTH repetition axes
at once: web-style token streams have a small alphabet (dictionary
wins) AND adjacent repeats (RLE wins). Storing runs of codes gets
both: per run, ceil(log2(|dict|)) bits of value + a varint run length,
instead of a full varint value per run (rle.py) or a code per row
(dictionary.py).

Params layout: identical to dictionary.py (varint(|dict|) ‖ values).
Page layout: varint(n_runs) ‖ packed run-code bits ‖ run_length varints.
PageInfo: values_count = Σ run_lengths, encoded_values_count = n_runs
(the reference's metadata distinction, org:726-732).
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint, uvarint_decode, uvarint_encode
from .base import Codec, ColumnValues, Encoded, cut_pages
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits
from .dictionary import DictCodec, dictionary_encode
from .rle import expand_runs, extract_runs


class DictRleCodec(Codec):
    codec_id = 5
    name = "dict_rle"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.TAG_NAMES and tag not in dtypes.FLOAT_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        run_values, run_lengths = extract_runs(col)
        dictionary, codes = dictionary_encode(run_values)
        k = dictionary.n
        width = max(1, bit_width(max(k - 1, 0)))
        # params serialization identical to dictionary.py
        pbuf = bytearray()
        _write_uvarint(pbuf, k)
        if col.tag in dtypes.VARLEN_TAGS:
            lens_buf, _ = uvarint_encode(dictionary.lengths().astype(np.uint64))
            pbuf += lens_buf.tobytes() + dictionary.data.tobytes()
        else:
            from .plain import encode_numeric_payload

            vbuf, _ = encode_numeric_payload(dictionary.vals, col.tag)
            pbuf += vbuf.tobytes()

        rl_buf, rl_sizes = uvarint_encode(run_lengths.astype(np.uint64))
        rl_ends = np.cumsum(rl_sizes)
        # per-run encoded size ~ width bits + run-length varint
        run_sizes = rl_sizes + max(1, width // 8)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        for s, e in cut_pages(run_sizes, target_page_size):
            head = bytearray()
            _write_uvarint(head, e - s)
            cb = pack_bits(codes[s:e], width)
            rb = rl_buf[(rl_ends[s - 1] if s else 0) : rl_ends[e - 1]]
            page = bytes(head) + cb + rb.tobytes()
            pages.append(page)
            infos.append(PageInfo(offset, len(page), int(run_lengths[s:e].sum()), e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos, params=bytes(pbuf))

    def decode_runs(self, data: memoryview, footer: Footer) -> tuple[ColumnValues, np.ndarray]:
        """Compute-on-compressed access, like RleCodec.decode_runs."""
        dictionary = DictCodec._decode_dictionary(self, footer)
        width = max(1, bit_width(max(dictionary.n - 1, 0)))
        code_chunks: list[np.ndarray] = []
        rl_chunks: list[np.ndarray] = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n_runs, off = _read_uvarint(raw, 0)
            nb = packed_nbytes(n_runs, width)
            code_chunks.append(unpack_bits(raw[off : off + nb], n_runs, width))
            rls, _ = uvarint_decode(raw[off + nb :], n_runs)
            rl_chunks.append(rls.astype(np.int64))
        codes = np.concatenate(code_chunks).astype(np.int64) if code_chunks else np.empty(0, np.int64)
        run_lengths = np.concatenate(rl_chunks) if rl_chunks else np.empty(0, np.int64)
        if footer.data_type in dtypes.VARLEN_TAGS:
            import pyarrow.compute as pc

            rv = ColumnValues.from_arrow(pc.take(dictionary.to_arrow(), codes))
        else:
            rv = ColumnValues(tag=footer.data_type, vals=dictionary.vals[codes])
        return rv, run_lengths

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        rv, rl = self.decode_runs(data, footer)
        return expand_runs(rv, rl)

    def estimate_size(self, stats) -> float:
        k = stats.est_distinct
        if k <= 0:
            return 0.0
        width = max(1, bit_width(int(k) - 1))
        n_runs = max(1, stats.est_n_runs)
        return float(stats.dict_values_bytes + packed_nbytes(n_runs, width) + n_runs * 1.2)
