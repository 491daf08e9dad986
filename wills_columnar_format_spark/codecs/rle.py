"""Run-length encoding codec.

Semantics match the reference's ``rle`` module exactly (src/rle.rs:28-42):
adjacent equal values collapse into (value, run_length) runs, order
preserved, a value reappearing later starts a NEW run
(src/test_rle.rs:27-61); runs are atomic within a page — the page-break
test runs per emitted run (src/encode.rs:66-73). Run detection is the
vectorized form of the reference's iterator (``next_if_eq`` loop →
``np.flatnonzero(a[1:] != a[:-1])``); expansion is ``np.repeat``, the
exact vectorized equivalent of ``Values::repeated`` (src/rle.rs:46-51).

Page layout (columnar-within-page; reference interleaves pairs — total
bytes are equivalent, vectorized decode requires columnar):
  numeric: varint(n_runs) ‖ run values payload ‖ run_length varints ×n
  varlen:  varint(n_runs) ‖ varint lens ×n ‖ value bytes ‖ run_length varints ×n

PageInfo.values_count = Σ run_lengths (logical rows),
encoded_values_count = number of runs — the reference's key metadata
distinction (org:726-732, src/encode.rs:64-68).
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint, uvarint_decode, uvarint_encode, uvarint_lengths
from .base import Codec, ColumnValues, Encoded, cut_pages
from .plain import decode_numeric_payload, encode_numeric_payload, numeric_value_sizes


def run_starts_numeric(vals: np.ndarray) -> np.ndarray:
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.flatnonzero(vals[1:] != vals[:-1]) + 1
    return np.concatenate(([0], change)).astype(np.int64)


def run_starts_varlen(col: ColumnValues) -> np.ndarray:
    n = col.n
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = col.lengths()
    # adjacent values equal iff same length and same bytes
    same_len = lens[1:] == lens[:-1]
    neq = ~same_len
    # compare bytes only where lengths match (vectorized segment compare)
    idx = np.flatnonzero(same_len)
    if len(idx):
        import pyarrow.compute as pc

        arr = col.to_arrow()
        eq = pc.equal(arr.slice(1), arr.slice(0, n - 1)).to_numpy(zero_copy_only=False)
        neq = ~eq
    change = np.flatnonzero(neq) + 1
    return np.concatenate(([0], change)).astype(np.int64)


def extract_runs(col: ColumnValues) -> tuple[ColumnValues, np.ndarray]:
    """(run values, run lengths) — the reference's encode_iter output."""
    if col.tag in dtypes.VARLEN_TAGS:
        starts = run_starts_varlen(col)
    else:
        starts = run_starts_numeric(col.vals)
    n = col.n
    if len(starts) == 0:
        run_lengths = np.empty(0, dtype=np.int64)
        rv = (
            ColumnValues(tag=col.tag, offsets=np.zeros(1, np.int64), data=np.empty(0, np.uint8))
            if col.tag in dtypes.VARLEN_TAGS
            else ColumnValues(tag=col.tag, vals=col.vals[:0])
        )
        return rv, run_lengths
    bounds = np.concatenate((starts, [n]))
    run_lengths = np.diff(bounds)
    if col.tag in dtypes.VARLEN_TAGS:
        v_starts = col.offsets[starts]
        v_ends = col.offsets[starts + 1]
        v_lens = v_ends - v_starts
        new_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(v_lens, out=new_offsets[1:])
        # gather run-value bytes
        from .base import ragged_arange

        src_idx = np.repeat(v_starts, v_lens) + ragged_arange(v_lens)
        new_data = col.data[src_idx] if len(src_idx) else np.empty(0, np.uint8)
        rv = ColumnValues(tag=col.tag, offsets=new_offsets, data=new_data)
    else:
        rv = ColumnValues(tag=col.tag, vals=np.ascontiguousarray(col.vals[starts]))
    return rv, run_lengths


def expand_runs(run_values: ColumnValues, run_lengths: np.ndarray) -> ColumnValues:
    """Inflate runs back to rows (``Values::repeated``, src/rle.rs:46-51)."""
    if run_values.tag in dtypes.VARLEN_TAGS:
        import pyarrow.compute as pc

        idx = np.repeat(np.arange(run_values.n, dtype=np.int64), run_lengths)
        arr = pc.take(run_values.to_arrow(), idx)
        return ColumnValues.from_arrow(arr)
    return ColumnValues(tag=run_values.tag, vals=np.repeat(run_values.vals, run_lengths))


class RleCodec(Codec):
    codec_id = 1
    name = "rle"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.TAG_NAMES and tag not in dtypes.FLOAT_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        run_values, run_lengths = extract_runs(col)
        rl_buf, rl_sizes = uvarint_encode(run_lengths.astype(np.uint64))
        rl_ends = np.cumsum(rl_sizes)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        if col.tag in dtypes.VARLEN_TAGS:
            vlens = run_values.lengths()
            vlen_buf, vlen_sizes = uvarint_encode(vlens.astype(np.uint64))
            vlen_ends = np.cumsum(vlen_sizes)
            run_sizes = vlen_sizes + vlens + rl_sizes
            for s, e in cut_pages(run_sizes, target_page_size):
                head = bytearray()
                _write_uvarint(head, e - s)
                lb = vlen_buf[(vlen_ends[s - 1] if s else 0) : vlen_ends[e - 1]]
                db = run_values.data[run_values.offsets[s] : run_values.offsets[e]]
                rb = rl_buf[(rl_ends[s - 1] if s else 0) : rl_ends[e - 1]]
                page = bytes(head) + lb.tobytes() + db.tobytes() + rb.tobytes()
                pages.append(page)
                infos.append(PageInfo(offset, len(page), int(run_lengths[s:e].sum()), e - s))
                offset += len(page)
        else:
            v_buf, v_sizes = encode_numeric_payload(run_values.vals, col.tag)
            v_ends = np.cumsum(v_sizes)
            run_sizes = v_sizes + rl_sizes
            for s, e in cut_pages(run_sizes, target_page_size):
                head = bytearray()
                _write_uvarint(head, e - s)
                vb = v_buf[(v_ends[s - 1] if s else 0) : v_ends[e - 1]]
                rb = rl_buf[(rl_ends[s - 1] if s else 0) : rl_ends[e - 1]]
                page = bytes(head) + vb.tobytes() + rb.tobytes()
                pages.append(page)
                infos.append(PageInfo(offset, len(page), int(run_lengths[s:e].sum()), e - s))
                offset += len(page)
        return Encoded(pages=pages, page_infos=infos)

    def decode_runs(self, data: memoryview, footer: Footer) -> tuple[ColumnValues, np.ndarray]:
        """Return (run values, run lengths) WITHOUT expanding — the
        compute-on-compressed path (src/test_rle.rs:8-17, org:1034-1048)."""
        tag = footer.data_type
        rv_chunks: list[np.ndarray] = []
        len_chunks: list[np.ndarray] = []
        data_chunks: list[np.ndarray] = []
        rl_chunks: list[np.ndarray] = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n_runs, off = _read_uvarint(raw, 0)
            if tag in dtypes.VARLEN_TAGS:
                vlens, used = uvarint_decode(raw[off:], n_runs)
                vlens = vlens.astype(np.int64)
                off += used
                total = int(vlens.sum())
                len_chunks.append(vlens)
                data_chunks.append(raw[off : off + total])
                off += total
            else:
                vals, used = decode_numeric_payload(raw[off:], n_runs, tag)
                rv_chunks.append(vals)
                off += used
            rls, _ = uvarint_decode(raw[off:], n_runs)
            rl_chunks.append(rls.astype(np.int64))
        run_lengths = np.concatenate(rl_chunks) if rl_chunks else np.empty(0, np.int64)
        if tag in dtypes.VARLEN_TAGS:
            lens = np.concatenate(len_chunks) if len_chunks else np.empty(0, np.int64)
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            dbuf = np.concatenate(data_chunks).copy() if data_chunks else np.empty(0, np.uint8)
            rv = ColumnValues(tag=tag, offsets=offsets, data=dbuf)
        else:
            rv = ColumnValues(tag=tag, vals=np.concatenate(rv_chunks) if rv_chunks else np.empty(0, np.int64))
        return rv, run_lengths

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        rv, rl = self.decode_runs(data, footer)
        return expand_runs(rv, rl)

    def estimate_size(self, stats) -> float:
        return float(stats.rle_payload_bytes)
