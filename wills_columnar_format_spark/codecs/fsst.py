"""FSST-style symbol-table compression for string/byte payloads.

Not in the reference (north-rule requirement; see Boncz/Neumann/Leis
"FSST: Fast Random Access String Compression", VLDB 2020, for the
published design this follows in spirit): a per-column table of up to 254
symbols (2-8 bytes each) sampled from the data; each symbol is replaced
by a single code byte; bytes not covered by a symbol are escaped.

Implementation strategy (pure Python/numpy, no C kernel — SURVEY.md §7.3):

* encode: transform the page payload into escape pairs ``(0xFF, b)`` per
  literal byte, then apply one C-speed ``bytes.replace`` pass per symbol
  (longest-gain first). Symbols containing 0xFF are excluded from the
  table, which makes misaligned matches impossible (a match must start at
  a pair boundary and spans whole pairs — proof: patterns start with 0xFF
  and never contain 0xFF at even interior offsets).
* decode: fully vectorized — classify the byte stream into code bytes vs
  escape pairs via FF-run parity, then scatter symbol bytes with at most
  8 masked passes.

Page layout (varlen): varint(n) ‖ varint lens ×n ‖ varint(clen) ‖ compressed.
Params: varint(n_sym) ‖ u8 symbol lens ‖ symbol bytes.
"""

from __future__ import annotations

import numpy as np

from .. import dtypes
from ..format import Footer, PageInfo, _read_uvarint, _write_uvarint, uvarint_decode, uvarint_encode
from .base import Codec, ColumnValues, Encoded, cut_pages

ESC = 0xFF
MAX_SYMBOLS = 254  # codes 0..253; 0xFE reserved; 0xFF escape marker
SYMBOL_LENGTHS = (8, 6, 4, 3, 2)
SAMPLE_BYTES = 1 << 16


def _ngram_counts(sample: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct L-grams of a byte sample and their counts (vectorized)."""
    if len(sample) < L:
        return np.empty((0, L), np.uint8), np.empty(0, np.int64)
    w = np.lib.stride_tricks.sliding_window_view(sample, L)
    # pack window bytes into a single uint64 key for np.unique
    powers = (np.uint64(256) ** np.arange(L, dtype=np.uint64))[::-1]
    keys = (w.astype(np.uint64) * powers[None, :]).sum(axis=1, dtype=np.uint64)
    uk, first_idx, counts = np.unique(keys, return_index=True, return_counts=True)
    return w[first_idx], counts


def build_symbol_table(sample: np.ndarray, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Greedy gain-ranked symbol selection from a byte sample."""
    candidates: list[tuple[int, bytes]] = []
    for L in SYMBOL_LENGTHS:
        grams, counts = _ngram_counts(sample, L)
        if not len(counts):
            continue
        # keep the top few hundred per length to bound work
        order = np.argsort(counts)[::-1][:512]
        for i in order:
            g = grams[i]
            if ESC in g:
                continue  # misalignment-safety invariant
            gain = int(counts[i]) * (L - 1) - (L + 1)
            if gain > 0:
                candidates.append((gain, bytes(g)))
    candidates.sort(key=lambda t: (-t[0], t[1]))
    table: list[bytes] = []
    seen: set[bytes] = set()
    for _, sym in candidates:
        if sym in seen:
            continue
        seen.add(sym)
        table.append(sym)
        if len(table) >= max_symbols:
            break
    return table


def _escape_expand(data: np.ndarray) -> bytes:
    out = np.empty(2 * len(data), dtype=np.uint8)
    out[0::2] = ESC
    out[1::2] = data
    return out.tobytes()


def compress(data: np.ndarray, table: list[bytes]) -> bytes:
    """Compress a byte buffer with the symbol table."""
    s = _escape_expand(data)
    for code, sym in enumerate(table):
        s = s.replace(_escape_expand(np.frombuffer(sym, np.uint8)), bytes([code]))
    return s


def decompress(buf: np.ndarray, table: list[bytes], out_len: int) -> np.ndarray:
    """Vectorized inverse of compress: returns the original uint8 buffer."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    n = len(b)
    if n == 0:
        return np.empty(0, np.uint8)
    is_ff = b == ESC
    # maximal FF-runs
    d = np.diff(is_ff.astype(np.int8))
    run_starts = np.flatnonzero(d == 1) + 1
    run_ends = np.flatnonzero(d == -1) + 1  # exclusive
    if is_ff[0]:
        run_starts = np.concatenate(([0], run_starts))
    if is_ff[-1]:
        run_ends = np.concatenate((run_ends, [n]))
    run_lens = run_ends - run_starts

    # escape pairs inside runs: starts at run_start + 2j, j < floor(k/2); value 0xFF
    half = run_lens // 2
    from .base import ragged_arange

    in_run_pair_starts = np.repeat(run_starts, half) + 2 * ragged_arange(half)
    # odd runs: final FF pairs with the following non-FF byte
    odd = (run_lens & 1) == 1
    odd_pair_starts = (run_starts + run_lens - 1)[odd]
    odd_literal_vals = b[np.minimum(odd_pair_starts + 1, n - 1)]

    pair_starts = np.concatenate((in_run_pair_starts, odd_pair_starts))
    pair_vals = np.concatenate((np.full(len(in_run_pair_starts), ESC, np.uint8), odd_literal_vals))

    # code bytes: non-FF positions not consumed as a pair second byte
    consumed_second = np.zeros(n, dtype=bool)
    second_idx = pair_starts + 1
    consumed_second[second_idx[second_idx < n]] = True
    code_pos = np.flatnonzero(~is_ff & ~consumed_second)
    codes = b[code_pos]

    # merge tokens in stream order
    tok_pos = np.concatenate((pair_starts, code_pos))
    order = np.argsort(tok_pos, kind="stable")
    is_literal = np.concatenate((np.ones(len(pair_starts), bool), np.zeros(len(code_pos), bool)))[order]
    tok_val = np.concatenate((pair_vals, codes))[order]

    if table:
        sym_lens = np.fromiter((len(s) for s in table), count=len(table), dtype=np.int64)
        max_len = int(sym_lens.max())
        sym_mat = np.zeros((len(table), max_len), dtype=np.uint8)
        for i, s in enumerate(table):
            sym_mat[i, : len(s)] = np.frombuffer(s, np.uint8)
    else:
        sym_lens = np.empty(0, np.int64)
        max_len = 0
        sym_mat = np.zeros((0, 0), np.uint8)

    out_lens = np.where(is_literal, 1, np.take(sym_lens, tok_val.astype(np.int64), mode="clip") if len(table) else 1)
    ends = np.cumsum(out_lens)
    starts = ends - out_lens
    out = np.empty(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
    lit_starts = starts[is_literal]
    out[lit_starts] = tok_val[is_literal]
    code_starts = starts[~is_literal]
    code_ids = tok_val[~is_literal].astype(np.int64)
    code_lens = out_lens[~is_literal]
    for j in range(max_len):
        m = code_lens > j
        out[code_starts[m] + j] = sym_mat[code_ids[m], j]
    if len(out) != out_len:
        raise ValueError(f"FSST decompress length mismatch: {len(out)} != {out_len}")
    return out


def _strided_sample(col: ColumnValues) -> np.ndarray:
    data = col.data
    if len(data) <= SAMPLE_BYTES:
        return data
    stride = len(data) // SAMPLE_BYTES + 1
    # strided chunk sample keeps local structure for n-gram counting
    idx = np.arange(0, len(data) - 64, stride * 64)
    from .base import ragged_arange

    pos = np.repeat(idx, 64) + ragged_arange(np.full(len(idx), 64, np.int64))
    return data[pos]


def symbol_table_for(col: ColumnValues) -> list[bytes]:
    """The chunk's symbol table, cached on the instance — the selector's
    size estimate and the actual encode share one build (was two ~30ms
    builds per string chunk). Deterministic: built from the strided
    sample, a pure function of the chunk bytes."""
    tbl = getattr(col, "_fsst_table", None)
    if tbl is None:
        tbl = build_symbol_table(_strided_sample(col))
        col._fsst_table = tbl
    return tbl


class FsstCodec(Codec):
    codec_id = 4
    name = "fsst"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.VARLEN_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        table = symbol_table_for(col)
        params = bytearray()
        _write_uvarint(params, len(table))
        params += bytes(bytearray(len(s) for s in table))
        params += b"".join(table)

        lens = col.lengths()
        len_buf, len_sizes = uvarint_encode(lens.astype(np.uint64))
        len_ends = np.cumsum(len_sizes)
        sizes = len_sizes + lens
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        for s, e in cut_pages(sizes, target_page_size):
            head = bytearray()
            _write_uvarint(head, e - s)
            lb = len_buf[(len_ends[s - 1] if s else 0) : len_ends[e - 1]]
            raw = col.data[col.offsets[s] : col.offsets[e]]
            comp = compress(raw, table)
            body = bytearray()
            _write_uvarint(body, len(comp))
            page = bytes(head) + lb.tobytes() + bytes(body) + comp
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s, e - s))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos, params=bytes(params))

    def _table(self, footer: Footer) -> list[bytes]:
        params = footer.params
        n_sym, off = _read_uvarint(params, 0)
        sym_lens = list(params[off : off + n_sym])
        off += n_sym
        table = []
        for L in sym_lens:
            table.append(bytes(params[off : off + L]))
            off += L
        return table

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        table = self._table(footer)
        all_lens: list[np.ndarray] = []
        all_data: list[np.ndarray] = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, off = _read_uvarint(raw, 0)
            lens, used = uvarint_decode(raw[off:], n)
            lens = lens.astype(np.int64)
            off += used
            clen, off = _read_uvarint(raw, off)
            comp = raw[off : off + clen]
            all_lens.append(lens)
            all_data.append(decompress(comp, table, int(lens.sum())))
        lens = np.concatenate(all_lens) if all_lens else np.empty(0, np.int64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        dbuf = np.concatenate(all_data) if all_data else np.empty(0, np.uint8)
        return ColumnValues(tag=footer.data_type, offsets=offsets, data=dbuf)

    def estimate_size(self, stats) -> float:
        return float(stats.fsst_est_bytes)
