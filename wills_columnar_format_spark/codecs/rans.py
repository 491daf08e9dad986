"""Frequency-ranked dictionary + interleaved-lane rANS ("dict_rans"):
order-0 entropy coding for skewed alphabets, fully vectorized.

``dict_rank`` (dict_varint.py) packs rank codes at a fixed primary bit
width, which cannot charge a rank its true information content: the
synthetic token stream's order-0 entropy is ~11.5 bits/value but any
fixed width pays >=12 bits for the head AND an escape for the tail
(measured 1.78 B/token vs the 1.45 B/token entropy floor). This codec
closes that gap with a static order-0 range coder (rANS, Duda 2013;
same family as zstd's FSE) over the rank stream:

1. rank the dictionary by descending chunk frequency (shared
   ``rank_encode`` kernel — identical rank order to dict_rank);
2. map ranks to symbols: ranks < M pass through, ranks >= M collapse
   into one ESCAPE symbol whose (rank - M) payload is bit-packed in a
   side stream (head size M chosen by exact cost argmin — for a
   Zipf-shaped vocabulary the head carries ~75-80% of the mass, so the
   alphabet stays small and the quantized table stays honest);
3. quantize symbol frequencies to 2^14 slots (largest-remainder, every
   present symbol >= 1 slot) and rANS-code the symbol stream.

The classic objection to range coders — per-symbol sequential decode —
is dissolved by interleaving: K independent lanes (lane j owns symbols
j, j+K, j+2K, ...) advance in lockstep, so each "iteration" is ~10
whole-array numpy ops over K-wide vectors (Giesen 2014, interleaved
rANS). Format v2 measured (same-window A/B on a 2.2M-value token
chunk, single core): 12.4M values/s encode / 17.3M decode at
1.511 B/token, vs the mode-0-forced v1 shape at 16.0M / 23.2M and
1.549 — a deliberate Pareto point: the second escape stream buys
2.5% size for a kernel-level slowdown that is invisible in the Spark
encode path (the engine runs ~1.2M tokens/s/core end-to-end there, so
the codec kernel is ~10% of wall).

With 32-bit states, 16-bit renormalization words and 14-bit
frequencies, each symbol emits/consumes AT MOST ONE word
(f << 18 >= 2^20 > 2^16 for any f >= 1), so renormalization is a single
mask per iteration, never a loop. Encode walks iterations backward
(rANS is LIFO); emitted words are globally reversed so decode consumes
them forward. Decode asserts every lane lands back on the initial
state and the word stream is fully consumed — a free integrity check.

Format v2 (round 4) closes the two measured residuals over the
ACHIEVABLE floor (order-0 entropy + the irreducible log2(k!) dictionary
permutation — see BENCH.md):

* dictionary mode: rank-order dict values are uniformly scattered over
  the vocabulary, so varint averages ~2.8 B where a fixed bit_width
  pack pays ~2.1; the encoder costs both exactly and stores the smaller
  (mode byte), worth ~0.017 B/token on the sf0.1 token table;
* escape mode: the tail beyond the head M paid a FIXED esc_w bits per
  escape (16 bits vs the tail's ~15.2-bit conditional entropy); mode 1
  splits each escape (rank−M) into LO raw low bits + a high symbol
  coded by a SECOND interleaved rANS stream with its own chunk-level
  quantized table (alphabet ≤ 4096), worth ~0.025 B/token. LO is
  chosen by exact-cost argmin over all alphabet-fitting splits.

Both mode choices are exact-cost argmins — pure functions of the
chunk's value counts, so the resume byte-identity contract holds.
Format v1 blobs (no leading version byte) predate any persisted
deployment and decode with a clear ValueError.

Deterministic (resume contract): rank order, head choice, dict/escape
modes, and the quantized tables are pure functions of the chunk's
value counts; encode output is byte-identical across re-encodes.

Reference parity: this is a V2-goal extension (compression-oriented
encodings, wills-columnar-format.org:196-204) beyond the reference's
codec set, following its header+pages layout (src/encode.rs:70-89).

Params layout: u8 version(=2) ‖ varint(k) ‖ u8 dict_mode ‖
               [mode 0: zigzag-varint dict in rank order]
               [mode 1: u8 DW ‖ packed zigzag(dict) ×k @ DW bits]
               ‖ u8 PB ‖ varint(M) ‖ packed (qfreq-1) ×A @ PB bits
               ‖ u8 esc_mode ‖ [mode 1: u8 LO ‖ packed (qf2-1) ×A2 @ PB]
Page layout:   varint(n) ‖ varint(K) ‖ varint(n_words) ‖ varint(n_esc)
               ‖ lane states ×K u32le ‖ words ×n_words u16le ‖
               [esc_mode 0: packed (rank−M) ×n_esc @ esc_width bits]
               [esc_mode 1, n_esc>0: varint(K2) ‖ varint(n_words2) ‖
                lane states ×K2 u32le ‖ words ×n_words2 u16le ‖
                packed low bits ×n_esc @ LO bits (absent when LO=0)]
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
from .base import Codec, ColumnValues, Encoded
from .bitpack import bit_width, pack_bits, packed_nbytes, unpack_bits
from .dict_varint import rank_encode

PB = 14  # frequency precision bits (slots sum to 2^PB)
_TOTAL = 1 << PB
_LOWER = 1 << 16  # state interval lower bound; renorm in 16-bit words
_HEAD_CANDIDATES = (256, 512, 1024, 2048, 4096, 8192)
# one lane per ~256 values, capped: lane states cost 4 B each, and the
# python-level iteration count is n/K (fewer lanes = more iterations)
_MAX_LANES = 4096
_VALUES_PER_LANE = 256


def _n_lanes(n: int) -> int:
    return max(1, min(_MAX_LANES, n // _VALUES_PER_LANE))


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Largest-remainder quantization of symbol counts to 2^PB total
    slots, every present symbol getting >= 1. Deterministic (stable
    argsort, index-ascending tie-break) — part of the resume contract."""
    counts = counts.astype(np.int64, copy=False)
    s = int(counts.sum())
    ideal = counts * (_TOTAL / s)
    q = np.floor(ideal).astype(np.int64)
    np.maximum(q, 1, out=q)
    diff = _TOTAL - int(q.sum())
    if diff > 0:
        rem = ideal - np.floor(ideal)
        idx = np.argsort(-rem, kind="stable")[:diff]
        q[idx] += 1
    elif diff < 0:
        # floors of the head symbols overshoot when many tail symbols
        # were bumped to 1; shave the largest overshooters first
        need = -diff
        order = np.argsort(-(q - ideal), kind="stable")
        for i in order:
            take = min(int(q[i]) - 1, need)
            q[i] -= take
            need -= take
            if need == 0:
                break
    return q


def _sym_counts(rank_counts: np.ndarray, M: int) -> np.ndarray:
    """Symbol counts for head size M: head ranks direct + one ESC."""
    if len(rank_counts) > M:
        return np.concatenate([rank_counts[:M], [int(rank_counts[M:].sum())]])
    return rank_counts.astype(np.int64, copy=False)


_ESC_MAX_ALPHABET = 4096


def _esc_plan(rank_counts: np.ndarray, M: int):
    """Deterministic escape-coding plan for head size M:
    ``(mode, LO, qf2, cf2, stream_bits, table_bits)``.

    mode 0: every escape (rank−M) bit-packed at fixed esc_w (LO slot
    carries esc_w). mode 1: LO raw low bits + hi symbol via a second
    rANS table (qf2/cf2). Exact-cost argmin over every split whose hi
    alphabet fits ``_ESC_MAX_ALPHABET`` — a pure function of the
    rank-count curve (resume contract)."""
    k = len(rank_counts)
    if k <= M:
        return (0, 0, None, None, 0.0, 0.0)
    tail = rank_counts[M:].astype(np.int64, copy=False)
    n_esc = int(tail.sum())
    esc_w = max(1, bit_width(k - 1 - M))
    best = (0, esc_w, None, None, float(n_esc) * esc_w, 0.0)
    best_cost = best[4]
    for LO in range(max(0, esc_w - 12), esc_w):
        A2 = ((k - 1 - M) >> LO) + 1
        if A2 < 2 or A2 > _ESC_MAX_ALPHABET:
            continue
        # hi-symbol counts: tail ranks grouped in blocks of 2^LO
        hc = (np.add.reduceat(tail, np.arange(0, len(tail), 1 << LO))
              if LO else tail)
        qf2 = quantize_freqs(hc)
        sbits = float((hc * (PB - np.log2(qf2))).sum()) + float(n_esc) * LO
        tbits = float(len(hc) * PB)
        if sbits + tbits < best_cost:
            cf2 = np.concatenate([[0], np.cumsum(qf2)[:-1]]).astype(np.int64)
            best = (1, LO, qf2, cf2, sbits, tbits)
            best_cost = sbits + tbits
    return best


def _dict_plan(dict_vals: np.ndarray):
    """Deterministic dictionary-storage plan: ``(mode, DW, nbytes)``.
    mode 0: zigzag-varint stream; mode 1: fixed-width bitpack at DW
    bits (+1 byte for DW). Exact sizes, order-independent — the
    selector costs the same plan from the sorted unique values."""
    dz = zigzag_encode(dict_vals)
    vb = int(uvarint_lengths(dz).sum())
    if not len(dz):
        return (0, 0, vb)
    DW = max(1, bit_width(int(dz.max())))
    pb_ = 1 + packed_nbytes(len(dz), DW)
    if pb_ < vb:
        return (1, DW, pb_)
    return (0, 0, vb)


def _stream_cost_bits(rank_counts: np.ndarray, n: int, M: int) -> float:
    """Estimated coded bits for head size M: quantized cross-entropy of
    the symbol stream + escape-plan bits (stream and table)."""
    sc = _sym_counts(rank_counts, M)
    q = quantize_freqs(sc)
    bits = float((sc * (PB - np.log2(q))).sum())
    esc = _esc_plan(rank_counts, M)
    return bits + esc[4] + esc[5] + len(sc) * PB  # + frequency tables

# deterministic speed prior in the head argmin: every escape routes a
# value through the SECOND rANS stream (encode and decode), so when two
# head sizes are within a whisker on size, prefer the one with fewer
# escapes. 0.1 bits/escape re-ranks only near-ties (measured: M=512 vs
# M=1024 on the sf0.1 token curve differ by 0.0004 B/token but by 45%
# in second-stream volume) — still a pure function of the count curve.
_ESC_SPEED_PRIOR_BITS = 0.1


def choose_head(rank_counts: np.ndarray, n: int) -> int:
    """Head size M minimizing estimated total bits plus the escape
    speed prior (pure function of the count curve — resume
    determinism; ties break to the smaller M)."""
    k = len(rank_counts)
    cands = sorted({min(m, k) for m in _HEAD_CANDIDATES})
    best_m, best_cost = None, None
    for m in cands:
        tail = float(rank_counts[m:].sum()) if k > m else 0.0
        cost = _stream_cost_bits(rank_counts, n, m) + _ESC_SPEED_PRIOR_BITS * tail
        if best_cost is None or cost < best_cost:
            best_m, best_cost = m, cost
    return best_m


def rans_encode_stream(sym: np.ndarray, qf: np.ndarray, cf: np.ndarray,
                       K: int) -> tuple[np.ndarray, np.ndarray]:
    """(final lane states u32 ×K, renorm words u16) for the symbol
    stream, K interleaved lanes (lane j owns symbols j, j+K, ...).

    Iterations run backward (rANS last-in-first-out); within an
    iteration lanes are logically processed in DESCENDING order, and the
    whole word sequence is reversed at the end, so the decoder's forward
    pass (iterations ascending, lanes ascending) consumes words in
    exactly its refill order."""
    n = len(sym)
    T = -(-n // K)
    r = n - (T - 1) * K  # lanes active in the final (partial) iteration
    # everything fits uint32 exactly: states < 2^32 by the rANS update
    # bound (st < f·2^18 ⇒ new_st ≤ (2^18−1)·2^14 + (f−1) + c < 2^32
    # since c+f ≤ 2^14), and f·2^(32−PB) ≤ (2^14−1)·2^18 < 2^32. 32-bit
    # divides are ~2× faster than 64-bit and the gathers move half the
    # bytes — output is bit-identical (same integer arithmetic).
    states = np.full(K, _LOWER, dtype=np.uint32)
    # one whole-stream gather instead of two K-wide fancy-indexes per
    # iteration: at K ~ 10^3 the per-call numpy overhead dominates
    f_all = qf.astype(np.uint32)[sym]
    c_all = cf.astype(np.uint32)[sym]
    shift_rn = np.uint32(32 - PB)
    shift_pb = np.uint32(PB)
    chunks: list[np.ndarray] = []
    low16 = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    for t in range(T - 1, -1, -1):
        cnt = r if t == T - 1 else K
        f = f_all[t * K : t * K + cnt]
        c = c_all[t * K : t * K + cnt]
        st = states[:cnt]
        mask = st >= (f << shift_rn)
        chunks.append((st & low16).astype(np.uint16)[mask][::-1])
        st = np.where(mask, st >> s16, st)
        q = st // f
        states[:cnt] = (q << shift_pb) + (st - q * f) + c
    words = np.concatenate(chunks)[::-1] if chunks else np.empty(0, np.uint16)
    return states, words


def rans_decode_stream(states32: np.ndarray, words: np.ndarray,
                       qf: np.ndarray, cf: np.ndarray, n: int, K: int) -> np.ndarray:
    """Inverse of ``rans_encode_stream``: the symbol stream (uint32 ×n).

    Raises ValueError when the stream is inconsistent (words over- or
    under-consumed, or any lane failing to return to the initial state)
    — corruption surfaces here instead of as silently wrong values."""
    T = -(-n // K)
    r = n - (T - 1) * K
    # uint32 mirror of the encode-side narrowing: the decode update
    # f·(st>>14) + g obeys the same < 2^32 bound, and the renorm refill
    # (st<<16)|word starts from st < 2^16 — identical integer results
    # at half the gather traffic and ~2× the multiply/divide rate
    states = states32.astype(np.uint32, copy=True)
    slot2sym = np.repeat(np.arange(len(qf), dtype=np.uint32), qf)
    # slot-indexed state-update tables: one gather each instead of
    # re-gathering qf/cf through the symbol (g_slot folds `slot - cf`)
    f_slot = qf.astype(np.uint32)[slot2sym]
    g_slot = np.arange(_TOTAL, dtype=np.uint32) - cf.astype(np.uint32)[slot2sym]
    out = np.empty(n, dtype=np.uint32)
    wpos = 0
    slot_mask = np.uint32(_TOTAL - 1)
    shift_pb = np.uint32(PB)
    lower = np.uint32(_LOWER)
    for t in range(T):
        cnt = r if t == T - 1 else K
        st = states[:cnt]
        slot = st & slot_mask
        out[t * K : t * K + cnt] = slot2sym[slot]
        st = f_slot[slot] * (st >> shift_pb) + g_slot[slot]
        mask = st < lower
        m = int(mask.sum())
        if m:
            if wpos + m > len(words):
                raise ValueError("rANS stream truncated (word underrun)")
            idx = np.flatnonzero(mask)
            st[idx] = (st[idx] << np.uint32(16)) | words[wpos : wpos + m].astype(np.uint32)
            wpos += m
        states[:cnt] = st
    if wpos != len(words) or not bool((states == lower).all()):
        raise ValueError("rANS stream corrupt (final-state check failed)")
    return out


def rans_cost_from_counts(rank_counts_desc: np.ndarray, n: int,
                          uniq_vals: np.ndarray, target_page_size: int) -> float:
    """Estimated encoded size without encoding, for the exact-costing
    selector: deterministic function of the rank-count curve plus the
    unique values (dictionary-plan sizing is order-independent). The
    cross-entropy word estimate is within ~0.5% of the true rANS output
    (word-granularity + lane-state remainders), far inside the margins
    that separate codec choices."""
    if n == 0:
        return float("inf")
    rc = rank_counts_desc.astype(np.int64, copy=False)
    M = choose_head(rc, n)
    sc = _sym_counts(rc, M)
    q = quantize_freqs(sc)
    head_bits = float((sc * (PB - np.log2(q))).sum())
    emode, LO, qf2, cf2, esc_sbits, esc_tbits = _esc_plan(rc, M)
    stream_bits = head_bits + esc_sbits
    per_page = _per_page(stream_bits, n, target_page_size)
    n_pages = -(-n // per_page)
    lane_bytes = sum(4 * _n_lanes(min(per_page, n - s)) for s in range(0, n, per_page))
    if emode:
        # second-stream lane states + (K2, n_words2) varint heads;
        # escapes apportioned to pages proportionally
        n_esc = int(rc[M:].sum())
        lane_bytes += sum(
            4 * _n_lanes(max(1, round(n_esc * min(per_page, n - s) / n))) + 4
            for s in range(0, n, per_page)
        )
    dict_bytes = 1 + _dict_plan(uniq_vals.astype(np.int64, copy=False))[2]
    table_bits = len(sc) * PB + esc_tbits
    return dict_bytes + 5 + table_bits / 8 + stream_bits / 8 + lane_bytes + 12.0 * n_pages


def _per_page(stream_bits: float, n: int, target_page_size: int) -> int:
    """Values per page from the estimated mean coded bits/value — the
    SAME rule in the cost function and the encoder (determinism).

    Pages are cut at 32× the target size: each page pays K lane states
    (4 B/lane) plus ~(values/lane) python-level iterations, so larger
    pages amortize both — and once lanes hit the 4096 cap, TOTAL
    python-level iterations for the chunk scale as n/4096 regardless
    of page size, so bigger pages buy both wider vectors and fewer
    iterations (measured: 8×→32× took the v2 two-stream encode from
    ~9M to ~30M values/s/core at <0.01 B/value lane cost). The pager
    contract — every page except the last >= target (encode.rs:70-72)
    — is a lower bound and still holds."""
    mean_bits = max(0.5, stream_bits / max(n, 1))
    return max(1024, int(target_page_size * 8 * 32 / mean_bits))


def _typed_empty(tag: int) -> ColumnValues:
    if tag == dtypes.UNSIGNED_INTEGER:
        return ColumnValues(tag=tag, vals=np.empty(0, np.uint64))
    if tag == dtypes.UNSIGNED_BYTE:
        return ColumnValues(tag=tag, vals=np.empty(0, np.uint8))
    if tag == dtypes.SIGNED_BYTE:
        return ColumnValues(tag=tag, vals=np.empty(0, np.int8))
    return ColumnValues(tag=tag, vals=np.empty(0, np.int64))


class DictRansCodec(Codec):
    codec_id = 9
    name = "dict_rans"

    def supports(self, tag: int) -> bool:
        return tag in dtypes.INTEGER_TAGS

    def encode(self, col: ColumnValues, target_page_size: int) -> Encoded:
        n = col.n
        if n == 0:
            return Encoded(pages=[], page_infos=[], params=b"\x00")
        dict_vals, codes, rank_counts = rank_encode(col)
        k = len(dict_vals)
        M = choose_head(rank_counts, n)
        sc = _sym_counts(rank_counts, M)
        qf = quantize_freqs(sc)
        cf = np.concatenate([[0], np.cumsum(qf)[:-1]]).astype(np.int64)
        esc_w = max(1, bit_width(max(k - 1 - M, 0)))
        emode, LO, qf2, cf2, esc_sbits, _ = _esc_plan(rank_counts, M)

        params = bytearray([2])  # format version
        _write_uvarint(params, k)
        dmode, DW, _ = _dict_plan(dict_vals)
        params.append(dmode)
        dz = zigzag_encode(dict_vals)
        if dmode:
            params.append(DW)
            params += pack_bits(dz, DW)
        else:
            dbuf, _ = uvarint_encode(dz)
            params += dbuf.tobytes()
        params.append(PB)
        _write_uvarint(params, M)
        params += pack_bits((qf - 1).astype(np.uint64), PB)
        params.append(emode)
        if emode:
            params.append(LO)
            params += pack_bits((qf2 - 1).astype(np.uint64), PB)

        if k > M:
            sym = np.minimum(codes, np.uint32(M))
        else:
            sym = codes
        stream_bits = float((sc * (PB - np.log2(qf))).sum()) + esc_sbits
        per_page = _per_page(stream_bits, n, target_page_size)

        lo_mask = np.uint32((1 << LO) - 1) if emode else np.uint32(0)
        pages: list[bytes] = []
        infos: list[PageInfo] = []
        offset = 0
        for s0 in range(0, n, per_page):
            e = min(s0 + per_page, n)
            psym = sym[s0:e]
            K = _n_lanes(e - s0)
            states, words = rans_encode_stream(psym, qf, cf, K)
            if k > M:
                pc = codes[s0:e]
                esc = (pc[pc >= np.uint32(M)] - np.uint32(M))
            else:
                esc = codes[:0]
            head = bytearray()
            _write_uvarint(head, e - s0)
            _write_uvarint(head, K)
            _write_uvarint(head, len(words))
            _write_uvarint(head, len(esc))
            page = (
                bytes(head)
                + states.astype("<u4").tobytes()
                + words.astype("<u2").tobytes()
            )
            if len(esc):
                if emode:
                    hi = esc >> np.uint32(LO)
                    K2 = _n_lanes(len(esc))
                    st2, w2 = rans_encode_stream(hi, qf2, cf2, K2)
                    th = bytearray()
                    _write_uvarint(th, K2)
                    _write_uvarint(th, len(w2))
                    page += (
                        bytes(th)
                        + st2.astype("<u4").tobytes()
                        + w2.astype("<u2").tobytes()
                    )
                    if LO:
                        page += pack_bits(esc & lo_mask, LO)
                else:
                    page += pack_bits(esc, esc_w)
            pages.append(page)
            infos.append(PageInfo(offset, len(page), e - s0, e - s0))
            offset += len(page)
        return Encoded(pages=pages, page_infos=infos, params=bytes(params))

    def decode(self, data: memoryview, footer: Footer) -> ColumnValues:
        if not footer.pages:
            return _typed_empty(footer.data_type)
        params = np.frombuffer(footer.params, dtype=np.uint8)
        version = int(params[0])
        if version != 2:
            raise ValueError(
                f"dict_rans params version {version} unsupported (this "
                "engine reads format v2; v1 predates persisted deployment)"
            )
        k, off = _read_uvarint(params, 1)
        dmode = int(params[off]); off += 1
        if k:
            if dmode == 1:
                DW = int(params[off]); off += 1
                nb = packed_nbytes(k, DW)
                dz = unpack_bits(params[off : off + nb], k, DW)
                off += nb
            else:
                dz, used = uvarint_decode(params[off:], k)
                off += used
        else:
            dz = np.empty(0, np.uint64)
        dict_vals = zigzag_decode(dz)
        pb = int(params[off]); off += 1
        if pb != PB:
            raise ValueError(f"unsupported rANS precision {pb}")
        M, off = _read_uvarint(params, off)
        A = M + 1 if k > M else k
        qf = (unpack_bits(params[off : off + packed_nbytes(A, PB)], A, PB)
              .astype(np.int64) + 1)
        off += packed_nbytes(A, PB)
        cf = np.concatenate([[0], np.cumsum(qf)[:-1]]).astype(np.int64)
        esc_w = max(1, bit_width(max(k - 1 - M, 0)))
        emode = int(params[off]); off += 1
        LO, qf2, cf2 = 0, None, None
        if emode:
            LO = int(params[off]); off += 1
            A2 = ((k - 1 - M) >> LO) + 1
            qf2 = (unpack_bits(params[off : off + packed_nbytes(A2, PB)], A2, PB)
                   .astype(np.int64) + 1)
            cf2 = np.concatenate([[0], np.cumsum(qf2)[:-1]]).astype(np.int64)

        chunks = []
        for p in footer.pages:
            raw = np.frombuffer(data, dtype=np.uint8, count=p.byte_len, offset=p.file_offset)
            n, hoff = _read_uvarint(raw, 0)
            K, hoff = _read_uvarint(raw, hoff)
            n_words, hoff = _read_uvarint(raw, hoff)
            n_esc, hoff = _read_uvarint(raw, hoff)
            # copy before the dtype view: page slices land at arbitrary
            # byte offsets and numpy dtype views want aligned memory
            states = raw[hoff : hoff + 4 * K].copy().view("<u4")
            hoff += 4 * K
            words = raw[hoff : hoff + 2 * n_words].copy().view("<u2")
            hoff += 2 * n_words
            # ranks stay uint32 to the final dictionary gather (k < 2^32;
            # M + esc ≤ k−1 cannot overflow) — half the concat traffic
            sym = rans_decode_stream(states, words, qf, cf, n, K)
            if n_esc:
                if emode:
                    K2, hoff = _read_uvarint(raw, hoff)
                    n_w2, hoff = _read_uvarint(raw, hoff)
                    st2 = raw[hoff : hoff + 4 * K2].copy().view("<u4")
                    hoff += 4 * K2
                    w2 = raw[hoff : hoff + 2 * n_w2].copy().view("<u2")
                    hoff += 2 * n_w2
                    esc = rans_decode_stream(
                        st2, w2, qf2, cf2, n_esc, K2
                    ) << np.uint32(LO)
                    if LO:
                        lo = unpack_bits(
                            raw[hoff : hoff + packed_nbytes(n_esc, LO)], n_esc, LO
                        ).astype(np.uint32)
                        esc |= lo
                else:
                    esc = unpack_bits(
                        raw[hoff : hoff + packed_nbytes(n_esc, esc_w)], n_esc, esc_w
                    ).astype(np.uint32)
                mask = sym == np.uint32(M)
                if int(mask.sum()) != n_esc:
                    raise ValueError("rANS escape count mismatch")
                sym[mask] = np.uint32(M) + esc
            chunks.append(sym)
        ranks = np.concatenate(chunks) if chunks else np.empty(0, np.uint32)
        out = dict_vals[ranks] if k else np.empty(0, np.int64)
        tag = footer.data_type
        if tag == dtypes.UNSIGNED_INTEGER:
            return ColumnValues(tag=tag, vals=out.astype(np.uint64))
        if tag == dtypes.UNSIGNED_BYTE:
            return ColumnValues(tag=tag, vals=out.astype(np.uint8))
        if tag == dtypes.SIGNED_BYTE:
            return ColumnValues(tag=tag, vals=out.astype(np.int8))
        return ColumnValues(tag=tag, vals=out)

    def estimate_size(self, stats) -> float:
        # integer columns are decided by selector.exact_integer_costs;
        # the sampled-estimate path never sees this codec
        return float("inf")
