"""Codec auto-selector: pick the smallest encoding per column chunk.

The reference makes RLE a manual caller flag (src/lib.rs:25-33) but its
docs endorse empirical selection — "The most surefire way to determine if
RLE has benefits is to test it in practice… try using both… see which one
has the smaller size" (wills-columnar-format.org:961-963) — and list
automatic RLE + dictionary encoding as V2 goals (org:196-204). This
module implements that: below ``TRY_ALL_THRESHOLD`` values we encode with
every applicable codec and keep the actual argmin (the reference's
try-both rule, exactly); above it we estimate sizes from a deterministic
stats sample and encode once with the argmin.

Selection is a pure function of the input values (deterministic sample),
so resumable re-encodes reproduce byte-identical blobs for checksum
verification (SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import dtypes
from .codecs import ALL_CODECS, BY_NAME, Codec, ColumnValues
from .codecs.fsst import compress, symbol_table_for
from .codecs.plain import numeric_value_sizes
from .codecs.rle import run_starts_numeric, run_starts_varlen
from .format import uvarint_lengths, zigzag_encode

# Below this many values, encoding with every candidate and keeping the
# argmin costs less than a mis-pick (tiny chunks); above it, the sampled
# stats estimate decides and we encode ONCE. 64k was measured to make
# selector cost dominate the whole encode path (4-5x work on doc_id /
# source-sized columns); 4k keeps try-all to genuinely tiny chunks.
TRY_ALL_THRESHOLD = 1 << 12  # values
SAMPLE_VALUES = 1 << 14

_INT64_MAX = (1 << 63) - 1


@dataclass
class ColumnStats:
    n: int
    plain_payload_bytes: float
    rle_payload_bytes: float
    est_distinct: int
    dict_values_bytes: float
    vmin: int
    vmax: int
    fsst_est_bytes: float
    est_n_runs: int = 1
    delta_width: int = 64  # bits per (delta - min_delta); 64 = inapplicable
    fsplit_payload_bytes: float = float("inf")  # float tags only


def _sample_indices(n: int, k: int) -> np.ndarray:
    if n <= k:
        return np.arange(n)
    stride = n // k
    return np.arange(0, n, stride)[:k]


def compute_stats(col: ColumnValues) -> ColumnStats:
    n = col.n
    idx = _sample_indices(n, SAMPLE_VALUES)
    scale = n / max(len(idx), 1)
    if col.tag in dtypes.VARLEN_TAGS:
        lens = col.lengths()
        slens = lens[idx]
        plain = float((uvarint_lengths(lens.astype(np.uint64)) + lens).sum())
        # run stats on a contiguous prefix (runs need adjacency, strided
        # samples destroy them)
        pref = min(n, SAMPLE_VALUES)
        sub = ColumnValues(tag=col.tag, offsets=col.offsets[: pref + 1], data=col.data[: col.offsets[pref]])
        n_runs_pref = len(run_starts_varlen(sub))
        n_runs = max(1, int(round(n_runs_pref * (n / max(pref, 1)))))
        avg_len = float(slens.mean()) if len(slens) else 0.0
        rle = n_runs * (avg_len + 2.0) + n_runs * 1.5
        # distinct estimate from sampled hashes
        starts = col.offsets[idx]
        hsh = _hash_varlen_sample(col, idx)
        _, cnts = np.unique(hsh, return_counts=True)
        est_distinct = _estimate_distinct(cnts, len(idx), n)
        dict_bytes = est_distinct * (avg_len + 1.5)
        # FSST estimate: compress the sampled bytes — skipped when RLE
        # already beats any possible FSST outcome (a near-constant column
        # like `source`: building+running the symbol table there was ~30ms
        # per chunk of pure waste)
        if rle < 0.05 * plain:
            fsst = float("inf")
        else:
            # the SAME cached table the encode would use (one build per
            # chunk); ratio measured on a prefix slice of the data
            table = symbol_table_for(col)
            sample_data = sub.data[: 1 << 15]
            if len(sample_data):
                ratio = len(compress(sample_data, table)) / len(sample_data)
            else:
                ratio = 1.0
            fsst = float(col.offsets[-1]) * ratio + float(uvarint_lengths(lens.astype(np.uint64)).sum()) + 1024
        return ColumnStats(n, plain, rle, est_distinct, dict_bytes, 0, 0, fsst,
                           est_n_runs=n_runs)
    v = col.vals
    sv = v[idx]
    if col.tag in dtypes.INTEGER_TAGS:
        plain = float(numeric_value_sizes(sv, col.tag).sum() * scale)
        vmin = int(v.min()) if n else 0
        vmax = int(v.max()) if n else 0
    else:
        plain = float(sv.dtype.itemsize * n)
        vmin = vmax = 0
    pref = v[: min(n, SAMPLE_VALUES)]
    n_runs_pref = len(run_starts_numeric(pref))
    n_runs = max(1, int(round(n_runs_pref * (n / max(len(pref), 1)))))
    val_sz = float(numeric_value_sizes(sv, col.tag).mean()) if col.tag in dtypes.INTEGER_TAGS and len(sv) else 8.0
    rle = n_runs * (val_sz + 1.5)
    _, cnts = np.unique(sv, return_counts=True)
    est_distinct = _estimate_distinct(cnts, len(idx), n)
    dict_bytes = est_distinct * val_sz
    # NOTE: integer chunks never reach the estimate path — choose_codec
    # routes them to exact_integer_costs (sampled delta/FOR widths and
    # rank curves mispicked by 5-20%); the integer fields below serve
    # direct compute_stats callers only.
    delta_width = 64
    if col.tag in dtypes.INTEGER_TAGS and len(pref) > 1:
        p64 = pref.astype(np.int64, copy=False)
        if abs(vmin) < _INT64_MAX >> 1 and abs(vmax) < _INT64_MAX >> 1:
            d = np.diff(p64)
            delta_width = max(1, int(int(d.max() - d.min()).bit_length()))
    # float split estimate: encode the contiguous prefix (~one page) and
    # scale — like the FSST sample-compression estimate above, a pure
    # function of the values (resume determinism)
    fsplit = float("inf")
    if col.tag in dtypes.FLOAT_TAGS and n:
        from .codecs.fsplit import split_encoded_nbytes

        fsplit = split_encoded_nbytes(pref, col.tag) * (n / max(len(pref), 1)) + 16.0
    return ColumnStats(n, plain, rle, est_distinct, dict_bytes, vmin, vmax, float("inf"),
                       est_n_runs=n_runs, delta_width=delta_width,
                       fsplit_payload_bytes=fsplit)


def _hash_varlen_sample(col: ColumnValues, idx: np.ndarray) -> np.ndarray:
    """Cheap per-value hash of sampled varlen values (len + first/last 8 bytes)."""
    starts = col.offsets[idx]
    ends = col.offsets[idx + 1]
    lens = ends - starts
    h = lens.astype(np.uint64) * np.uint64(1099511628211)
    data = col.data
    for j in range(8):
        pos = np.minimum(starts + j, np.maximum(ends - 1, starts))
        valid = lens > j
        bytes_j = np.where(valid, data[np.minimum(pos, len(data) - 1)] if len(data) else 0, 0)
        h = (h ^ bytes_j.astype(np.uint64)) * np.uint64(1099511628211)
    for j in range(4):
        pos = np.maximum(ends - 1 - j, starts)
        valid = lens > j
        bytes_j = np.where(valid, data[np.minimum(pos, len(data) - 1)] if len(data) else 0, 0)
        h = (h ^ bytes_j.astype(np.uint64)) * np.uint64(1099511628211)
    return h


def _estimate_distinct(sample_counts: np.ndarray, sample_n: int, n: int) -> int:
    """Chao1 estimator from sampled value frequencies: d + f1^2 / (2 f2).

    Saturated dictionaries (every value seen repeatedly, f1 ~ 0) stay at
    d; near-unique samples extrapolate toward n.
    """
    if sample_n == 0:
        return 0
    d_sample = len(sample_counts)
    if d_sample >= sample_n * 0.98:
        return max(d_sample, int(n * 0.9))  # likely unique-ish
    f1 = int((sample_counts == 1).sum())
    f2 = int((sample_counts == 2).sum())
    chao = d_sample + (f1 * f1) / (2.0 * max(f2, 1))
    return min(n, max(d_sample, int(chao)))


def applicable_codecs(col: ColumnValues) -> list[Codec]:
    out = []
    for c in ALL_CODECS:
        if not c.supports(col.tag):
            continue
        if c.name in ("for_bitpack", "delta", "dict_rank", "dict_rans"):
            v = col.vals
            if col.tag == dtypes.UNSIGNED_INTEGER and len(v) and int(v.max()) > _INT64_MAX >> 1:
                continue  # int64 difference/view math would overflow
            if (
                c.name == "delta"
                and col.tag == dtypes.SIGNED_INTEGER
                and len(v)
                and (abs(int(v.min())) > _INT64_MAX >> 1 or abs(int(v.max())) > _INT64_MAX >> 1)
            ):
                continue
        out.append(c)
    return out


def exact_integer_costs(col: ColumnValues, target_page_size: int) -> dict[str, float]:
    """EXACT encoded sizes (± page-header rounding) for every integer
    codec, without encoding: one full unique + one diff + vectorized
    varint-length passes. Sampled estimates mispick by 5-20% on
    mixed-vocabulary token chunks (delta/FOR widths are page-local,
    rank curves need full counts); exact accounting costs ~15% of one
    encode and decides the headline bytes/token. Pure function of the
    values (resume determinism)."""
    from .codecs.bitpack import bit_width, packed_nbytes
    from .codecs.dict_varint import choose_width
    from .codecs.plain import numeric_value_sizes

    v = col.vals
    n = len(v)
    tag = col.tag
    costs: dict[str, float] = {}
    _SIZE_SAMPLE = 1 << 18  # exact varint-size sums above this use a strided mean

    def _sizes_sum(arr: np.ndarray) -> float:
        if len(arr) <= _SIZE_SAMPLE:
            return float(numeric_value_sizes(arr, tag).sum())
        idx = _sample_indices(len(arr), 1 << 16)
        return float(numeric_value_sizes(arr[idx], tag).mean()) * len(arr)

    plain_payload = _sizes_sum(v)
    costs["plain"] = plain_payload + 3.0 * max(1, int(plain_payload) // target_page_size)

    # runs (shared by rle / dict_rle); run lengths < 128 are exactly one
    # varint byte each — the common non-adjacent case (runs ≈ n) would
    # otherwise pay 3 full passes of uvarint_lengths for a known answer
    starts = run_starts_numeric(v)
    run_lens = np.diff(np.append(starts, n))
    if len(run_lens) and int(run_lens.max()) < 128:
        rl_sum = float(len(run_lens))
    else:
        rl_sum = float(uvarint_lengths(run_lens.astype(np.uint64)).sum())
    rle_payload = _sizes_sum(v[starts]) + rl_sum
    costs["rle"] = rle_payload + 3.0 * max(1, int(rle_payload) // target_page_size)

    # dictionary domain (shared by dict / dict_rle / dict_rank);
    # cached on the ColumnValues — the winning dictionary codec's encode
    # reuses the same counts instead of recomputing the unique
    uniq, counts = col.value_counts_int64()
    k = len(uniq)
    width = max(1, bit_width(max(k - 1, 0)))
    dict_payload = _sizes_sum(uniq) + 3
    costs["dict"] = dict_payload + packed_nbytes(n, width) + 3.0 * max(1, n * width // 8 // target_page_size)
    costs["dict_rle"] = (
        dict_payload + packed_nbytes(len(starts), width) + rl_sum
        + 3.0 * max(1, (len(starts) * width // 8) // target_page_size)
    )
    rc = np.sort(counts)[::-1]
    w_dr, full_dr = choose_width(rc, n)
    if w_dr < full_dr:
        cap = (1 << w_dr) - 1
        cum = np.cumsum(rc)
        n_exc = n - int(cum[min(cap - 1, k - 1)])
    else:
        n_exc = 0
    dr_pages = max(1, (n * max(w_dr, 1) // 8) // target_page_size)
    dr_dict = (
        float(uvarint_lengths(zigzag_encode(uniq.astype(np.int64))).sum())
        if k <= _SIZE_SAMPLE
        else 3.0 * k
    )
    costs["dict_rank"] = (
        dr_dict + 4
        + packed_nbytes(n, w_dr) + packed_nbytes(n_exc, full_dr) + 8.0 * dr_pages
    )

    # dict_rans: order-0 cross-entropy of the quantized rank stream —
    # a deterministic ~0.5%-accurate estimate (word granularity / lane
    # remainders), far inside the margins separating codec choices
    from .codecs.rans import rans_cost_from_counts

    costs["dict_rans"] = rans_cost_from_counts(rc, n, uniq, target_page_size)

    # frame-of-reference: exact per-page widths under the codec's own
    # pagination rule (global width -> rows/page -> per-page min/max);
    # page count is bounded (~n*width/target), so the python loop is tiny
    if n:
        gmin, gmax = int(v.min()), int(v.max())
        gwidth = max(1, bit_width(gmax - gmin))
        per_page = max(1, (target_page_size * 8) // gwidth)
        total = 0.0
        for s in range(0, n, per_page):
            seg = v[s : min(s + per_page, n)]
            pw = bit_width(int(seg.max()) - int(seg.min()))
            total += packed_nbytes(len(seg), max(pw, 0)) + 8
        costs["for_bitpack"] = total

        # delta: same shape over first-differences
        if n > 1:
            deltas = np.diff(v.astype(np.int64, copy=False))
            dg = max(1, bit_width(int(deltas.max() - deltas.min())))
            per_page = max(2, (target_page_size * 8) // dg)
            total = 0.0
            for s in range(0, n, per_page):
                e = min(s + per_page, n)
                d = deltas[s : e - 1]
                pw = bit_width(int(d.max() - d.min())) if len(d) else 0
                total += packed_nbytes(len(d), pw) + 14
            costs["delta"] = total
    return costs


def choose_codec(col: ColumnValues, target_page_size: int) -> tuple[Codec, "Encoded | None"]:
    """Pick the codec; for small chunks returns the already-encoded winner."""
    cands = applicable_codecs(col)
    if len(cands) == 1:
        return cands[0], None
    if col.n <= TRY_ALL_THRESHOLD:
        best = None
        best_size = None
        best_enc = None
        for c in cands:
            enc = c.encode(col, target_page_size)
            size = sum(len(p) for p in enc.pages) + len(enc.params)
            # deterministic tie-break: smaller size, then smaller codec id
            if best_size is None or size < best_size or (size == best_size and c.codec_id < best.codec_id):
                best, best_size, best_enc = c, size, enc
        return best, best_enc
    if col.tag in dtypes.INTEGER_TAGS:
        # exact accounting for the north-rule payload (see docstring)
        costs = exact_integer_costs(col, target_page_size)
        by_name = {c.name: c for c in cands}
        best_name = min(
            (nm for nm in costs if nm in by_name),
            key=lambda nm: (costs[nm], by_name[nm].codec_id),
        )
        return by_name[best_name], None
    stats = compute_stats(col)
    best = min(cands, key=lambda c: (c.estimate_size(stats), c.codec_id))
    return best, None


def codec_by_name(name: str) -> Codec:
    return BY_NAME[name]
