"""Property-based roundtrip tests (hypothesis): any int dtype, any value
shape, every codec — decode(encode(x)) == x, including slices.

The reference pins semantics with hand-built vectors (src/test_lib.rs);
these extend that with adversarial generation: extreme magnitudes, runs,
duplicates, empty arrays, single values.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from wills_columnar_format_spark.column import (
    decode_column,
    decode_column_slice,
    encode_column,
)

INT_DTYPES = [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32, np.int64, np.uint64]
CODECS = ["plain", "rle", "dict", "for_bitpack", "delta", "dict_rle", "dict_rank", "dict_rans", "auto"]


@st.composite
def int_arrays(draw):
    dtype = draw(st.sampled_from(INT_DTYPES))
    info = np.iinfo(dtype)
    kind = draw(st.sampled_from(["random", "runs", "narrow", "extreme"]))
    n = draw(st.integers(min_value=0, max_value=400))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    wide = np.int64 if info.min < 0 else np.uint64
    if kind == "random":
        vals = rng.integers(info.min, int(info.max) + 1, n, dtype=wide)
    elif kind == "runs":
        base = rng.integers(0, 50, max(1, n // 5) if n else 1)
        vals = np.repeat(base, 5)[:n].astype(wide)
    elif kind == "narrow":
        vals = rng.integers(0, 7, n, dtype=wide)
    else:
        pool = np.array([info.min, info.min + 1, 0, 1, info.max - 1, info.max], dtype=wide)
        vals = pool[rng.integers(0, len(pool), n)] if n else pool[:0]
    return vals.astype(dtype)


@pytest.mark.parametrize("codec", CODECS)
@settings(max_examples=40, deadline=None)
@given(vals=int_arrays())
def test_int_roundtrip_property(codec, vals):
    from wills_columnar_format_spark import dtypes as dt
    from wills_columnar_format_spark.codecs import BY_NAME
    from wills_columnar_format_spark.selector import applicable_codecs
    from wills_columnar_format_spark.codecs.base import ColumnValues

    col = ColumnValues.from_numpy(vals)
    if codec != "auto" and BY_NAME[codec] not in applicable_codecs(col):
        return  # overflow-guarded codec on extreme values — legitimately excluded
    blob, _ = encode_column(vals, codec=codec, target_page_size=256)
    out = decode_column(blob, dtype=vals.dtype)
    assert np.array_equal(out.vals, vals)
    if len(vals) > 3:
        s = decode_column_slice(blob, 1, len(vals) - 1, dtype=vals.dtype)
        assert np.array_equal(s.vals, vals[1 : len(vals) - 1])


@settings(max_examples=40, deadline=None)
@given(
    words=st.lists(st.text(min_size=0, max_size=24), min_size=0, max_size=120),
    codec=st.sampled_from(["plain", "rle", "dict", "fsst", "dict_rle", "auto"]),
)
def test_string_roundtrip_property(words, codec):
    blob, _ = encode_column(words, codec=codec, target_page_size=256)
    assert decode_column(blob, dtype="string").to_pylist() == words


FLOAT_DTYPES = [np.float32, np.float64]


@st.composite
def float_arrays(draw):
    dtype = draw(st.sampled_from(FLOAT_DTYPES))
    kind = draw(st.sampled_from(["normal", "fp16", "const", "specials", "full_entropy"]))
    n = draw(st.integers(min_value=0, max_value=400))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    if kind == "normal":
        vals = rng.standard_normal(n).astype(dtype)
    elif kind == "fp16":
        vals = rng.standard_normal(n).astype(np.float16).astype(dtype)
    elif kind == "const":
        vals = np.full(n, draw(st.sampled_from([0.0, -0.0, 1.5, np.nan])), dtype=dtype)
    elif kind == "specials":
        pool = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-40, 1.5], dtype=dtype)
        vals = pool[rng.integers(0, len(pool), n)] if n else pool[:0]
    else:
        u = rng.integers(0, 2**64, n, dtype=np.uint64)
        vals = u.view(np.float64).astype(dtype) if dtype is np.float64 else (
            u.astype(np.uint32).view(np.float32))
    return vals


@pytest.mark.parametrize("codec", ["plain", "float_split", "auto"])
@settings(max_examples=40, deadline=None)
@given(vals=float_arrays())
def test_float_roundtrip_property(codec, vals):
    uint = np.uint32 if vals.dtype == np.float32 else np.uint64
    blob, _ = encode_column(vals, codec=codec, target_page_size=256)
    out = decode_column(blob, dtype=vals.dtype)
    assert out.vals.dtype == vals.dtype
    assert np.array_equal(out.vals.view(uint), vals.view(uint))
    if len(vals) > 3:
        s = decode_column_slice(blob, 1, len(vals) - 1, dtype=vals.dtype)
        assert np.array_equal(s.vals.view(uint), vals[1 : len(vals) - 1].view(uint))


@given(
    vals=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_value_zone_map_always_encloses_ints(vals):
    """Zone maps must ENCLOSE the values at any magnitude: for >2^53
    ints float64 rounds, and a bound rounded inward would wrongly prune
    a chunk whose true extreme matches the query range."""
    from wills_columnar_format_spark.codecs.base import ColumnValues
    from wills_columnar_format_spark.engine import _value_zone_map

    arr = np.array(vals, dtype=np.int64)
    vmin, vmax = _value_zone_map(ColumnValues.from_numpy(arr))
    assert vmin <= int(arr.min())  # exact int-vs-float comparison
    assert vmax >= int(arr.max())
    # and stay tight: within one float64 ulp of the true extremes
    assert vmin >= np.nextafter(float(int(arr.min())), -np.inf)
    assert vmax <= np.nextafter(float(int(arr.max())), np.inf)


@given(
    vals=st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=1, max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_value_zone_map_floats_nan_safe(vals):
    from wills_columnar_format_spark.codecs.base import ColumnValues
    from wills_columnar_format_spark.engine import _value_zone_map

    arr = np.array(vals, dtype=np.float64)
    vmin, vmax = _value_zone_map(ColumnValues.from_numpy(arr))
    fin = arr[~np.isnan(arr)]
    if len(fin) == 0:
        assert vmin is None and vmax is None  # all-NaN -> NULL maps
    else:
        assert vmin == fin.min() and vmax == fin.max()
        assert not np.isnan(vmin) and not np.isnan(vmax)
