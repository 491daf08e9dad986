"""Codec auto-selector tests on FIXTURES.md §4 distributions.

The selection contract follows the reference's guidance: "try using
both… see which one has the smaller size"
(wills-columnar-format.org:961-963) — on these small fixtures the
selector must produce output no larger than every other applicable
codec's actual encoded size.
"""

import numpy as np
import pytest

from wills_columnar_format_spark import decode_column, decode_footer, encode_column
from wills_columnar_format_spark.codecs import BY_ID
from wills_columnar_format_spark.codecs.base import ColumnValues
from wills_columnar_format_spark.selector import applicable_codecs

RNG = np.random.default_rng(42)

def _web_like(n=60_000):
    alpha = RNG.integers(0, 512, n).astype(np.int32)
    rep = RNG.random(n) < 0.55
    idx = np.arange(n)
    idx[rep & (idx > 0)] = 0
    np.maximum.accumulate(idx, out=idx)
    return alpha[idx]


FIXTURES = {
    # fixture -> (values, codec expected to win on sizes)
    "const_runs": np.repeat(RNG.integers(0, 100, size=100), 100).astype(np.int32),
    "low_card": RNG.integers(0, 8, size=10_000).astype(np.int32),
    "narrow_range": (RNG.integers(0, 256, size=10_000) + 1_000_000).astype(np.int32),
    "alternating": np.tile(np.array([0, 1], np.int32), 5_000),
    "random_wide": RNG.integers(-(2**31), 2**31 - 1, size=10_000).astype(np.int32),
    "random_walk": (25_000 + np.cumsum(RNG.integers(-64, 65, size=60_000))).astype(np.int64),
    "web_tokens": _web_like(),
}

EXPECTED = {
    "const_runs": "rle",
    "random_walk": "delta",
    "web_tokens": "dict_rle",
}


def _actual_size(vals, codec_name):
    blob, _ = encode_column(vals, codec=codec_name)
    return len(blob)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_auto_is_no_larger_than_any_candidate(name):
    """Tiered contract: chunks <= TRY_ALL_THRESHOLD are encoded with every
    candidate and must hit the exact argmin (the reference's
    try-both-and-measure rule, org:961-963); larger chunks use the sampled
    stats estimate and must land within 10% of the true argmin (one encode
    pass instead of five — the at-scale selector)."""
    from wills_columnar_format_spark.selector import TRY_ALL_THRESHOLD

    vals = FIXTURES[name]
    blob, footer = encode_column(vals, codec="auto")
    auto_size = len(blob)
    col = ColumnValues.from_numpy(vals)
    tol = 1.0 if col.n <= TRY_ALL_THRESHOLD else 1.10
    for c in applicable_codecs(col):
        assert auto_size <= tol * _actual_size(vals, c.name), (
            f"auto picked {BY_ID[footer.codec].name} ({auto_size} B) but "
            f"{c.name} is smaller"
        )
    out = decode_column(blob, dtype=np.int32)
    assert np.array_equal(out.vals, vals)


def test_auto_text_ids_fixture():
    from wills_columnar_format_spark.selector import TRY_ALL_THRESHOLD

    vals = [f"web-{i:07d}" for i in range(10_000)]
    blob, footer = encode_column(vals, codec="auto")
    auto_size = len(blob)
    col = ColumnValues.from_pylist(vals)
    tol = 1.0 if col.n <= TRY_ALL_THRESHOLD else 1.10
    for c in applicable_codecs(col):
        assert auto_size <= tol * _actual_size(vals, c.name)
    assert decode_column(blob, dtype="string").to_pylist() == vals


def test_expected_winners():
    for name, expected in EXPECTED.items():
        _, footer = encode_column(FIXTURES[name], codec="auto")
        assert BY_ID[footer.codec].name == expected, name


def test_rle_worst_case_not_chosen():
    """Reference org:283-300: RLE is strictly larger than plain when all
    runs have length 1 — the selector must not pick it on alternating data."""
    vals = FIXTURES["alternating"]
    _, footer = encode_column(vals, codec="auto")
    assert BY_ID[footer.codec].name != "rle"
    rle_size = _actual_size(vals, "rle")
    plain_size = _actual_size(vals, "plain")
    assert rle_size > plain_size


def test_large_chunk_estimated_path_roundtrips():
    """Above TRY_ALL_THRESHOLD the selector estimates from stats; the choice
    must still roundtrip and be deterministic."""
    vals = np.repeat(RNG.integers(0, 50, size=20_000), 10).astype(np.int32)  # 200k values
    blob1, f1 = encode_column(vals, codec="auto")
    blob2, f2 = encode_column(vals, codec="auto")
    assert blob1 == blob2  # determinism for resumable re-encode checksums
    assert f1.codec == f2.codec
    assert np.array_equal(decode_column(blob1, dtype=np.int32).vals, vals)


def test_compression_actually_compresses():
    """Headline sanity: each fixture's auto encoding beats raw bytes."""
    for name, vals in FIXTURES.items():
        if name == "random_wide":
            continue  # incompressible by design
        blob, _ = encode_column(vals, codec="auto")
        assert len(blob) < vals.nbytes, name
