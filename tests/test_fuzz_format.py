"""Corruption fuzz over the container format: decoding a damaged blob
must either raise a controlled error or be caught by the manifest
checksum — NEVER return wrong values silently when ``verify_checksums``
is the contract (engine.make_decode_fn re-hashes every decoded
sub-column against the encoder's blake2b, engine.py `_checksum`).

This pins the layered integrity story the engine ships at 100 TB:

* rANS pages self-verify (lane states must return to the initial
  state and the word stream must be fully consumed — rans.py decode);
* bit-packed / plain pages carry no self-check by design (byte-aligned
  kernels), so the CHECKSUM layer is what catches damage there;
* the footer trailer bounds-checks the metadata read (format.py).

No seed-dependent flakiness: corruption sites are enumerated
deterministically from the blob length.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from wills_columnar_format_spark.column import decode_column, encode_column
from wills_columnar_format_spark.engine import _checksum

# the controlled-failure surface: anything else (segfault, hang,
# silent wrong data passing checksum) is a bug this test exists to catch
CONTROLLED = (ValueError, IOError, IndexError, KeyError, OverflowError)


def _token_chunk(n=200_000, seed=3):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    return (ranks % 50_257).astype(np.int32)


def _reference_checksum(vals: np.ndarray) -> str:
    from wills_columnar_format_spark.codecs.base import ColumnValues
    from wills_columnar_format_spark import dtypes

    return _checksum(ColumnValues(tag=dtypes.SIGNED_INTEGER, vals=vals.astype(np.int64)))


@pytest.mark.parametrize("codec", ["dict_rans", "dict_rank", "for_bitpack", "rle", "auto"])
def test_bitflip_caught_or_raises(codec):
    vals = _token_chunk()
    blob, _footer = encode_column(vals, codec=codec)
    want = _reference_checksum(vals)
    n_sites = 25
    step = max(1, len(blob) // n_sites)
    silent_wrong = []
    for pos in range(0, len(blob), step):
        for bit in (0, 5):
            b = bytearray(blob)
            b[pos] ^= 1 << bit
            try:
                dec = decode_column(bytes(b))
            except CONTROLLED:
                continue  # controlled failure: acceptable
            got = _checksum(dec)
            ok_values = got == want and np.array_equal(
                dec.vals.astype(np.int64), vals.astype(np.int64)
            )
            if ok_values:
                continue  # flip landed in dead space (padding) — harmless
            if got == want:
                silent_wrong.append((pos, bit, "checksum collision"))
            # else: decoded wrong values but the checksum layer catches it
    assert not silent_wrong, silent_wrong


@pytest.mark.parametrize("codec", ["dict_rans", "dict_rank"])
def test_truncation_caught_or_raises(codec):
    vals = _token_chunk(50_000)
    blob, _footer = encode_column(vals, codec=codec)
    want = _reference_checksum(vals)
    for frac in (0.1, 0.5, 0.9, 0.99):
        cut = bytes(blob[: int(len(blob) * frac)])
        try:
            dec = decode_column(cut)
        except CONTROLLED:
            continue
        # a truncated blob that still "decodes" must fail the checksum
        assert _checksum(dec) != want, f"truncation at {frac} passed checksum"


def test_rans_stream_self_verifies():
    """Bit flips inside rANS page payloads (past the params) raise from
    the stream consistency check far more often than not — spot-check
    that the final-state/word-consumption guard actually fires."""
    vals = _token_chunk(100_000)
    blob, footer = encode_column(vals, codec="dict_rans")
    # corrupt well inside the first page's word stream
    pos = footer.pages[0].file_offset + footer.pages[0].byte_len // 2
    raised = 0
    for bit in range(8):
        b = bytearray(blob)
        b[pos] ^= 1 << bit
        try:
            dec = decode_column(bytes(b))
        except CONTROLLED:
            raised += 1
            continue
        # not raised: must not silently equal the original
        assert not np.array_equal(dec.vals, vals.astype(np.int64))
    assert raised >= 4, f"rANS self-check fired only {raised}/8 times"


def test_trailer_garbage_rejected():
    for junk in (b"", b"\x00" * 7, b"\xff" * 8, b"\xff" * 64):
        with pytest.raises(CONTROLLED):
            decode_column(junk)
