"""Format-layer tests: varint/zigzag kernels, footer/trailer roundtrip.

Mirrors the reference's physical-contract test (src/test_bincode.rs:14-53)
for our wire rules.
"""

import numpy as np
import pytest

from wills_columnar_format_spark.format import (
    Footer,
    PageInfo,
    assemble_blob,
    read_footer,
    uvarint_decode,
    uvarint_encode,
    uvarint_lengths,
    zigzag_decode,
    zigzag_encode,
)


def test_uvarint_roundtrip_small_and_large():
    vals = np.array([0, 1, 127, 128, 255, 300, 2**21, 2**35, 2**63, 2**64 - 1], dtype=np.uint64)
    buf, lens = uvarint_encode(vals)
    # reference bincode: ±1 → 1 byte (test_bincode.rs:17-21); 255u16 needs >1
    assert lens[0] == 1 and lens[1] == 1 and lens[2] == 1
    assert lens[3] == 2 and lens[4] == 2
    assert lens[-1] == 10
    out, used = uvarint_decode(buf, len(vals))
    assert used == len(buf)
    assert np.array_equal(out, vals)


def test_uvarint_lengths_match_encode():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**62, size=10_000).astype(np.uint64)
    buf, lens = uvarint_encode(vals)
    assert np.array_equal(lens, uvarint_lengths(vals))
    out, _ = uvarint_decode(buf, len(vals))
    assert np.array_equal(out, vals)


def test_zigzag_roundtrip():
    vals = np.array([0, -1, 1, -2, 2, np.iinfo(np.int64).min, np.iinfo(np.int64).max], dtype=np.int64)
    zz = zigzag_encode(vals)
    # small magnitudes -> small codes (so ±1 costs 1 varint byte, like bincode)
    assert zz[0] == 0 and zz[1] == 1 and zz[2] == 2
    assert np.array_equal(zigzag_decode(zz), vals)


def test_empty_varint():
    buf, lens = uvarint_encode(np.empty(0, np.uint64))
    assert len(buf) == 0
    out, used = uvarint_decode(np.empty(0, np.uint8), 0)
    assert len(out) == 0 and used == 0


def test_footer_roundtrip():
    f = Footer(
        data_type=3,
        codec=1,
        params=b"\x01\x02",
        pages=[PageInfo(0, 2048, 1000, 17), PageInfo(2048, 99, 5, 5)],
    )
    blob = assemble_blob([b"x" * 2048, b"y" * 99], f)
    g = read_footer(blob)
    assert g == f
    # trailer is the last 8 bytes, little-endian footer size
    # (reference src/encode.rs:37-38, src/decode.rs:28-31)
    import struct

    (fsize,) = struct.unpack("<Q", blob[-8:])
    assert fsize == len(f.serialize())
    assert blob[: 2048 + 99] == b"x" * 2048 + b"y" * 99


def test_footer_bad_magic():
    with pytest.raises(ValueError):
        Footer.deserialize(b"NOPE\x01\x00\x00\x00\x00")


def test_checksum_is_width_canonical():
    """The content hash must be a function of VALUES, not storage width:
    the encoder hashes input arrays (int32 lengths, uint8 masks) while
    the decoder returns class-widened values — verify_checksums depends
    on both hashing identically."""
    import numpy as np

    from wills_columnar_format_spark.codecs.base import ColumnValues
    from wills_columnar_format_spark.engine import _checksum

    v32 = np.array([1, -2, 30_000, 0], dtype=np.int32)
    assert _checksum(ColumnValues.from_numpy(v32)) == _checksum(
        ColumnValues.from_numpy(v32.astype(np.int64))
    )
    u8 = np.array([0, 1, 1, 0, 255], dtype=np.uint8)
    assert _checksum(ColumnValues.from_numpy(u8)) == _checksum(
        ColumnValues.from_numpy(u8.astype(np.uint64))
    )
    f32 = np.array([0.5, -1.25, 3e7], dtype=np.float32)
    assert _checksum(ColumnValues.from_numpy(f32)) == _checksum(
        ColumnValues.from_numpy(f32.astype(np.float64))
    )
    # different VALUES must still differ
    assert _checksum(ColumnValues.from_numpy(v32)) != _checksum(
        ColumnValues.from_numpy(v32 + 1)
    )
    # NOTE: int64 -1 and uint64 2^64-1 share bit patterns and therefore
    # hash equal — harmless, because the decoder preserves the encoded
    # signedness class (dtype_tag), so a verify never compares a chunk
    # against the other class's hash.
