"""Logical type tags and the decode-time type guard.

Tags 0-4 carry exactly the reference's ``DataType`` enum values
(src/lib.rs:59-66): UnsignedByte=0, SignedByte=1, UnsignedInteger=2,
SignedInteger=3, String=4 — including the reference's width coarsening
(the footer records only the signedness class, so an i64 column decodes
as i16/i32/i64 alike, src/lib.rs:103-108). Tags 5-7 extend the enum for
real-table coverage (float32/float64/binary), which the reference lacks.

The decode-time guard mirrors ``DataType::is_supported::<T>()``
(src/lib.rs:92-113) + the typed mismatch error (src/decode.rs:6-22,44-50).
"""

from __future__ import annotations

import numpy as np

UNSIGNED_BYTE = 0
SIGNED_BYTE = 1
UNSIGNED_INTEGER = 2
SIGNED_INTEGER = 3
STRING = 4
FLOAT32 = 5
FLOAT64 = 6
BINARY = 7

TAG_NAMES = {
    UNSIGNED_BYTE: "UnsignedByte",
    SIGNED_BYTE: "SignedByte",
    UNSIGNED_INTEGER: "UnsignedInteger",
    SIGNED_INTEGER: "SignedInteger",
    STRING: "String",
    FLOAT32: "Float32",
    FLOAT64: "Float64",
    BINARY: "Binary",
}


class UnsupportedDataType(TypeError):
    """Decode requested under a dtype the stored tag does not support.

    Analogue of the reference's ``Error::UnsupportedDataType``
    (src/decode.rs:6-22), raised before any page is decoded
    (src/decode.rs:44-50).
    """


# numpy dtype -> (tag, is_integer-class) — like DataType::from_type's
# TypeId dispatch (src/lib.rs:86-113).
_NUMPY_TO_TAG = {
    np.dtype(np.uint8): UNSIGNED_BYTE,
    np.dtype(np.int8): SIGNED_BYTE,
    np.dtype(np.uint16): UNSIGNED_INTEGER,
    np.dtype(np.uint32): UNSIGNED_INTEGER,
    np.dtype(np.uint64): UNSIGNED_INTEGER,
    np.dtype(np.int16): SIGNED_INTEGER,
    np.dtype(np.int32): SIGNED_INTEGER,
    np.dtype(np.int64): SIGNED_INTEGER,
    np.dtype(np.float32): FLOAT32,
    np.dtype(np.float64): FLOAT64,
}

# Which numpy dtypes may decode a stored tag (width coarsening per
# src/lib.rs:95-113: the class must match, widths are wire-compatible).
_TAG_ACCEPTS = {
    UNSIGNED_BYTE: {np.dtype(np.uint8)},
    SIGNED_BYTE: {np.dtype(np.int8)},
    UNSIGNED_INTEGER: {np.dtype(np.uint16), np.dtype(np.uint32), np.dtype(np.uint64)},
    SIGNED_INTEGER: {np.dtype(np.int16), np.dtype(np.int32), np.dtype(np.int64)},
    FLOAT32: {np.dtype(np.float32)},
    FLOAT64: {np.dtype(np.float64)},
}

INTEGER_TAGS = {UNSIGNED_BYTE, SIGNED_BYTE, UNSIGNED_INTEGER, SIGNED_INTEGER}
VARLEN_TAGS = {STRING, BINARY}
FLOAT_TAGS = {FLOAT32, FLOAT64}


def tag_for_numpy(dtype: np.dtype) -> int:
    """Resolve the stored tag for a numpy dtype (encode-time dispatch).

    Unsupported dtypes raise cleanly (the reference panics with a TODO,
    src/encode.rs:16-17 — we return an error instead, as its TODO asks).
    """
    try:
        return _NUMPY_TO_TAG[np.dtype(dtype)]
    except KeyError:
        raise UnsupportedDataType(f"unsupported encode dtype: {dtype}") from None


def check_decode_dtype(stored_tag: int, requested: np.dtype | str) -> None:
    """Raise UnsupportedDataType unless ``requested`` may decode ``stored_tag``."""
    if requested in ("string", "str"):
        if stored_tag != STRING:
            raise UnsupportedDataType(
                f"column stores {TAG_NAMES.get(stored_tag, stored_tag)}, not String"
            )
        return
    if requested in ("binary", "bytes"):
        if stored_tag != BINARY:
            raise UnsupportedDataType(
                f"column stores {TAG_NAMES.get(stored_tag, stored_tag)}, not Binary"
            )
        return
    dt = np.dtype(requested)
    if dt not in _TAG_ACCEPTS.get(stored_tag, set()):
        raise UnsupportedDataType(
            f"column stores {TAG_NAMES.get(stored_tag, stored_tag)}; "
            f"cannot decode as {dt}"
        )


def is_signed_tag(tag: int) -> bool:
    return tag in (SIGNED_BYTE, SIGNED_INTEGER)
