"""Public single-column API: the analogue of the reference's three entry
points ``encode_column`` / ``decode_column`` / ``decode_footer``
(src/lib.rs:25-48), vectorized over numpy/Arrow values instead of a Rust
iterator.
"""

from __future__ import annotations

import numpy as np

from . import dtypes
from .codecs import BY_ID, BY_NAME, ColumnValues
from .format import DEFAULT_TARGET_PAGE_SIZE, Footer, assemble_blob, data_section, read_footer
from .selector import choose_codec


def encode_column(
    values,
    codec: str = "auto",
    target_page_size: int = DEFAULT_TARGET_PAGE_SIZE,
) -> tuple[bytes, Footer]:
    """Encode one typed column into a self-describing blob.

    ``values`` may be a numpy array, a pyarrow Array, or a python list of
    int/str/bytes. ``codec``: 'auto' (selector, the reference's V2
    "automatically determine if RLE should be applied" wish, org:202) or
    one of plain/rle/dict/for_bitpack/fsst. Returns (blob, footer) like
    the reference returns the Footer from encode (src/lib.rs:25-33).
    """
    col = _to_column_values(values)
    if codec == "auto":
        chosen, enc = choose_codec(col, target_page_size)
        if enc is None:
            enc = chosen.encode(col, target_page_size)
    else:
        chosen = BY_NAME[codec]
        if not chosen.supports(col.tag):
            raise dtypes.UnsupportedDataType(
                f"codec {codec} does not support {dtypes.TAG_NAMES.get(col.tag)}"
            )
        enc = chosen.encode(col, target_page_size)
    footer = Footer(data_type=col.tag, codec=chosen.codec_id, params=enc.params, pages=enc.page_infos)
    return assemble_blob(enc.pages, footer), footer


def decode_footer(blob: bytes) -> Footer:
    """Metadata-only read from the end of the blob (src/lib.rs:45-48)."""
    return read_footer(blob)


def decode_column(blob: bytes, dtype=None) -> ColumnValues:
    """Decode a blob back to values, with the reference's decode-time type
    guard (src/decode.rs:44-50) when ``dtype`` is given."""
    footer = read_footer(blob)
    if dtype is not None:
        dtypes.check_decode_dtype(footer.data_type, dtype)
    codec = BY_ID[footer.codec]
    col = codec.decode(data_section(blob), footer)
    if dtype is not None and dtype not in ("string", "str", "binary", "bytes"):
        col = ColumnValues(tag=col.tag, vals=col.vals.astype(np.dtype(dtype)))
    return col


def decode_column_slice(blob: bytes, start: int, stop: int, dtype=None) -> ColumnValues:
    """Decode only rows [start, stop) — page skipping via the footer index.

    This is the reference's V1 "efficient row skipping" wish made real
    (wills-columnar-format.org:187-194): ``PageInfo.values_count`` +
    ``file_offset``/``byte_len`` let us decode ONLY the pages covering the
    requested row range (the reference's V0 decoder streams all pages and
    ignores file_offset, src/decode.rs:52-66). Cost is O(pages touched),
    not O(column).
    """
    footer = read_footer(blob)
    if dtype is not None:
        dtypes.check_decode_dtype(footer.data_type, dtype)
    total = footer.values_count
    start = max(0, min(start, total))
    stop = max(start, min(stop, total))
    counts = np.fromiter((p.values_count for p in footer.pages), dtype=np.int64,
                         count=len(footer.pages))
    ends = np.cumsum(counts)
    starts = ends - counts
    lo = int(np.searchsorted(ends, start, side="right"))
    hi = int(np.searchsorted(starts, stop, side="left"))
    sub = Footer(
        data_type=footer.data_type,
        codec=footer.codec,
        params=footer.params,
        pages=footer.pages[lo:hi],
    )
    codec = BY_ID[footer.codec]
    col = codec.decode(data_section(blob), sub)
    page_base = int(starts[lo]) if lo < len(footer.pages) else 0
    col = col.slice(start - page_base, stop - page_base)
    if dtype is not None and col.vals is not None:
        col = ColumnValues(tag=col.tag, vals=col.vals.astype(np.dtype(dtype)))
    return col


def decode_runs(blob: bytes) -> tuple[ColumnValues, np.ndarray]:
    """Compute-on-compressed access: (run values, run lengths) without
    expansion for RLE blobs (src/test_rle.rs:8-17); for non-RLE blobs every
    run has length 1 (``Values::single`` semantics, src/rle.rs:19-24)."""
    footer = read_footer(blob)
    codec = BY_ID[footer.codec]
    if hasattr(codec, "decode_runs"):  # rle and dict_rle expose run access
        return codec.decode_runs(data_section(blob), footer)
    col = codec.decode(data_section(blob), footer)
    return col, np.ones(col.n, dtype=np.int64)


def _to_column_values(values) -> ColumnValues:
    import pyarrow as pa

    if isinstance(values, ColumnValues):
        return values
    if isinstance(values, np.ndarray):
        return ColumnValues.from_numpy(values)
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        return ColumnValues.from_arrow(values)
    if isinstance(values, (list, tuple)):
        return ColumnValues.from_pylist(list(values))
    raise dtypes.UnsupportedDataType(f"cannot encode values of type {type(values)}")
