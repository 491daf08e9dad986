"""wills_columnar_format_spark — a brand-new PySpark-native per-column
lightweight-compression engine (dict, RLE, FSST, bit-pack,
frame-of-reference) with codec auto-selection.

Correctness reference: wmedrano/wills-columnar-format (read-only at
/root/reference) — its data model, page/footer/trailer layout, RLE
semantics, and roundtrip test vectors. The implementation is Spark-first:
all kernels are vectorized numpy/Arrow programs running inside
``mapInPandas`` (zero per-row Python); partitioning, skew salting, and
shuffle sizing are explicit (see engine.py).
"""

from .column import decode_column, decode_footer, decode_runs, encode_column
from .dtypes import UnsupportedDataType
from .format import Footer, PageInfo

__all__ = [
    "encode_column",
    "decode_column",
    "decode_footer",
    "decode_runs",
    "Footer",
    "PageInfo",
    "UnsupportedDataType",
]

__version__ = "0.1.0"
