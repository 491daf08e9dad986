"""Codec registry. Codec ids are stable wire values (footer byte)."""

from __future__ import annotations

from .base import Codec, ColumnValues, Encoded
from .delta import DeltaCodec
from .dict_rle import DictRleCodec
from .dict_varint import DictVarintCodec
from .dictionary import DictCodec
from .foref import ForCodec
from .fsplit import FloatSplitCodec
from .fsst import FsstCodec
from .plain import PlainCodec
from .rans import DictRansCodec
from .rle import RleCodec

PLAIN = PlainCodec()
RLE = RleCodec()
DICT = DictCodec()
FOR = ForCodec()
FSST = FsstCodec()
DICT_RLE = DictRleCodec()
DELTA = DeltaCodec()
FLOAT_SPLIT = FloatSplitCodec()
DICT_VARINT = DictVarintCodec()
DICT_RANS = DictRansCodec()

ALL_CODECS: list[Codec] = [PLAIN, RLE, DICT, FOR, FSST, DICT_RLE, DELTA, FLOAT_SPLIT, DICT_VARINT, DICT_RANS]
BY_ID: dict[int, Codec] = {c.codec_id: c for c in ALL_CODECS}
BY_NAME: dict[str, Codec] = {c.name: c for c in ALL_CODECS}

__all__ = [
    "Codec",
    "ColumnValues",
    "Encoded",
    "PLAIN",
    "RLE",
    "DICT",
    "FOR",
    "FSST",
    "DICT_RLE",
    "DELTA",
    "FLOAT_SPLIT",
    "DICT_VARINT",
    "DICT_RANS",
    "ALL_CODECS",
    "BY_ID",
    "BY_NAME",
]
