"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns; decode /
feature-extraction runs as vectorized pandas UDFs over ``mapInPandas``
batches. The actual media decoding is STUBBED (the sandbox has no
image/audio libraries) behind ``decode_media`` — the Spark-side plumbing
(schema, batching, UDF signature) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd


def decode_media(payload: bytes, media_type: str) -> dict:
    """STUB: real deployments plug a codec here (PIL/ffmpeg/...)."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; metadata extraction below does not need it"
    )


def extract_binary_meta(df, payload_col: str, id_col: str):
    """(id, n_bytes, head_byte) metadata for a binary column — the decode-
    free part of a multimodal pipeline.

    Fully vectorized over Arrow buffers via ``mapInArrow``: lengths are a
    diff of the offsets buffer, head bytes a gather of the data buffer at
    the value offsets — zero per-row Python on the payload path (billions
    of media payloads would crawl through ``Series.map``)."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            arr = b.column(payload_col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            big = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
            off = np.frombuffer(
                arr.buffers()[1], dtype=np.int64 if big else np.int32
            )[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
            dbuf = arr.buffers()[2]
            data = (
                np.frombuffer(dbuf, dtype=np.uint8)
                if dbuf is not None
                else np.empty(0, dtype=np.uint8)
            )
            lens = np.diff(off)
            # the Arrow spec allows ARBITRARY offsets under null slots:
            # lens/head there would be garbage read from unrelated buffer
            # bytes — mask by the validity bitmap and emit NULL metadata
            # for NULL payloads instead of trusting the offsets
            valid = np.asarray(arr.is_valid())
            lens[~valid] = 0
            head = np.full(len(arr), -1, dtype=np.int32)
            nz = (lens > 0) & valid
            head[nz] = data[off[:-1][nz]]
            ids = b.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            yield pa.RecordBatch.from_arrays(
                [
                    # declared schema says bigint: cast narrower id types
                    # (the old pandas path coerced silently)
                    ids.cast(pa.int64()),
                    pa.array(lens, type=pa.int64(), mask=~valid),
                    pa.array(head, type=pa.int32(), mask=~valid),
                ],
                [id_col, "n_bytes", "head_byte"],
            )

    return df.mapInArrow(fn, schema=f"{id_col} bigint, n_bytes bigint, head_byte int")


def frame_sample_stub(df, payload_col: str, id_col: str, every_n: int = 10):
    """Deterministic fake 'frame sampling': slices the payload every
    ``every_n`` bytes as stand-in frames, returning (id, frame_idx,
    frame_bytes). Shows the explode-shaped output schema a real video
    sampler would produce."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                for j, start in enumerate(range(0, len(b), every_n)):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(bytes(b[start : start + every_n]))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame": frames})

    return df.mapInPandas(fn, schema=f"{id_col} bigint, frame_idx int, frame binary")
