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
    free part of a multimodal pipeline, vectorized via mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col]
            n_bytes = payload.map(len).astype("int64")
            head = payload.map(lambda b: int(b[0]) if len(b) else -1).astype("int32")
            yield pd.DataFrame({id_col: pdf[id_col], "n_bytes": n_bytes, "head_byte": head})

    return df.mapInPandas(fn, schema=f"{id_col} bigint, n_bytes bigint, head_byte int")


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
