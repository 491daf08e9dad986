"""Deterministic synthetic token table (BASELINE.json ``input_hint``):

    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Pre-tokenized training sequences at small scale for tests/benchmarks (no
external data). Generation is fully vectorized numpy + a single Arrow
ListArray build, seeded (default 42) so every run produces byte-identical
tables — required for resumability/checksum tests (SURVEY.md §7.3).

Per-source token distributions exercise every codec (FIXTURES.md §1):
  web   — Zipf-heavy ids with repeated stretches   → RLE / dict
  books — random-walk ids (locally narrow ranges)  → frame-of-reference
  code  — tiny alphabet                            → dict / bit-pack
  wiki  — uniform wide                             → plain fallback
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_257
SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_P = np.array([0.6, 0.15, 0.15, 0.1])


def token_table_arrow(n_rows: int, seed: int = 42, doc_start: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)

    # skewed (Zipf-ish) sequence lengths in [1, 2048] — exercises salting
    lengths = np.minimum((rng.pareto(1.1, n_rows) * 60).astype(np.int64) + 1, 2048)
    total = int(lengths.sum())
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    tokens = rng.integers(0, VOCAB, size=total).astype(np.int32)
    row_src = np.repeat(src_idx, lengths)

    # web: heavy repetition — quantize to a small id set and clone-forward
    web = row_src == 0
    tokens[web] = (tokens[web] % 512) * 97 % VOCAB
    rep = web.copy()
    rep[1:] &= rng.random(total - 1) < 0.55  # ~55% of web tokens repeat prior
    rep[0] = False
    idx = np.arange(total)
    idx[rep] = 0
    np.maximum.accumulate(idx, out=idx)
    tokens = tokens[idx]

    # books: random walk (frame-of-reference friendly)
    books = row_src == 1
    steps = rng.integers(-64, 65, size=int(books.sum())).astype(np.int64)
    walk = 25_000 + np.cumsum(steps)
    tokens[books] = np.clip(walk % VOCAB, 0, VOCAB - 1).astype(np.int32)

    # code: tiny alphabet
    code = row_src == 2
    tokens[code] = (tokens[code] % 96).astype(np.int32)

    doc_num = np.arange(doc_start, doc_start + n_rows)
    doc_id = np.char.add(
        np.char.add(SOURCES[src_idx].astype("U8"), "-"),
        np.char.zfill(doc_num.astype("U9"), 9),
    )

    values = pa.array(tokens, type=pa.int32())
    tok_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)
    return pa.table(
        {
            "doc_id": pa.array(doc_id.tolist(), type=pa.string()),
            "tokens": tok_list,
            "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
            "source": pa.array(SOURCES[src_idx].tolist(), type=pa.string()),
        }
    )


def write_token_table(path: str, n_rows: int, seed: int = 42, rows_per_file: int = 250_000) -> str:
    """Write the synthetic table as parquet (chunked to bound memory)."""
    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        # chunk seed derives from (seed, part) so files are independent and
        # the whole table is still deterministic; doc numbering is global
        # so doc_id stays unique across files
        t = token_table_arrow(n, seed=seed * 1_000_003 + part, doc_start=start)
        pq.write_table(t, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return path


def ensure_token_table(path: str, n_rows: int, seed: int = 42, rows_per_file: int = 250_000) -> str:
    """Generate the table at ``path`` if not already there (cached)."""
    marker = os.path.join(path, f".complete-{n_rows}-{seed}-{rows_per_file}")
    if not os.path.exists(marker):
        import shutil

        if os.path.isdir(path):
            shutil.rmtree(path)
        write_token_table(path, n_rows, seed, rows_per_file=rows_per_file)
        open(marker, "w").close()
    return path
