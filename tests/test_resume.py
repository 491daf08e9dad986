"""Checkpoint/resume tests (north-rule resumability): a run that loses
partitions mid-job resumes from the manifest, re-encodes only the missing
chunks, and re-encoded chunks are byte-identical (checksummed lineage).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table
from wills_columnar_format_spark.engine import (
    committed_set,
    decode_table,
    encode_table_resumable,
)

N_ROWS = 6_000


@pytest.fixture(scope="module")
def token_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok_resume") / "token_table")
    ensure_token_table(path, N_ROWS, seed=7)
    return spark.read.parquet(path)


def test_resume_after_partial_failure(spark, token_df, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "manifest")

    # run 1: partitions 1 and 3 "crash" (emit nothing) — partial manifest
    m1 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        fail_parts=frozenset({1, 3}), snapshot_id="snap-A",
    )
    parts1 = {r.part_id for r in m1.select("part_id").distinct().collect()}
    assert parts1 and 1 not in parts1 and 3 not in parts1
    n1 = m1.count()

    # run 2: resume — only the missing chunks are encoded
    m2 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        snapshot_id="snap-A",
    )
    parts2 = {r.part_id for r in m2.select("part_id").distinct().collect()}
    assert parts2 == {0, 1, 2, 3}
    n2 = m2.count()
    assert n2 > n1

    # full decode equals the input per row
    decoded = decode_table(m2, token_df.schema)
    bad = (
        decoded.alias("d").join(token_df.alias("o"), "doc_id")
        .filter(~(F.col("d.tokens") == F.col("o.tokens")))
        .count()
    )
    assert bad == 0
    assert decoded.count() == N_ROWS

    # run 3: everything committed — nothing new is appended (idempotent)
    m3 = encode_table_resumable(
        token_df, ckpt, key_col="doc_id", num_partitions=4, chunk_rows=2048,
        snapshot_id="snap-A",
    )
    assert m3.count() == n2


def test_reencode_is_byte_identical(spark, token_df, tmp_path_factory):
    """Codec choice is a pure function of chunk values, so re-encoding a
    chunk reproduces identical blobs (SURVEY.md §7.3 determinism)."""
    ckpt_a = str(tmp_path_factory.mktemp("ckpt_a") / "m")
    ckpt_b = str(tmp_path_factory.mktemp("ckpt_b") / "m")
    kw = dict(key_col="doc_id", num_partitions=4, chunk_rows=2048, snapshot_id="s")
    ma = encode_table_resumable(token_df, ckpt_a, **kw)
    mb = encode_table_resumable(token_df, ckpt_b, **kw)
    a = {(r.part_id, r.chunk_id, r.column): (r.checksum, bytes(r.blob)) for r in ma.collect()}
    b = {(r.part_id, r.chunk_id, r.column): (r.checksum, bytes(r.blob)) for r in mb.collect()}
    assert a == b


def test_committed_set_roundtrip(spark, token_df, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_c") / "m")
    assert committed_set(spark, ckpt) == frozenset()
    m = encode_table_resumable(token_df, ckpt, key_col="doc_id", num_partitions=2, chunk_rows=4096)
    cs = committed_set(spark, ckpt)
    assert len(cs) == m.count()
