"""Per-chunk key Bloom filters: hash-layout point lookups must prune
chunks the key zone maps can't, with zero false negatives and
deterministic (resume byte-identical) filter bytes."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    _bloom_contains_any,
    _bloom_hashes,
    _bloom_keep_chunks,
    _key_bloom,
    decode_checkpoint,
    decode_table,
    encode_table,
    write_checkpoint,
)


def _contains_one(blob: bytes, key) -> bool:
    if isinstance(key, str):
        probe = np.asarray([key], dtype=object)
    else:
        probe = np.array([float(key)], dtype=np.float64)
    h1, h2 = _bloom_hashes(probe)
    return _bloom_contains_any(blob, h1, h2)


def test_no_false_negatives_int_float_str():
    for keys in (
        pa.array(np.arange(5000, dtype=np.int64) * 37 + 11),
        pa.array(np.linspace(-100.0, 100.0, 3000)),
        pa.array([f"doc-{i:06d}" for i in range(2000)]),
    ):
        blob = _key_bloom(keys)
        assert blob is not None
        for k in keys.to_pylist()[::97]:
            assert _contains_one(blob, k), k


def test_false_positive_rate_bounded():
    blob = _key_bloom(pa.array(np.arange(10_000, dtype=np.int64)))
    probes = np.arange(1_000_000, 1_050_000, dtype=np.float64)
    h1, h2 = _bloom_hashes(probes)
    fp = sum(
        _bloom_contains_any(blob, h1[i : i + 1], h2[i : i + 1])
        for i in range(0, len(probes), 500)
    )
    assert fp / (len(probes) / 500) < 0.05


def test_unreliable_keys_yield_no_bloom():
    assert _key_bloom(pa.array([], type=pa.int64())) is None
    assert _key_bloom(pa.array([1, None, 3])) is None
    assert _key_bloom(pa.array([1.0, float("nan")])) is None
    assert _key_bloom(pa.array([True, False])) is None


def test_bloom_bytes_deterministic():
    keys = pa.array(np.arange(1234, dtype=np.int64))
    assert _key_bloom(keys) == _key_bloom(keys)


def test_int_probe_matches_int64_build_past_float_precision():
    # both sides canonicalize through float64 — a >2^53 int must still
    # be FOUND (errors land in the false-positive direction only)
    big = (1 << 60) + 1
    blob = _key_bloom(pa.array([big, 7], type=pa.int64()))
    assert _contains_one(blob, big)
    assert _contains_one(blob, 7)


@pytest.fixture(scope="module")
def hash_manifest(spark):
    """documents-like table, HASH layout (every chunk spans the full key
    range — zone maps prune nothing), small chunks so there are many."""
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    m = encode_table(df, key_col="doc_id", num_partitions=4,
                     partitioner="hash", chunk_rows=256)
    return df, m.localCheckpoint(eager=True)


def test_bloom_keep_chunks_prunes_hash_layout(spark, hash_manifest):
    df, m = hash_manifest
    total = m.filter(F.col("column") == "doc_id").count()
    keep = _bloom_keep_chunks(m, [17, 3999], "doc_id")
    assert keep is not None
    # 2 keys live in <= 2 chunks; FPs may add a few more — but pruning
    # must beat zone maps (which keep ALL chunks in the hash layout)
    assert len(keep) <= max(4, total // 4)
    assert len(keep) >= 1


def test_keys_decode_equals_filter_on_hash_layout(spark, hash_manifest):
    df, m = hash_manifest
    want = [17, 1234, 3999]
    got = decode_table(m, df.schema, keys=want, key_col="doc_id")
    exp = df.filter(F.col("doc_id").isin(want))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_keys_decode_survives_legacy_manifest(spark, hash_manifest):
    df, m = hash_manifest
    got = decode_table(m.drop("key_bloom"), df.schema, keys=[17], key_col="doc_id")
    assert [r.text for r in got.collect()] == ["text-17"]


def test_checkpoint_keys_decode_bloom(spark, hash_manifest, tmp_path):
    df, m = hash_manifest
    ckpt = str(tmp_path / "ckpt")
    write_checkpoint(m, ckpt, schema=df.schema)
    got = decode_checkpoint(spark, ckpt, df.schema, keys=[42, 2042], key_col="doc_id")
    exp = df.filter(F.col("doc_id").isin([42, 2042]))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_checkpoint_keys_decode_prunes_files(spark, hash_manifest, tmp_path):
    """File+chunk pruning: with 2 probe keys the bloom keep-set names
    ~2 chunks, so the per-file chunk lists must exclude nearly all of
    the 4000/256 ≈ 16 chunks (asserted via the keep-set size)."""
    df, m = hash_manifest
    keep = _bloom_keep_chunks(m, [42, 2042], "doc_id", extra_cols=())
    total = m.filter(F.col("column") == "doc_id").count()
    assert keep is not None and len(keep) < total


def test_string_keys_end_to_end(spark):
    df = spark.range(0, 800).select(
        F.concat(F.lit("k"), F.format_string("%04d", F.col("id"))).alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    m = encode_table(df, key_col="k", num_partitions=2,
                     partitioner="hash", chunk_rows=128)
    got = decode_table(m, df.schema, keys=["k0042", "k0777"], key_col="k")
    assert sorted(r.v for r in got.collect()) == [42 * 3, 777 * 3]
