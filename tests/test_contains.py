"""contains= (ARRAY-membership) pushdown + per-chunk value Bloom filters.

The canary-token / contamination-lookup shape: "which documents contain
token t?" over a ``tokens array<int32>`` corpus. Zone maps on the
flattened elements prune little (a chunk of wide-vocab docs spans most
of the value range); the opt-in ``encode_table(value_blooms=True)``
Bloom filters restore the prune with no false negatives. Exactness
always comes from the ``arrays_overlap`` post-filter.
"""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import data
from wills_columnar_format_spark.engine import (
    DONE_COLUMN,
    _bloom_eligible,
    _contains_hit_keys,
    _prepare_contains,
    _value_bloom,
    decode_checkpoint,
    decode_table,
    encode_table,
)
from wills_columnar_format_spark.codecs.base import ColumnValues


@pytest.fixture(scope="module")
def token_df(spark):
    t = data.token_table_arrow(2000, seed=7)
    return spark.createDataFrame(t.to_pandas()).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def bloom_manifest(spark, token_df):
    m = encode_table(token_df, key_col="doc_id", codec="auto",
                     num_partitions=4, partitioner="hash", chunk_rows=128,
                     value_blooms=True)
    return m.localCheckpoint(eager=True)


def _expected_ids(token_df, probes):
    cond = F.array_contains("tokens", probes[0])
    for p in probes[1:]:
        cond = cond | F.array_contains("tokens", p)
    return sorted(r["doc_id"]
                  for r in token_df.filter(cond).select("doc_id").collect())


def _probe_tokens(token_df, n=3):
    rows = token_df.select("tokens").limit(n).collect()
    return [int(r["tokens"][0]) for r in rows]


def test_contains_matches_exact_filter(spark, token_df, bloom_manifest):
    probes = _probe_tokens(token_df)
    out = decode_table(bloom_manifest, token_df.schema,
                       contains=("tokens", probes))
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert got == _expected_ids(token_df, probes)
    assert got  # fixture guarantees live probes


def test_contains_prunes_chunks(spark, token_df, bloom_manifest):
    # the prune keeps a strict subset of chunks, and a SUPERSET of the
    # chunks that actually hold matches (no false negatives)
    probes = _probe_tokens(token_df, n=1)
    sub, pv, is_str, _ = _prepare_contains(
        pa.schema([pa.field("doc_id", pa.large_string()),
                   pa.field("tokens", pa.large_list(pa.int32()))]),
        ("tokens", probes))
    kept = {r["chunk_key"] for r in
            _contains_hit_keys(bloom_manifest, sub, pv, is_str).collect()}
    total = bloom_manifest.filter(F.col("column") == "tokens#values").count()
    assert 0 < len(kept) < total
    # truth: decode everything, find the chunks holding matching docs
    out = decode_table(bloom_manifest, token_df.schema,
                       contains=("tokens", probes))
    assert out.count() == len(_expected_ids(token_df, probes))


def test_blooms_opt_in_and_compression_neutral(spark, token_df):
    kw = dict(key_col="doc_id", codec="auto", num_partitions=4,
              partitioner="hash", chunk_rows=128)
    m_off = encode_table(token_df, **kw).localCheckpoint(eager=True)
    m_on = encode_table(token_df, value_blooms=True,
                        **kw).localCheckpoint(eager=True)
    assert m_off.filter(F.col("val_bloom").isNotNull()).count() == 0
    n_on = m_on.filter(F.col("val_bloom").isNotNull()).count()
    assert n_on > 0
    # metadata only — bytes_out identical with the flag on
    def sizes(m):
        return {(r["chunk_key"], r["column"]): r["bytes_out"]
                for r in m.filter(F.col("column") != DONE_COLUMN)
                .select("chunk_key", "column", "bytes_out").collect()}
    assert sizes(m_off) == sizes(m_on)


def test_blooms_deterministic(spark, token_df):
    kw = dict(key_col="doc_id", codec="auto", num_partitions=4,
              partitioner="hash", chunk_rows=128, value_blooms=True)
    def blooms(m):
        return {(r["chunk_key"], r["column"]): bytes(r["val_bloom"])
                for r in m.filter(F.col("val_bloom").isNotNull())
                .select("chunk_key", "column", "val_bloom").collect()}
    b1 = blooms(encode_table(token_df, **kw).localCheckpoint(eager=True))
    b2 = blooms(encode_table(token_df, **kw).localCheckpoint(eager=True))
    assert b1 == b2 and b1


def test_blooms_named_subcolumn_spec(spark, token_df):
    m = encode_table(token_df, key_col="doc_id", num_partitions=2,
                     partitioner="hash", chunk_rows=256,
                     value_blooms={"tokens#values"}).localCheckpoint(eager=True)
    cols = {r["column"] for r in m.filter(F.col("val_bloom").isNotNull())
            .select("column").distinct().collect()}
    assert cols == {"tokens#values"}


def test_bloom_eligibility_rules():
    assert _bloom_eligible("tokens#values", True, "doc_id")
    assert _bloom_eligible("source", True, "doc_id")
    assert _bloom_eligible("s#f:a", True, "doc_id")  # struct leaf
    assert not _bloom_eligible("doc_id", True, "doc_id")  # key: key_bloom
    assert not _bloom_eligible("tokens#lengths", True, "doc_id")
    assert not _bloom_eligible("tokens#valid", True, "doc_id")
    assert _bloom_eligible("doc_id", {"doc_id"}, "doc_id")  # explicit wins
    assert not _bloom_eligible("source", {"tokens#values"}, "doc_id")


def test_contains_checkpoint_path(spark, token_df, bloom_manifest):
    probes = _probe_tokens(token_df)
    with tempfile.TemporaryDirectory() as work:
        ckpt = os.path.join(work, "m")
        bloom_manifest.write.parquet(ckpt)
        out = decode_checkpoint(spark, ckpt, token_df.schema,
                                contains=("tokens", probes))
        got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
        assert got == _expected_ids(token_df, probes)


def test_contains_string_elements(spark):
    rows = [(i, [f"w{i % 7}", f"w{(i * 3) % 11}"]) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, words array<string>")
    m = encode_table(df, key_col="id", num_partitions=2, partitioner="range",
                     chunk_rows=64, value_blooms=True)
    out = decode_table(m.localCheckpoint(eager=True), df.schema,
                       contains=("words", ["w3", "w10"]))
    got = sorted(r["id"] for r in out.collect())
    exp = sorted(r["id"] for r in df.filter(
        F.arrays_overlap("words", F.array(F.lit("w3"), F.lit("w10")))
    ).collect())
    assert got == exp and got


def test_contains_composes_with_value_range(spark, token_df, bloom_manifest):
    probes = _probe_tokens(token_df, n=2)
    out = decode_table(bloom_manifest, token_df.schema,
                       contains=("tokens", probes),
                       value_range=("n_tok", 1, 50))
    exp = sorted(
        r["doc_id"] for r in token_df
        .filter((F.col("n_tok") <= 50) & (
            F.array_contains("tokens", probes[0])
            | F.array_contains("tokens", probes[1])))
        .select("doc_id").collect())
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == exp


def test_contains_no_blooms_still_exact(spark, token_df):
    # legacy/bloom-less manifest: zone maps + exact filter only
    m = encode_table(token_df, key_col="doc_id", num_partitions=2,
                     partitioner="hash", chunk_rows=256)
    probes = _probe_tokens(token_df)
    out = decode_table(m.localCheckpoint(eager=True), token_df.schema,
                       contains=("tokens", probes))
    got = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert got == _expected_ids(token_df, probes)


def test_contains_type_guards(spark, token_df, bloom_manifest):
    with pytest.raises(ValueError, match="empty value list"):
        decode_table(bloom_manifest, token_df.schema, contains=("tokens", []))
    with pytest.raises(TypeError, match="LIST column"):
        decode_table(bloom_manifest, token_df.schema,
                     contains=("source", ["web"]))
    with pytest.raises(TypeError, match="int/float"):
        decode_table(bloom_manifest, token_df.schema,
                     contains=("tokens", ["7"]))
    with pytest.raises(TypeError, match="NaN"):
        decode_table(bloom_manifest, token_df.schema,
                     contains=("tokens", [float("nan")]))
    with pytest.raises(KeyError, match="not in the decoded output"):
        decode_table(bloom_manifest, token_df.schema,
                     contains=("nope", [1]))


def test_value_bloom_unit():
    # numeric: distinct-sized, NaN-tolerant, membership holds
    cv = ColumnValues.from_numpy(np.array([5, 5, 9, 9, 9, 42], np.int32))
    blob = _value_bloom(cv)
    from wills_columnar_format_spark.engine import (_bloom_contains_any,
                                                    _bloom_hashes)
    for v, want in ((5.0, True), (9.0, True), (42.0, True)):
        h1, h2 = _bloom_hashes(np.array([v], np.float64))
        assert _bloom_contains_any(blob, h1, h2) is want
    # absent value: overwhelmingly likely miss at 10 bits/key — check a
    # band of values and require most to miss
    misses = 0
    for v in range(1000, 1100):
        h1, h2 = _bloom_hashes(np.array([float(v)], np.float64))
        misses += not _bloom_contains_any(blob, h1, h2)
    assert misses > 90
    # NaN-only numeric -> None; empty -> None; strings -> real filter
    assert _value_bloom(ColumnValues.from_numpy(
        np.array([np.nan], np.float64))) is None
    assert _value_bloom(ColumnValues.from_numpy(
        np.array([], np.int64))) is None
    sblob = _value_bloom(ColumnValues.from_pylist(["aa", "bb", "aa"]))
    h1, h2 = _bloom_hashes(np.asarray(["bb"], dtype=object))
    assert _bloom_contains_any(sblob, h1, h2)


def test_contains_with_null_lists(spark):
    # allow_nulls: NULL list slots ride the #valid mask; a NULL array
    # never matches (arrays_overlap(NULL, ...) is UNKNOWN — filtered),
    # matching SQL / DuckDB list_has_any semantics. (Null ELEMENTS
    # inside lists remain unsupported by the format — pre-existing.)
    rows = [(1, [7, 9]), (2, None), (3, [8]), (4, [7, 8])]
    df = spark.createDataFrame(rows, "id long, xs array<int>")
    m = encode_table(df, key_col="id", num_partitions=1, chunk_rows=2,
                     allow_nulls=True, value_blooms=True)
    out = decode_table(m.localCheckpoint(eager=True), df.schema,
                       contains=("xs", [7]))
    assert sorted(r["id"] for r in out.collect()) == [1, 4]
