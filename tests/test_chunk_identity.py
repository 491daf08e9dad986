"""Chunk identity must cover the FULL chunk content.

Regression tests for the keys-only-identity collision (round 4): two
distinct chunks sharing an identical KEY vector (non-unique key_col —
events keyed by event_type, any hot key spanning > chunk_rows rows)
previously collapsed to one chunk_key, and the decode-side
dropDuplicates dropped or mixed whole chunks (measured 116/500 rows
surviving a key_col='lang' roundtrip). Identity is now a digest over
every sub-column's content checksum (_chunk_content_key) plus a
partition-local ordinal for exactly-identical duplicate chunks and a
partition salt for the shuffle-free 'none' layout.
"""

import pyspark.sql.functions as F
import pytest

from wills_columnar_format_spark.engine import (
    decode_table,
    encode_table,
    planned_chunk_keys,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_non_unique_key_roundtrip(spark, sf_dir):
    """key_col with ~5 distinct values and tiny chunks: every chunk's
    key vector repeats many times; the roundtrip must still be exact."""
    df = _docs(spark, sf_dir)
    m = encode_table(df, key_col="lang", num_partitions=4, chunk_rows=16)
    dec = decode_table(m, df.schema)
    got = sorted(map(tuple, dec.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_identical_duplicate_chunks_roundtrip(spark):
    """Chunks whose FULL content repeats (64 identical rows, 16-row
    chunks, one partition) disambiguate via the repeat ordinal."""
    df = spark.range(64).select(
        F.lit("k").alias("k"), F.lit(7).alias("v"))
    m = encode_table(df, key_col="k", num_partitions=1, chunk_rows=16)
    assert m.select("chunk_key").distinct().count() == 4
    dec = decode_table(m, df.schema)
    assert dec.count() == 64
    assert dec.filter((F.col("k") == "k") & (F.col("v") == 7)).count() == 64


def test_none_layout_cross_partition_duplicates(spark, tmp_path):
    """'none' layout: identical chunk content in two scan partitions
    must not collide (partition id is salted into the identity)."""
    p = str(tmp_path / "src")
    one = spark.range(16).select(F.lit("k").alias("k"), F.lit(1).alias("v"))
    # two identical files -> two identical scan partitions
    one.coalesce(1).write.parquet(p)
    one.coalesce(1).write.mode("append").parquet(p)
    df = spark.read.parquet(p)
    m = encode_table(df, key_col="k", partitioner="none", chunk_rows=16)
    dec = decode_table(m, df.schema)
    assert dec.count() == 32


def test_planned_keys_match_encode_keys_with_duplicates(spark, sf_dir):
    """The resume planning pass reproduces the encode's identities
    bit-for-bit — including repeat ordinals — on a non-unique key."""
    df = _docs(spark, sf_dir).select("lang", "source", "n_chars")
    kw = dict(num_partitions=4, chunk_rows=32)
    enc = encode_table(df, key_col="lang", partitioner="hash", **kw)
    got = {r.chunk_key for r in enc.select("chunk_key").distinct().collect()}
    planned = {
        r.chunk_key
        for r in planned_chunk_keys(df, "lang", 4, chunk_rows=32,
                                    partitioner="hash").collect()
    }
    assert planned == got


def test_column_sums_exact_on_non_unique_key(spark, sf_dir):
    """The metadata aggregates ride the same identity: no double-drop
    under dropDuplicates(chunk_key, column)."""
    from wills_columnar_format_spark.engine import column_sums

    df = _docs(spark, sf_dir).select("lang", "doc_id", "n_chars")
    m = encode_table(df, key_col="lang", num_partitions=4, chunk_rows=16)
    sums = {r.column_name: (int(r.v_sum), r.n_rows)
            for r in column_sums(m).collect()}
    want = df.agg(F.sum("doc_id"), F.sum("n_chars"), F.count(F.lit(1))).first()
    assert sums["doc_id"] == (want[0], want[2])
    assert sums["n_chars"] == (want[1], want[2])
