"""Multimodal binary-column plumbing: metadata extraction must be
Arrow-buffer vectorized AND null-safe — the Arrow spec allows arbitrary
offsets under null slots, so trusting the offsets buffer there reads
garbage from unrelated bytes."""
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StructField, StructType)

from wills_columnar_format_spark.operators.multimodal import (
    extract_binary_meta, frame_sample_stub)


def test_binary_meta_basic(spark):
    df = spark.createDataFrame(
        [(1, b"\x07abc"), (2, b""), (3, b"\xffxyz0123")],
        "id bigint, payload binary")
    got = {r["id"]: (r["n_bytes"], r["head_byte"])
           for r in extract_binary_meta(df, "payload", "id").collect()}
    assert got == {1: (4, 0x07), 2: (0, -1), 3: (8, 0xFF)}


def test_binary_meta_null_payloads(spark):
    """NULL payloads yield NULL metadata (not garbage lengths read from
    neighbouring slots' offsets, not a crash)."""
    schema = StructType([StructField("id", LongType()),
                         StructField("payload", BinaryType())])
    df = spark.createDataFrame(
        [(1, b"\x42abcdef"), (2, None), (3, b""), (4, None), (5, b"\x01")],
        schema)
    rows = {r["id"]: r for r in
            extract_binary_meta(df, "payload", "id").collect()}
    assert rows[1]["n_bytes"] == 7 and rows[1]["head_byte"] == 0x42
    assert rows[2]["n_bytes"] is None and rows[2]["head_byte"] is None
    assert rows[3]["n_bytes"] == 0 and rows[3]["head_byte"] == -1
    assert rows[4]["n_bytes"] is None and rows[4]["head_byte"] is None
    assert rows[5]["n_bytes"] == 1 and rows[5]["head_byte"] == 1


def test_binary_meta_all_null_batch(spark):
    schema = StructType([StructField("id", LongType()),
                         StructField("payload", BinaryType())])
    df = spark.createDataFrame([(i, None) for i in range(10)], schema)
    out = extract_binary_meta(df, "payload", "id").collect()
    assert len(out) == 10
    assert all(r["n_bytes"] is None and r["head_byte"] is None for r in out)


def test_binary_meta_on_testdata(spark):
    """Real documents table: n_bytes must equal Spark's own length()."""
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", F.encode("text", "utf-8").alias("payload"))
          .withColumn("doc_num", F.xxhash64("doc_id")))
    meta = extract_binary_meta(
        df.select(F.col("doc_num").alias("id"), "payload"), "payload", "id")
    joined = (df.select(F.col("doc_num").alias("id"),
                        F.length("payload").alias("want"))
              .join(meta, "id"))
    bad = joined.filter(F.col("want") != F.col("n_bytes")).count()
    assert bad == 0 and joined.count() == df.count()


def test_frame_sample_stub_shapes(spark):
    df = spark.createDataFrame([(1, b"0123456789abcd")], "id bigint, payload binary")
    out = frame_sample_stub(df, "payload", "id", every_n=5).collect()
    assert [(r["frame_idx"], bytes(r["frame"])) for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        (0, b"01234"), (1, b"56789"), (2, b"abcd")]
