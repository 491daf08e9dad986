"""Incremental streaming encode: drain-encode-append as files land."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import write_token_table
from wills_columnar_format_spark.engine import decode_table
from wills_columnar_format_spark.streaming import encode_stream, read_manifest


@pytest.fixture()
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return str(root / "in"), str(root / "manifest")


def _land_files(in_dir: str, stage_dir: str, names) -> None:
    os.makedirs(in_dir, exist_ok=True)
    for n in names:
        shutil.copy(os.path.join(stage_dir, n), os.path.join(in_dir, n))


def test_streaming_incremental_encode(spark, dirs, tmp_path_factory):
    in_dir, manifest_dir = dirs
    stage = str(tmp_path_factory.mktemp("stage") / "tok")
    write_token_table(stage, 6_000, rows_per_file=2_000)  # 3 files
    files = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    assert len(files) == 3

    schema = spark.read.parquet(stage).schema

    # wave 1: two files land; drain
    _land_files(in_dir, stage, files[:2])
    q = encode_stream(spark, in_dir, manifest_dir, schema, num_partitions=4, chunk_rows=1024)
    q.awaitTermination(120)
    m1 = read_manifest(spark, manifest_dir)
    n1_chunks = m1.count()
    n1_values = m1.filter(F.col("column") == "doc_id").agg(F.sum("n_values")).collect()[0][0]
    assert n1_values == 4_000

    # wave 2: third file lands; drain again — only NEW data is encoded
    _land_files(in_dir, stage, files[2:])
    q = encode_stream(spark, in_dir, manifest_dir, schema, num_partitions=4, chunk_rows=1024)
    q.awaitTermination(120)
    m2 = read_manifest(spark, manifest_dir)
    assert m2.count() > n1_chunks
    n2_values = m2.filter(F.col("column") == "doc_id").agg(F.sum("n_values")).collect()[0][0]
    assert n2_values == 6_000

    # decoded union equals the full input table per row
    orig = spark.read.parquet(stage)
    dec = decode_table(m2, orig.schema)
    assert dec.count() == 6_000
    bad = (
        dec.alias("d").join(orig.alias("o"), "doc_id")
        .filter(
            ~(
                (F.col("d.tokens") == F.col("o.tokens"))
                & (F.col("d.n_tok") == F.col("o.n_tok"))
                & (F.col("d.source") == F.col("o.source"))
            )
        )
        .count()
    )
    assert bad == 0


def test_windowed_event_counts_equals_batch(spark, tmp_path_factory):
    """The streaming tumbling-window aggregation (watermark + window +
    stateful count, drained with availableNow) must equal the batch
    GROUP BY hour over the same static input."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.streaming import windowed_event_counts

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("win_in") / "events")
    df.repartition(3).write.parquet(in_dir)
    got = {
        (r.window_start, r.n)
        for r in windowed_event_counts(
            spark, in_dir, df.schema, ts_col="ts",
            query_name="wcfs_win_test",
        ).collect()
    }
    exp = {
        (r.h, r.n)
        for r in df.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n")).collect()
    }
    assert got == exp and len(got) > 0
