"""Struct columns: columnar shredding to ``name#f:<field>`` sub-column
trees (Dremel-style, minus repetition levels — structs may nest structs
and lists but not ride inside lists), regrouped losslessly on decode.

The reference format is flat scalars only (src/lib.rs:59-66); structs
are an engine EXTENSION in the same spirit as lists (#lengths/#values)
and nullables (#valid): every leaf is an ordinary flat sub-column with
its own codec choice, checksum, and value zone map, so checkpoint
decode, checksum verification, and value_range pruning compose with
struct columns for free. These tests pin:

* lossless roundtrip of flat, nullable (parent AND child), nested, and
  temporal-leaf structs through encode_table -> decode_table;
* projection decode of a struct column only reads its leaf blobs;
* zero-Exchange decode_checkpoint of a struct table, with checksum
  verification on;
* value_range addressed at a struct LEAF (``name#f:child``) — chunk
  pruning via the leaf's zone maps plus the exact getField post-filter;
* null rejection without allow_nulls; list-of-struct rejection.
"""

import datetime

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from wills_columnar_format_spark import dtypes
from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    decode_table,
    encode_table,
)

N = 600


@pytest.fixture(scope="module")
def struct_df(spark):
    rows = [
        Row(
            doc_id=i,
            meta=Row(
                source=f"src{i % 7}",
                score=float(i % 50) / 10.0,
                ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
                inner=Row(flag=bool(i % 3 == 0), rank=i % 11),
            ),
        )
        for i in range(N)
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("source", T.StringType(), False),
            T.StructField("score", T.DoubleType(), False),
            T.StructField("ts", T.TimestampNTZType(), False),
            T.StructField("inner", T.StructType([
                T.StructField("flag", T.BooleanType(), False),
                T.StructField("rank", T.LongType(), False),
            ]), False),
        ]), False),
    ])
    return spark.createDataFrame(rows, schema).repartition(4, "doc_id")


def _flat(df):
    return df.select(
        "doc_id",
        F.col("meta.source").alias("source"),
        F.col("meta.score").alias("score"),
        F.col("meta.ts").alias("ts"),
        F.col("meta.inner.flag").alias("flag"),
        F.col("meta.inner.rank").alias("rank"),
    )


def test_struct_roundtrip(spark, struct_df):
    man = encode_table(struct_df, key_col="doc_id", num_partitions=4,
                       chunk_rows=128)
    # every leaf became its own manifest sub-column
    cols = {r["column"] for r in man.select("column").distinct().collect()}
    assert {"doc_id", "meta#f:source", "meta#f:score", "meta#f:ts",
            "meta#f:inner#f:flag", "meta#f:inner#f:rank"} <= cols
    dec = decode_table(man, struct_df.schema)
    assert _flat(dec).exceptAll(_flat(struct_df)).count() == 0
    assert _flat(struct_df).exceptAll(_flat(dec)).count() == 0


def test_struct_nullable_roundtrip(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("m", T.StructType([
            T.StructField("a", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]), True),
    ])
    rows = [
        Row(k=i,
            m=None if i % 5 == 0 else Row(
                a=None if i % 3 == 0 else i * 10,
                b=None if i % 4 == 0 else f"v{i}"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, schema).repartition(2, "k")
    man = encode_table(df, key_col="k", num_partitions=2, chunk_rows=64,
                       allow_nulls=True)
    dec = decode_table(man, schema)
    got = {r["k"]: r["m"] for r in dec.collect()}
    want = {r["k"]: r["m"] for r in df.collect()}
    assert got == want


def test_struct_null_rejected_by_default(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("m", T.StructType([
            T.StructField("a", T.LongType(), True),
        ]), True),
    ])
    df = spark.createDataFrame([Row(k=1, m=None), Row(k=2, m=Row(a=3))],
                               schema)
    man = encode_table(df, key_col="k", num_partitions=1)
    with pytest.raises(Exception) as ei:
        man.collect()
    assert "allow_nulls" in str(ei.value)


def test_list_of_struct_roundtrips(spark):
    # was a loud-refusal pin through round 4; round 5 shreds nested
    # lists recursively under name#values (tests/test_list_struct.py
    # has the full coverage — this pins the former refusal site)
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("xs", T.ArrayType(T.StructType([
            T.StructField("a", T.LongType(), False),
        ])), False),
    ])
    df = spark.createDataFrame(
        [Row(k=1, xs=[Row(a=2), Row(a=3)]), Row(k=2, xs=[])], schema)
    man = encode_table(df, key_col="k", num_partitions=1)
    dec = decode_table(man, df.schema)
    got = {r.k: [x.a for x in r.xs] for r in dec.collect()}
    assert got == {1: [2, 3], 2: []}


def test_struct_projection_decodes_only_its_leaves(spark, struct_df):
    man = encode_table(struct_df, key_col="doc_id", num_partitions=2,
                       chunk_rows=128)
    dec = decode_table(man, struct_df.schema, columns=["meta"])
    assert dec.columns == ["meta"]
    assert dec.count() == N
    assert dec.select(F.sum("meta.inner.rank")).first()[0] == \
        sum(i % 11 for i in range(N))


def test_struct_checkpoint_no_exchange_verified(spark, struct_df, tmp_path):
    path = str(tmp_path / "m")
    encode_table(struct_df, key_col="doc_id", num_partitions=2,
                 chunk_rows=128).write.parquet(path)
    dec = decode_checkpoint(spark, path, struct_df.schema,
                            verify_checksums=True)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert _flat(dec).exceptAll(_flat(struct_df)).count() == 0
    assert dec.count() == N


def test_struct_leaf_value_range(spark, struct_df):
    man = encode_table(struct_df, key_col="doc_id", num_partitions=2,
                       chunk_rows=128).localCheckpoint(eager=True)
    dec = decode_table(man, struct_df.schema,
                       value_range=("meta#f:inner#f:rank", 2, 4))
    want = struct_df.filter(F.col("meta.inner.rank").between(2, 4))
    assert _flat(dec).exceptAll(_flat(want)).count() == 0
    assert dec.count() == want.count()


def test_struct_leaf_value_range_temporal_prunes(spark, struct_df):
    """Leaf zone maps actually prune: a narrow ts band on the (key-
    sorted, hence ts-correlated) struct leaf decodes fewer chunks than
    the table holds."""
    man = encode_table(struct_df, key_col="doc_id", num_partitions=2,
                       chunk_rows=64).localCheckpoint(eager=True)
    lo = datetime.datetime(2024, 1, 1, 1, 0)
    hi = datetime.datetime(2024, 1, 1, 2, 0)
    dec = decode_table(man, struct_df.schema,
                       value_range=("meta#f:ts", lo, hi))
    want = struct_df.filter(F.col("meta.ts").between(lo, hi))
    assert dec.count() == want.count() == 61
    assert _flat(dec).exceptAll(_flat(want)).count() == 0


def test_struct_leaf_value_range_bad_field(spark, struct_df):
    man = encode_table(struct_df, key_col="doc_id", num_partitions=1)
    with pytest.raises(KeyError):
        decode_table(man, struct_df.schema,
                     value_range=("meta#f:nope", 0, 1))
