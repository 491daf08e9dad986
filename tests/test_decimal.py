"""DECIMAL columns: exact money types ride the integer codecs as int64
UNSCALED values (precision <= 18), restored bit-exactly on decode — the
same width-coarsening treatment as timestamps/dates/bools
(engine._normalize_temporal). No float detour anywhere: 10^18 > 2^53.

Pins: lossless roundtrip (incl. nullable, list<decimal>, and a decimal
leaf inside a struct), zero-Exchange checkpoint decode with checksum
verification, value_range with Decimal bounds (zone maps on the
unscaled form + exact decimal post-filter), precision-19+ rejection,
and the loud refusals of Decimal key_range/keys= (whose zone maps
store the unscaled form — value_range is the supported spelling).
"""

import decimal

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    decode_table,
    encode_table,
)

D = decimal.Decimal
N = 500


@pytest.fixture(scope="module")
def dec_df(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("amt", T.DecimalType(12, 2), False),
        T.StructField("qty", T.DecimalType(6, 0), False),
    ])
    rows = [
        Row(k=i,
            amt=D(i * 7919 - 1_000_000).scaleb(-2),
            qty=D((i * 31) % 5000))
        for i in range(N)
    ]
    return spark.createDataFrame(rows, schema).repartition(2, "k")


def test_decimal_roundtrip(spark, dec_df):
    m = encode_table(dec_df, key_col="k", num_partitions=2, chunk_rows=128)
    dec = decode_table(m, dec_df.schema)
    assert dec.schema["amt"].dataType == T.DecimalType(12, 2)
    got = {r["k"]: (r["amt"], r["qty"]) for r in dec.collect()}
    want = {r["k"]: (r["amt"], r["qty"]) for r in dec_df.collect()}
    assert got == want


def test_decimal_nullable_roundtrip(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("amt", T.DecimalType(10, 3), True),
    ])
    rows = [Row(k=i, amt=None if i % 4 == 0 else D(i).scaleb(-3))
            for i in range(200)]
    df = spark.createDataFrame(rows, schema)
    m = encode_table(df, key_col="k", num_partitions=1, allow_nulls=True)
    got = {r["k"]: r["amt"] for r in decode_table(m, schema).collect()}
    want = {r["k"]: r["amt"] for r in df.collect()}
    assert got == want


def test_decimal_list_and_struct_roundtrip(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("xs", T.ArrayType(T.DecimalType(9, 2), False), False),
        T.StructField("m", T.StructType([
            T.StructField("price", T.DecimalType(12, 4), False),
        ]), False),
    ])
    rows = [Row(k=i, xs=[D(j).scaleb(-2) for j in range(i % 4)],
                m=Row(price=D(i * 11).scaleb(-4)))
            for i in range(200)]
    df = spark.createDataFrame(rows, schema)
    m = encode_table(df, key_col="k", num_partitions=1, chunk_rows=64)
    got = {r["k"]: (r["xs"], r["m"]["price"])
           for r in decode_table(m, schema).collect()}
    want = {r["k"]: (r["xs"], r["m"]["price"]) for r in df.collect()}
    assert got == want


def test_decimal_checkpoint_no_exchange_verified(spark, dec_df, tmp_path):
    path = str(tmp_path / "m")
    encode_table(dec_df, key_col="k", num_partitions=2,
                 chunk_rows=128).write.parquet(path)
    out = decode_checkpoint(spark, path, dec_df.schema,
                            verify_checksums=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() == N
    assert out.agg(F.sum("amt")).first()[0] == \
        dec_df.agg(F.sum("amt")).first()[0]


def test_decimal_value_range(spark, dec_df):
    m = encode_table(dec_df, key_col="k", num_partitions=2,
                     chunk_rows=64).localCheckpoint(eager=True)
    lo, hi = D("-5000.00"), D("3000.50")
    out = decode_table(m, dec_df.schema, value_range=("amt", lo, hi))
    want = dec_df.filter(F.col("amt").between(lo, hi))
    assert out.count() == want.count() > 0
    got = {r["k"] for r in out.select("k").collect()}
    exp = {r["k"] for r in want.select("k").collect()}
    assert got == exp


def test_decimal_precision_19_rejected(spark):
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("amt", T.DecimalType(19, 2), False),
    ])
    df = spark.createDataFrame([Row(k=1, amt=D("1.00"))], schema)
    m = encode_table(df, key_col="k", num_partitions=1)
    with pytest.raises(Exception) as ei:
        m.collect()
    assert "precision" in str(ei.value)


def test_decimal_key_range_and_keys_refused(spark, dec_df):
    m = encode_table(dec_df, key_col="k", num_partitions=1)
    with pytest.raises(TypeError, match="value_range"):
        decode_table(m, dec_df.schema, key_range=(D("1.0"), D("2.0")))
    with pytest.raises(TypeError, match="value_range"):
        decode_table(m, dec_df.schema, keys=[D("1.0")], key_col="amt")


def test_decimal_key_col_refused(spark, dec_df):
    """Decimals ride the integer codecs as payload, but a decimal
    key_col would key the layout on unscaled int64 — refuse loudly
    rather than build a manifest whose key semantics surprise."""
    from wills_columnar_format_spark.dtypes import UnsupportedDataType

    with pytest.raises(UnsupportedDataType, match="DECIMAL"):
        encode_table(dec_df, key_col="amt", num_partitions=1)
