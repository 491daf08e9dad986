"""Variance/stddev pushdown: per-chunk exact second moments (val_sum2)
and the column_moments metadata aggregate — zero blob bytes read,
exact-or-absent like column_sums."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import data
from wills_columnar_format_spark.codecs.base import ColumnValues
from wills_columnar_format_spark.engine import (
    _value_sum2,
    column_moments,
    delete_keys,
    encode_table,
)


def test_value_sum2_unit():
    v = np.array([3, -4, 5, 0], np.int64)
    assert _value_sum2(ColumnValues.from_numpy(v)) == 9 + 16 + 25
    assert _value_sum2(ColumnValues.from_numpy(
        np.zeros(100, np.int32))) == 0
    # object (overflow-safe) path agrees with exact Python
    big = np.array([2 ** 40, -(2 ** 40), 7], np.int64)
    assert _value_sum2(ColumnValues.from_numpy(big)) == \
        sum(int(x) ** 2 for x in big.tolist())
    # past decimal(38,0): absent, never wrong
    huge = np.array([2 ** 62] * 8, np.int64)
    assert _value_sum2(ColumnValues.from_numpy(huge)) is None
    # floats / strings / empty: absent by design
    assert _value_sum2(ColumnValues.from_numpy(
        np.array([1.5], np.float64))) is None
    assert _value_sum2(ColumnValues.from_pylist(["a"])) is None
    assert _value_sum2(ColumnValues.from_numpy(
        np.array([], np.int64))) is None


@pytest.fixture(scope="module")
def token_df(spark):
    t = data.token_table_arrow(3000, seed=11)
    return spark.createDataFrame(t.to_pandas()).localCheckpoint(eager=True)


def test_column_moments_exact(spark, token_df):
    df = token_df.select("doc_id", "n_tok")
    m = encode_table(df, key_col="doc_id", num_partitions=4, chunk_rows=256)
    got = {r["column_name"]: r for r in
           column_moments(m.localCheckpoint(eager=True).drop("blob")).collect()}
    assert set(got) == {"n_tok"}
    exp = df.agg(
        F.count("n_tok"), F.sum("n_tok"),
        F.var_pop("n_tok"), F.stddev_pop("n_tok")).collect()[0]
    r = got["n_tok"]
    assert r["n_nonnull"] == exp[0]
    assert int(r["v_sum"]) == exp[1]
    # ours is the exact-ratio correctly-rounded value; Spark's is a
    # streaming aggregate — agree to float precision
    assert r["var_pop"] == pytest.approx(exp[2], rel=1e-9)
    assert r["stddev_pop"] == pytest.approx(exp[3], rel=1e-9)
    # exact second moment vs a direct computation
    s2 = df.select(
        F.sum(F.col("n_tok").cast("long") * F.col("n_tok"))).collect()[0][0]
    assert int(r["v_sum2"]) == s2


def test_column_moments_nullable_ignores_nulls(spark):
    rows = [(i, i % 7 if i % 5 else None) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x int")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=64,
                     allow_nulls=True).localCheckpoint(eager=True)
    got = {r["column_name"]: r for r in column_moments(m).collect()}
    exp = df.agg(F.count("x"), F.var_pop("x")).collect()[0]
    assert got["x"]["n_nonnull"] == exp[0]
    assert got["x"]["var_pop"] == pytest.approx(exp[1], rel=1e-9)


def test_column_moments_exact_or_absent(spark, token_df):
    df = token_df.select("doc_id", "n_tok")
    m = encode_table(df, key_col="doc_id", num_partitions=2,
                     chunk_rows=512).localCheckpoint(eager=True)
    # legacy manifest (no val_sum2 column at all): empty, never guessed
    assert column_moments(m.drop("val_sum2")).count() == 0
    # a single chunk missing its sum2 (overflow / legacy mix): absent
    m_hole = m.withColumn(
        "val_sum2",
        F.when(F.col("chunk_id") == 0, F.lit(None)).otherwise(
            F.col("val_sum2")))
    assert "n_tok" not in {
        r["column_name"] for r in column_moments(m_hole).collect()}
    # deletion-masked columns drop (stale superset sums)
    victim = df.first()["doc_id"]
    m_del = delete_keys(m, [victim], "doc_id")
    assert column_moments(m_del).count() == 0
