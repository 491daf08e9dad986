"""Quantile pushdown: opt-in per-chunk histograms (val_hist) and the
column_quantiles certified-interval merge — approximate-or-absent, and
the interval must ALWAYS contain the true quantile."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.codecs.base import ColumnValues
from wills_columnar_format_spark.engine import (
    _HIST_BUCKETS,
    _value_hist,
    column_quantiles,
    delete_keys,
    encode_table,
)

QS = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]


def _check_contained(spark, df, col, chunk_rows=256, parts=4):
    m = encode_table(df, key_col="id", num_partitions=parts,
                     chunk_rows=chunk_rows,
                     histograms=True).localCheckpoint(eager=True)
    got = {r["q"]: r for r in
           column_quantiles(m.drop("blob"), col, qs=QS).collect()}
    assert set(got) == set(QS)
    n = df.count()
    vals = sorted(r[col] for r in df.select(col).collect())
    for q in QS:
        exact = vals[max(1, math.ceil(q * n)) - 1]
        r = got[q]
        assert r["lo"] <= exact <= r["hi"], (col, q, exact, r)
        assert r["n_rows"] == n


def test_contained_uniform_and_skewed(spark):
    rng = np.random.default_rng(5)
    rows = [(i, int(rng.integers(0, 10_000)),
             float(rng.pareto(1.3) * 100 - 50))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, u long, p double")
    _check_contained(spark, df, "u")
    _check_contained(spark, df, "p")  # heavy tail + negatives


def test_contained_constant_and_tiny(spark):
    df = spark.createDataFrame([(i, 7) for i in range(100)],
                               "id long, c int")
    _check_contained(spark, df, "c", chunk_rows=16, parts=2)


def test_quantiles_absent_rules(spark):
    rows = [(i, i % 50 if i % 4 else None, float("nan") if i == 3 else 1.0 * i)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x int, f double")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=64,
                     allow_nulls=True, histograms=True).localCheckpoint(eager=True)
    # nullable -> absent (zero fillers would poison buckets)
    assert column_quantiles(m, "x").count() == 0
    # a NaN-bearing chunk -> absent for that column
    assert column_quantiles(m, "f").count() == 0
    # histograms not requested -> absent
    m2 = encode_table(df.select("id"), key_col="id",
                      num_partitions=2).localCheckpoint(eager=True)
    assert column_quantiles(m2, "id").count() == 0
    # deletion-masked -> absent
    clean = encode_table(df.select("id"), key_col="id", num_partitions=2,
                         chunk_rows=64, histograms=True).localCheckpoint(eager=True)
    assert column_quantiles(clean, "id").count() == len(QS) or \
        column_quantiles(clean, "id", qs=QS).count() == len(QS)
    deleted = delete_keys(clean, [5], "id")
    assert column_quantiles(deleted, "id").count() == 0


def test_quantiles_validation(spark):
    df = spark.createDataFrame([(1, 2)], "id long, x int")
    m = encode_table(df, key_col="id", num_partitions=1, histograms=True)
    with pytest.raises(ValueError, match="fractions"):
        column_quantiles(m, "x", qs=[0.0])
    with pytest.raises(ValueError, match="fractions"):
        column_quantiles(m, "x", qs=[1.5])


def test_value_hist_unit():
    cv = ColumnValues.from_numpy(np.array([0, 1, 2, 3, 63, 63], np.int64))
    blob = _value_hist(cv, 0.0, 63.0)
    counts = np.frombuffer(blob, np.uint32)
    assert counts.sum() == 6 and counts[0] >= 1 and counts[-1] == 2
    # constant chunk: all mass in bucket 0
    c2 = np.frombuffer(_value_hist(
        ColumnValues.from_numpy(np.full(10, 5, np.int32)), 5.0, 5.0),
        np.uint32)
    assert c2[0] == 10 and c2.sum() == 10
    # NaN / non-numeric / empty -> None
    assert _value_hist(ColumnValues.from_numpy(
        np.array([1.0, float("nan")])), 1.0, 1.0) is None
    assert _value_hist(ColumnValues.from_pylist(["a"]), None, None) is None
    assert _value_hist(ColumnValues.from_numpy(
        np.array([], np.int64)), None, None) is None
    assert len(np.frombuffer(blob, np.uint32)) == _HIST_BUCKETS


def test_histograms_compression_neutral_and_deterministic(spark):
    rows = [(i, (i * 37) % 1000) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v int")
    # hash layout: deterministic chunk boundaries across runs (the
    # range sampler is not), so (chunk_key, column) maps are comparable
    kw = dict(key_col="id", num_partitions=2, chunk_rows=256,
              partitioner="hash")
    m_off = encode_table(df, **kw).localCheckpoint(eager=True)
    m_on = encode_table(df, histograms=True, **kw).localCheckpoint(eager=True)
    sz = lambda m: {(r["chunk_key"], r["column"]): r["bytes_out"]
                    for r in m.select("chunk_key", "column",
                                      "bytes_out").collect()}
    assert sz(m_off) == sz(m_on)
    h = lambda m: {(r["chunk_key"], r["column"]): bytes(r["val_hist"])
                   for r in m.filter(F.col("val_hist").isNotNull())
                   .select("chunk_key", "column", "val_hist").collect()}
    m_on2 = encode_table(df, histograms=True, **kw).localCheckpoint(eager=True)
    assert h(m_on) == h(m_on2) and h(m_on)
