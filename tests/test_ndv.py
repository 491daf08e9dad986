"""Approximate COUNT DISTINCT pushdown (HyperLogLog ``val_ndv``
sketches + ``column_ndv``).

Opt-in at encode (``ndv_sketches=True``): each eligible sub-column
chunk records a 1024-register HLL (p=10, ~3.25% standard error);
``column_ndv`` merges registers by elementwise max — the merged
estimate is exactly the sketch of the union, zero blob bytes read.
Trust rules mirror column_stats: integer/string top-level scalars
only, every chunk sketched, nullable and deletion-masked columns drop
out, floats never appear. Pins: estimate accuracy on high- and
low-cardinality columns (ints and strings, multi-chunk merges),
determinism (pure function of values — resume contract), default-off,
legacy absence, exclusion rules.
"""

import pytest
from pyspark.sql import Row, functions as F

from wills_columnar_format_spark.engine import (
    _ndv_estimate,
    _ndv_sketch,
    column_ndv,
    delete_keys,
    encode_table,
)
from wills_columnar_format_spark.codecs.base import ColumnValues

import numpy as np

N = 20_000


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        Row(
            k=i,
            uid=i * 7919 % 1_000_003,        # ~N distinct
            lang=f"lang{i % 7}",              # 7 distinct
            score=float(i) / 3.0,             # float: excluded
            maybe=None if i % 5 == 0 else i % 100,
        )
        for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "k long, uid long, lang string, score double, maybe long"
    ).repartition(4, "k")


@pytest.fixture(scope="module")
def manifest(table):
    return encode_table(table, key_col="k", num_partitions=4,
                        chunk_rows=1024, allow_nulls=True,
                        ndv_sketches=True).localCheckpoint(eager=True)


def test_estimates_within_tolerance(spark, table, manifest):
    got = {r["column_name"]: r for r in column_ndv(manifest).collect()}
    assert "score" not in got          # float: absent by design
    assert "maybe" not in got          # nullable: absent by design
    assert got["k"]["n_rows"] == N
    exact_k = N
    exact_uid = table.select("uid").distinct().count()
    assert abs(got["k"]["ndv_estimate"] / exact_k - 1) < 0.05
    assert abs(got["uid"]["ndv_estimate"] / exact_uid - 1) < 0.05
    # low cardinality hits the linear-counting range: near-exact
    assert abs(got["lang"]["ndv_estimate"] - 7) < 0.5


def test_sketch_deterministic_and_mergeable():
    v = np.arange(5000, dtype=np.int64) % 1300
    cv = ColumnValues.from_numpy(v)
    s1 = _ndv_sketch(cv)
    s2 = _ndv_sketch(ColumnValues.from_numpy(v.copy()))
    assert s1 == s2  # pure function of values (resume contract)
    a = _ndv_sketch(ColumnValues.from_numpy(
        np.arange(0, 3000, dtype=np.int64)))
    b = _ndv_sketch(ColumnValues.from_numpy(
        np.arange(2000, 5000, dtype=np.int64)))
    merged = np.maximum(np.frombuffer(a, np.uint8),
                        np.frombuffer(b, np.uint8))
    assert abs(_ndv_estimate(merged) / 5000 - 1) < 0.07


def test_default_off_and_legacy_absent(spark, table):
    plain = encode_table(table.select("k", "lang"), key_col="k",
                         num_partitions=2, chunk_rows=4096)
    assert column_ndv(plain).count() == 0  # no sketches recorded
    assert column_ndv(plain.drop("val_ndv")).count() == 0  # legacy


def test_deletion_masked_columns_drop_out(spark, manifest):
    masked = delete_keys(manifest, [1, 2], key_col="k")
    got = {r["column_name"] for r in column_ndv(masked).collect()}
    assert "k" not in got
