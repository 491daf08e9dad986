"""SUM/AVG pushdown under a range predicate (``sum_where``): hybrid
metadata/decode like ``count_where``, plus per-chunk exact integer sums
(``val_sum``) and ``#valid`` non-null counts on the metadata side.
Pins: exact equality with a plain filtered aggregate everywhere; SQL
NULL semantics (SUM ignores NULLs, NULL on empty/all-null); the
metadata side genuinely answers without blob bytes; every refusal
(float sum column, absent val_sum, deletion masks) stays exact."""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    delete_keys,
    encode_table,
    sum_where,
)


def _got(m, schema, sum_col, where):
    r = sum_where(m, schema, sum_col, where).collect()[0]
    return (r["n_rows"], r["n_nonnull"],
            None if r["sum_val"] is None else int(r["sum_val"]),
            r["avg_val"])


def _exp(df, cond, sum_col):
    r = (df.filter(cond)
         .agg(F.count(F.lit(1)), F.count(sum_col), F.sum(sum_col),
              F.avg(sum_col)).collect()[0])
    return (r[0], r[1], None if r[2] is None else int(r[2]), r[3])


def _close(g, e):
    if g[:3] != e[:3]:
        return False
    if (g[3] is None) != (e[3] is None):
        return False
    return g[3] is None or abs(g[3] - e[3]) < 1e-9


@pytest.fixture(scope="module")
def clustered(spark):
    df = spark.createDataFrame(
        [(i, i * 3 + (i % 7), float((i * 13) % 2000) / 4.0)
         for i in range(2000)],
        "id long, v long, f double")
    m = encode_table(df, key_col="id", num_partitions=4, chunk_rows=128,
                     histograms=True).localCheckpoint(eager=True)
    return df, m


def test_exact_vs_plain_aggregate(spark, clustered):
    df, m = clustered
    cases = [("v", ("v", 1000, 4000)),
             ("v", ("f", 50.0, 400.0)),
             ("id", [("v", 500, 5000), ("f", 10.0, 450.0)]),
             ("v", ("v", 10**7, 10**8))]
    for sum_col, where in cases:
        specs = where if isinstance(where, list) else [where]
        cond = None
        for c, lo, hi in specs:
            e = F.col(c).between(lo, hi)
            cond = e if cond is None else cond & e
        assert _close(_got(m, df.schema, sum_col, where),
                      _exp(df, cond, sum_col))


def test_metadata_answers_without_blobs(spark, clustered):
    df, m = clustered
    # interior 'in' chunks must answer with blobs NULLED: a predicate
    # aligned to chunk boundaries leaves no 'dec' chunk on v
    blobless = m.withColumn(
        "blob", F.lit(None).cast("binary")).localCheckpoint(eager=True)
    got = _got(blobless, df.schema, "v", ("v", -10**6, 10**7))
    exp = _exp(df, F.col("v").between(-10**6, 10**7), "v")
    assert _close(got, exp)


def test_nullable_sum_col_and_all_null(spark):
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else i * 2) for i in range(1000)],
        "id long, v long")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128,
                     allow_nulls=True).localCheckpoint(eager=True)
    got = _got(m, df.schema, "v", ("id", 100, 900))
    assert _close(got, _exp(df, F.col("id").between(100, 900), "v"))
    # nullable sum col still answers from metadata (#valid sums):
    # the id predicate is chunk-aligned in [0, 1000) so no decode
    blobless = m.withColumn(
        "blob", F.lit(None).cast("binary")).localCheckpoint(eager=True)
    got2 = _got(blobless, df.schema, "v", ("id", -1, 2000))
    assert _close(got2, _exp(df, F.col("id").between(-1, 2000), "v"))

    allnull = spark.createDataFrame([(i, None) for i in range(500)],
                                    "id long, v long")
    m2 = encode_table(allnull, key_col="id", num_partitions=2,
                      chunk_rows=128, allow_nulls=True
                      ).localCheckpoint(eager=True)
    n_rows, n_nonnull, s, a = _got(m2, allnull.schema, "v",
                                   ("id", 0, 1000))
    assert (n_rows, n_nonnull, s, a) == (500, 0, None, None)


def test_deletion_mask_stays_exact(spark, clustered):
    df, m = clustered
    m2 = delete_keys(m, list(range(500, 520)),
                     key_col="id").localCheckpoint(eager=True)
    live = df.filter(~F.col("id").between(500, 519))
    got = _got(m2, df.schema, "v", ("v", 0, 10**9))
    assert _close(got, _exp(live, F.col("v").between(0, 10**9), "v"))


def test_legacy_manifest_without_val_sum(spark, clustered):
    df, m = clustered
    legacy = m.drop("val_sum").localCheckpoint(eager=True)
    got = _got(legacy, df.schema, "v", ("v", 1000, 4000))
    assert _close(got, _exp(df, F.col("v").between(1000, 4000), "v"))


def test_float_sum_col_refused(spark, clustered):
    df, m = clustered
    with pytest.raises(TypeError):
        sum_where(m, df.schema, "f", ("v", 0, 100))


def test_struct_leaf_sum(spark):
    df = spark.createDataFrame(
        [(i, {"a": i * 2, "b": float(i)}) for i in range(600)],
        "id long, s struct<a:long, b:double>")
    m = encode_table(df, key_col="id", num_partitions=2, chunk_rows=128
                     ).localCheckpoint(eager=True)
    got = _got(m, df.schema, "s#f:a", ("s#f:b", 100.0, 400.0))
    assert _close(got, _exp(df, F.col("s.b").between(100.0, 400.0), "s.a"))


def test_unsatisfiable_returns_empty_shape(spark, clustered):
    df, m = clustered
    n_rows, n_nonnull, s, a = _got(m, df.schema, "v", ("v", 10, 5))
    assert (n_rows, n_nonnull, s, a) == (0, 0, None, None)
