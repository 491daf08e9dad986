"""Grouped aggregate pushdown (engine.group_sums).

Hybrid metadata/decode GROUP BY: chunks whose group column is constant
(zone map min == max) answer from manifest metadata with zero blob
bytes; mixed chunks decode; the union is exact. The zero-blob claim is
tested the hard way — blobs of pure chunks are NULLED and the
aggregate must still succeed.
"""

import pyspark.sql.functions as F
import pytest

from wills_columnar_format_spark.engine import (
    delete_keys,
    encode_table,
    group_sums,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _expect(df, g, v):
    return {
        tuple(r)
        for r in df.groupBy(g)
        .agg(F.sum(v).cast("decimal(38,0)").alias("v_sum"),
             F.count(F.lit(1)).alias("n_rows"),
             F.count(v).alias("n_nonnull"))
        .collect()
    }


def _got(m, schema, g, v):
    return {tuple(r) for r in group_sums(m, schema, g, v).collect()}


def test_group_sums_clustered_string_group(spark, sf_dir):
    """Range layout on the group column: boundary chunks mixed, the
    rest pure — both paths contribute and the union is exact."""
    df = _docs(spark, sf_dir)
    m = encode_table(df, key_col="lang", num_partitions=4, chunk_rows=32)
    assert _got(m, df.schema, "lang", "n_chars") == _expect(df, "lang", "n_chars")


def test_group_sums_unclustered_group(spark, sf_dir):
    """Hash layout on doc_id: no chunk is lang-pure — everything routes
    to the decode side, still exact."""
    df = _docs(spark, sf_dir)
    m = encode_table(df, key_col="doc_id", partitioner="hash",
                     num_partitions=4, chunk_rows=64)
    assert _got(m, df.schema, "lang", "n_chars") == _expect(df, "lang", "n_chars")


def test_group_sums_integer_group_bool_value(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 3 == 0).alias("flag"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="g", num_partitions=2, chunk_rows=64)
    assert _got(m, df.schema, "g", "flag") == _expect(
        df.withColumn("flag", F.col("flag").cast("long")), "g", "flag")


def test_group_sums_zero_blob_for_pure_chunks(spark, sf_dir):
    """Proof the pure path never touches bytes: encode a fully
    lang-clustered single-language slice, null EVERY blob — metadata
    alone must answer."""
    df = _docs(spark, sf_dir).filter(F.col("lang") == "en")
    m = encode_table(df, key_col="lang", num_partitions=1, chunk_rows=32)
    blobless = m.withColumn("blob", F.lit(None).cast("binary"))
    assert _got(blobless, df.schema, "lang", "n_chars") == _expect(
        df, "lang", "n_chars")


def test_group_sums_nullable_value(spark):
    df = spark.range(500).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.when(F.col("id") % 4 != 0, F.col("id")).alias("v"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="g", num_partitions=2, chunk_rows=32,
                     allow_nulls=True)
    assert _got(m, df.schema, "g", "v") == _expect(df, "g", "v")


def test_group_sums_nullable_group_routes_to_decode(spark):
    """NULL group values can't come from zone maps: chunks holding a
    null group decode, and the NULL group row matches SQL semantics."""
    df = spark.range(300).select(
        F.when(F.col("id") % 10 != 0,
               (F.col("id") % 3).cast("string")).alias("g"),
        F.col("id").alias("v"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="doc_id", num_partitions=2, chunk_rows=64,
                     allow_nulls=True)
    assert _got(m, df.schema, "g", "v") == _expect(df, "g", "v")


def test_group_sums_after_delete(spark, sf_dir):
    """Deletion-masked chunks are a stale superset in metadata: they
    must route to decode (masks applied) — totals reflect the delete."""
    df = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    m = encode_table(df, key_col="lang", num_partitions=2, chunk_rows=32)
    victims = [r.doc_id for r in df.limit(25).collect()]
    m2 = delete_keys(m, victims, "doc_id")
    survivors = df.filter(~F.col("doc_id").isin(victims))
    assert _got(m2, df.schema, "lang", "n_chars") == _expect(
        survivors, "lang", "n_chars")


def test_group_sums_float_group_still_exact(spark):
    """Float group types have no exact metadata reconstruction (NaN
    holes in zone maps): everything decodes, result still exact."""
    df = spark.range(200).select(
        (F.col("id") % 4).cast("double").alias("g"),
        F.col("id").alias("v"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="doc_id", num_partitions=2, chunk_rows=32)
    assert _got(m, df.schema, "g", "v") == _expect(df, "g", "v")


def test_group_sums_float_value_raises(spark, sf_dir):
    df = _docs(spark, sf_dir).withColumn("fv", F.col("n_chars") * 0.5)
    m = encode_table(df, key_col="lang", num_partitions=2)
    with pytest.raises(TypeError, match="integer/boolean"):
        group_sums(m, df.schema, "lang", "fv")


def test_group_sums_long_string_group_not_trusted(spark):
    """Group strings at/over the zone-map truncation limit could be
    truncated prefixes: those chunks must decode, not mislabel."""
    long_g = "x" * 300
    df = spark.range(100).select(
        F.lit(long_g).alias("g"), F.col("id").alias("v"),
        F.col("id").alias("doc_id"))
    m = encode_table(df, key_col="doc_id", num_partitions=1, chunk_rows=32)
    got = _got(m, df.schema, "g", "v")
    assert got == _expect(df, "g", "v")
    assert next(iter(got))[0] == long_g


# ---------------------------------------------------------------------------
# group_stats (per-group MIN/MAX/COUNT)
# ---------------------------------------------------------------------------

from wills_columnar_format_spark.engine import group_stats  # noqa: E402


def _expect_stats(df, g, v, numeric=True):
    vv = F.col(v).cast("double") if numeric else F.col(v)
    return {
        tuple(r)
        for r in df.groupBy(g)
        .agg(F.min(vv).alias("v_min"), F.max(vv).alias("v_max"),
             F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }


def test_group_stats_clustered(spark, sf_dir):
    df = _docs(spark, sf_dir)
    m = encode_table(df, key_col="lang", num_partitions=4, chunk_rows=32)
    got = {tuple(r) for r in group_stats(m, df.schema, "lang", "n_chars").collect()}
    assert got == _expect_stats(df, "lang", "n_chars")


def test_group_stats_zero_blob_for_pure_chunks(spark, sf_dir):
    df = _docs(spark, sf_dir).filter(F.col("lang") == "en")
    m = encode_table(df, key_col="lang", num_partitions=1, chunk_rows=32)
    blobless = m.withColumn("blob", F.lit(None).cast("binary"))
    got = {tuple(r) for r in
           group_stats(blobless, df.schema, "lang", "n_chars").collect()}
    assert got == _expect_stats(df, "lang", "n_chars")


def test_group_stats_string_value(spark, sf_dir):
    df = _docs(spark, sf_dir)
    m = encode_table(df, key_col="lang", num_partitions=2, chunk_rows=32)
    got = {tuple(r) for r in group_stats(m, df.schema, "lang", "source").collect()}
    assert got == _expect_stats(df, "lang", "source", numeric=False)


def test_group_stats_float_value_with_nans(spark):
    df = spark.range(400).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 7 == 0, float("nan"))
        .otherwise(F.col("id").cast("double")).alias("v"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="g", num_partitions=2, chunk_rows=32)
    got = {tuple(r) for r in group_stats(m, df.schema, "g", "v").collect()}
    want = {
        tuple(r)
        for r in df.groupBy("g")
        .agg(F.min(F.when(~F.isnan("v"), F.col("v"))).alias("v_min"),
             F.max(F.when(~F.isnan("v"), F.col("v"))).alias("v_max"),
             F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want


def test_group_stats_nullable_value_routes_to_decode(spark):
    df = spark.range(300).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.when(F.col("id") % 5 != 0, F.col("id")).alias("v"),
        F.col("id").alias("doc_id"),
    )
    m = encode_table(df, key_col="g", num_partitions=2, chunk_rows=32,
                     allow_nulls=True)
    got = {tuple(r) for r in group_stats(m, df.schema, "g", "v").collect()}
    assert got == _expect_stats(df, "g", "v")


def test_group_stats_decimal_value_raises(spark, sf_dir):
    df = _docs(spark, sf_dir).withColumn(
        "d", F.col("n_chars").cast("decimal(10,2)"))
    m = encode_table(df, key_col="lang", num_partitions=2)
    with pytest.raises(TypeError, match="numeric/boolean/string"):
        group_stats(m, df.schema, "lang", "d")
