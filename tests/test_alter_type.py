"""ALTER COLUMN TYPE (``alter_column_type_checkpoint``) — Delta-style
metadata-only type WIDENING, plus the engine-side decode type guard
(``_cast_checked``) that makes it free.

The widen rewrites only the ``_table_schema`` sidecar: integer codecs
decode class-wide and every chunk casts to the REQUESTED schema type
under an exact value-preservation check, so pre-widen (narrow) and
post-widen (wide) chunks decode side by side. The same check is what
turns a silently-wrapping narrow decode into a loud refusal.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wills_columnar_format_spark.dtypes import UnsupportedDataType
from wills_columnar_format_spark.engine import (
    add_column_checkpoint,
    alter_column_type_checkpoint,
    compact_checkpoint,
    decode_checkpoint,
    decode_table,
    delete_where_checkpoint,
    encode_table,
    read_checkpoint_schema,
    rename_column_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, [i, i + 1, 70_000 + i], f"src{i % 5}", (i % 97) * 10)
         for i in range(400)],
        "doc_id long, tokens array<int>, source string, n_chars int",
    )


@pytest.fixture()
def ckpt(spark, docs, tmp_path):
    path = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64),
        path, schema=docs.schema)
    return path


def test_widen_scalar_and_mixed_chunks(spark, docs, ckpt):
    seq = alter_column_type_checkpoint(ckpt, "n_chars", "long")
    assert seq == 1
    side = read_checkpoint_schema(ckpt)
    assert str(side.field("n_chars").type) == "int64"
    out = decode_checkpoint(spark, ckpt)
    assert dict(out.dtypes)["n_chars"] == "bigint"
    assert out.select(F.sum("n_chars")).first()[0] == \
        sum((i % 97) * 10 for i in range(400))

    # append a batch carrying values only the WIDE type can hold
    extra = spark.createDataFrame(
        [(1000 + i, [1, 2], "fresh", 2**40 + i) for i in range(10)],
        "doc_id long, tokens array<int>, source string, n_chars long",
    )
    write_checkpoint(
        encode_table(extra, key_col="doc_id", num_partitions=2),
        ckpt, mode="append")
    mixed = decode_checkpoint(spark, ckpt)
    assert mixed.count() == 410
    assert mixed.filter(F.col("n_chars") >= 2**40).count() == 10
    # value-range pruning through the widened column stays exact
    vr = decode_checkpoint(spark, ckpt,
                           value_range=("n_chars", 2**40, 2**41))
    assert vr.count() == 10


def test_widen_list_element(spark, docs, ckpt):
    alter_column_type_checkpoint(ckpt, "tokens", "array<bigint>")
    out = decode_checkpoint(spark, ckpt)
    assert dict(out.dtypes)["tokens"] == "array<bigint>"
    got = {r.doc_id: r.tokens for r in out.collect()}
    assert got[7] == [7, 8, 70_007]


def test_refusals(spark, docs, ckpt):
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_column_type_checkpoint(ckpt, "n_chars", "short")  # narrow
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_column_type_checkpoint(ckpt, "n_chars", "double")  # class
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_column_type_checkpoint(ckpt, "source", "binary")
    with pytest.raises(ValueError, match="already has type"):
        alter_column_type_checkpoint(ckpt, "n_chars", "int")
    with pytest.raises(ValueError, match="not in the table"):
        alter_column_type_checkpoint(ckpt, "nope", "long")


def test_decimal_precision_widen(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None) for i in range(50)],
        "doc_id long, amount decimal(10,2)",
    ).withColumn(
        "amount", (F.col("doc_id") * 100 + 0.25).cast("decimal(10,2)"))
    path = str(tmp_path / "dec")
    write_checkpoint(
        encode_table(df, key_col="doc_id", num_partitions=2),
        path, schema=df.schema)
    alter_column_type_checkpoint(path, "amount", "decimal(20,2)")
    out = decode_checkpoint(spark, path)
    assert dict(out.dtypes)["amount"] == "decimal(20,2)"
    assert out.select(F.sum("amount")).first()[0] == \
        df.select(F.sum("amount")).first()[0]
    with pytest.raises(ValueError, match="not a value-preserving"):
        alter_column_type_checkpoint(path, "amount", "decimal(20,4)")


def test_widen_then_mutate_and_compact(spark, docs, ckpt, tmp_path):
    alter_column_type_checkpoint(ckpt, "n_chars", "long")
    delete_where_checkpoint(spark, ckpt, ("n_chars", 100, 200))
    kept = decode_checkpoint(spark, ckpt)
    expect = [i for i in range(400) if not 100 <= (i % 97) * 10 <= 200]
    assert sorted(r.doc_id for r in kept.collect()) == expect
    # re-encoding compaction materializes at the WIDE type
    dst = str(tmp_path / "c")
    compact_checkpoint(spark, ckpt, dst, key_col="doc_id",
                       rechunk_rows=4096)
    out = decode_checkpoint(spark, dst)
    assert dict(out.dtypes)["n_chars"] == "bigint"
    assert sorted(r.doc_id for r in out.collect()) == expect


def test_widen_preserves_rename_and_default_markers(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "n_chars", "length")
    add_column_checkpoint(ckpt, "score", "int", default=7)
    alter_column_type_checkpoint(ckpt, "length", "long")
    alter_column_type_checkpoint(ckpt, "score", "long")
    out = decode_checkpoint(spark, ckpt)
    assert dict(out.dtypes)["length"] == "bigint"
    assert dict(out.dtypes)["score"] == "bigint"
    # rename mapping still resolves (decode by logical name above) and
    # the re-typed default still fills pre-add chunks
    assert out.filter(F.col("score") != 7).count() == 0
    assert out.select(F.sum("length")).first()[0] == \
        sum((i % 97) * 10 for i in range(400))


def test_narrow_decode_guard(spark, docs):
    # the guard behind the widen: decoding into a schema too narrow for
    # the stored VALUES refuses instead of wrapping
    m = encode_table(docs, key_col="doc_id", num_partitions=2)
    m = m.localCheckpoint(eager=True)
    bad = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.ByteType()),
    ])
    with pytest.raises(Exception, match="int8|UnsupportedDataType"):
        decode_table(m, bad).collect()
    # ... but a narrow type every value FITS decodes fine (the normal
    # width-coarsened roundtrip: codecs decode class-wide)
    ok = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.ShortType()),
    ])
    rows = decode_table(m, ok).select(F.sum("n_chars")).first()[0]
    assert rows == sum((i % 97) * 10 for i in range(400))


def test_cast_checked_unit():
    import numpy as np

    from wills_columnar_format_spark import dtypes as dt
    from wills_columnar_format_spark.engine import _cast_checked

    v = np.array([1, 300, -5], dtype=np.int64)
    assert _cast_checked(v, dt.SIGNED_INTEGER, np.int16, "c").dtype == np.int16
    with pytest.raises(UnsupportedDataType):
        _cast_checked(v, dt.SIGNED_INTEGER, np.int8, "c")  # 300 wraps
    with pytest.raises(UnsupportedDataType):
        _cast_checked(v, dt.SIGNED_INTEGER, np.uint32, "c")  # negative
    u = np.array([2**63 + 5], dtype=np.uint64)
    with pytest.raises(UnsupportedDataType):
        _cast_checked(u, dt.UNSIGNED_INTEGER, np.int64, "c")  # sign flip
    assert _cast_checked(
        np.array([7], dtype=np.uint64), dt.UNSIGNED_INTEGER,
        np.int64, "c")[0] == 7
    f = np.array([1.5], dtype=np.float64)
    with pytest.raises(UnsupportedDataType):
        _cast_checked(f, dt.FLOAT64, np.float32, "c")  # precision class
    with pytest.raises(UnsupportedDataType):
        _cast_checked(v, dt.SIGNED_INTEGER, np.float64, "c")  # cross-class
    b = _cast_checked(np.array([0, 1], dtype=np.uint64),
                      dt.UNSIGNED_BYTE, np.bool_, "c")
    assert b.dtype == np.bool_
    with pytest.raises(UnsupportedDataType):
        _cast_checked(np.array([2], dtype=np.uint64), dt.UNSIGNED_BYTE,
                      np.bool_, "c")
