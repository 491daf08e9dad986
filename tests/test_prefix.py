"""String-prefix value_range: the LIKE 'p%' pushdown over string zone
maps. A 2-tuple ``value_range=(col, prefix)`` prunes chunks by the band
[prefix, successor(prefix)) and exact-filters with ``startswith`` —
BETWEEN bounds cannot express a prefix band ('src1%' matches src1 AND
src10..src19, which straddle 'src2')."""

import pytest

from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    _prefix_successor,
    decode_checkpoint,
    decode_table,
    encode_table,
    write_checkpoint,
)


def test_prefix_successor_basic():
    assert _prefix_successor("src1") == "src2"
    assert _prefix_successor("a\U0010FFFF") == "b"
    assert _prefix_successor("\U0010FFFF\U0010FFFF") is None
    # surrogate block is jumped, not entered (lone surrogates can't
    # encode to UTF-8 for the JVM literal)
    assert _prefix_successor("퟿") == ""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 20}", f"t{i}") for i in range(400)],
        "doc_id long, source string, text string",
    )


def test_prefix_matches_like(spark, docs):
    m = encode_table(docs, key_col="source", codec="auto",
                     num_partitions=4, partitioner="range", chunk_rows=32)
    got = decode_table(m, docs.schema, value_range=("source", "src1"))
    exp = docs.filter(F.col("source").startswith("src1"))
    assert sorted(got.collect()) == sorted(exp.collect())
    # the band is NOT a contiguous BETWEEN over the distinct values:
    assert exp.select("source").distinct().count() == 11  # src1,src10..19


def test_prefix_prunes_chunks(spark, docs):
    """Chunks keyed by source are source-pure; the prefix band must
    decode strictly fewer chunks than a full scan (zone-map prune)."""
    from wills_columnar_format_spark.engine import _conjunctive_hit_keys, \
        _prepare_value_range
    from pyspark.sql.pandas.types import to_arrow_schema

    m = encode_table(docs, key_col="source", codec="auto",
                     num_partitions=4, partitioner="range",
                     chunk_rows=32).cache()
    try:
        total = m.select("chunk_key").distinct().count()
        v = _prepare_value_range(to_arrow_schema(docs.schema),
                                 ("source", "src1"))
        hit = _conjunctive_hit_keys(
            m.filter(~F.col("column").startswith("__")), [v]).count()
        assert hit < total
    finally:
        m.unpersist()


def test_prefix_on_checkpoint(spark, docs, tmp_path):
    ckpt = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="source", codec="auto",
                     num_partitions=4, partitioner="range", chunk_rows=32),
        ckpt, schema=docs.schema)
    got = decode_checkpoint(spark, ckpt, docs.schema,
                            value_range=("source", "src1"))
    exp = docs.filter(F.col("source").startswith("src1"))
    assert sorted(got.collect()) == sorted(exp.collect())


def test_prefix_composes_with_range(spark, docs):
    m = encode_table(docs, key_col="source", codec="auto",
                     num_partitions=4, partitioner="range", chunk_rows=32)
    got = decode_table(m, docs.schema,
                       value_range=[("source", "src1"),
                                    ("doc_id", 0, 99)])
    exp = docs.filter(F.col("source").startswith("src1")
                      & (F.col("doc_id") <= 99))
    assert sorted(got.collect()) == sorted(exp.collect())


def test_prefix_type_errors(spark, docs):
    m = encode_table(docs, key_col="source", codec="auto",
                     num_partitions=2, chunk_rows=64)
    with pytest.raises(TypeError, match="STRING"):
        decode_table(m, docs.schema, value_range=("doc_id", "src1")).count()
    with pytest.raises(TypeError, match="non-empty"):
        decode_table(m, docs.schema, value_range=("source", "")).count()
    with pytest.raises(TypeError, match="successor"):
        decode_table(m, docs.schema,
                     value_range=("source", "\U0010FFFF")).count()
