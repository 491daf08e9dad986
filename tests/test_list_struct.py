"""``list<struct>`` (and deeper nested-list) shredding: the flattened
element array recurses under ``name#values`` — per-level lengths play
the role of Dremel repetition levels. The tokenizer-offset / span shape
(``array<struct<start,end>>``) the r4 verdict flagged as refused.

Reference anchor: the reference format is single-level
(wills-columnar-format.org src/lib.rs:59-66); nesting is this engine's
columnar-shredding extension, consistent with the existing struct/map
trees.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    decode_table,
    encode_table,
    write_checkpoint,
)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        (i, f"doc {i}",
         [{"start": j * 7, "end": j * 7 + (i + j) % 5}
          for j in range(i % 4)])
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, "
        "spans array<struct<start: int, end: int>>",
    ).localCheckpoint(eager=True)


def _span_map(df):
    return {r.doc_id: (r.text, [(s.start, s.end) for s in r.spans])
            for r in df.collect()}


def test_list_struct_roundtrip(spark, spans):
    m = encode_table(spans, key_col="doc_id", num_partitions=3,
                     chunk_rows=64)
    # shredded names: spans#lengths + spans#values#f:{start,end}
    cols = {r.column for r in m.select("column").distinct().collect()}
    assert "spans#lengths" in cols
    assert "spans#values#f:start" in cols
    assert "spans#values#f:end" in cols
    dec = decode_table(m, spans.schema)
    assert _span_map(dec) == _span_map(spans)


def test_list_struct_checkpoint_checksums_projection(spark, spans,
                                                     tmp_path):
    ck = str(tmp_path / "c")
    write_checkpoint(
        encode_table(spans, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        ck, schema=spans.schema)
    dec = decode_checkpoint(spark, ck, verify_checksums=True)
    assert _span_map(dec) == _span_map(spans)
    # zero-Exchange clustered read survives
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # projection decodes only the nested column's sub-tree
    proj = decode_checkpoint(spark, ck, columns=["doc_id", "spans"])
    got = {r.doc_id: [(s.start, s.end) for s in r.spans]
           for r in proj.collect()}
    assert got == {k: v[1] for k, v in _span_map(spans).items()}


def test_nested_list_of_list(spark):
    rows = [(i, [list(range(j % 3 + 1)) for j in range(i % 4)])
            for i in range(120)]
    df = spark.createDataFrame(
        rows, "doc_id long, grams array<array<int>>"
    ).localCheckpoint(eager=True)
    m = encode_table(df, key_col="doc_id", num_partitions=2,
                     chunk_rows=32)
    dec = decode_table(m, df.schema)
    got = {r.doc_id: [list(g) for g in r.grams] for r in dec.collect()}
    exp = {r.doc_id: [list(g) for g in r.grams] for r in df.collect()}
    assert got == exp


def test_list_struct_null_handling(spark):
    rows = [
        (0, [{"start": 1, "end": 2}]),
        (1, None),                      # null list
        (2, []),
        (3, [None, {"start": 5, "end": 6}]),   # null struct element
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, spans array<struct<start: int, end: int>>")
    from wills_columnar_format_spark.dtypes import UnsupportedDataType
    with pytest.raises(Exception):
        # default contract: null-free (worker-side raise)
        decode_table(
            encode_table(df, key_col="doc_id", num_partitions=1),
            df.schema).collect()
    m = encode_table(df, key_col="doc_id", num_partitions=1,
                     allow_nulls=True, chunk_rows=2)
    dec = decode_table(m, df.schema)
    got = {r.doc_id: (None if r.spans is None else
                      [None if s is None else (s.start, s.end)
                       for s in r.spans])
           for r in dec.collect()}
    assert got == {0: [(1, 2)], 1: None, 2: [],
                   3: [None, (5, 6)]}
