"""DROP COLUMN as a metadata-only logged mutation
(``drop_column_checkpoint``).

Delta-style semantics: no data file is touched — the schema sidecar
narrows, a ``drop_column`` commit records it, schema-less decodes stop
seeing the column immediately. Bytes reclaim at the next rewrite: the
metadata-only compact strips the dropped columns' manifest rows, the
re-encoding paths decode through the narrowed sidecar. Pins: live
decode after drop; history record; as_of time travel (explicit wider
schema works, schema-less guess refused); CDF sees no row change from
a drop; compact reclaim; refusals (unknown / last column, unlogged or
sidecar-less checkpoints).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    compact_checkpoint,
    decode_checkpoint,
    drop_column_checkpoint,
    dropped_columns,
    encode_table,
    read_changes,
    read_commit_log,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", f"text {i}", (i * 7) % 500)
         for i in range(400)],
        "doc_id long, source string, text string, n_chars long",
    )


def _ckpt(docs, path):
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        path, schema=docs.schema)
    return path


def test_drop_live_decode_and_history(spark, docs, tmp_path):
    ckpt = _ckpt(docs, str(tmp_path / "d"))
    seq = drop_column_checkpoint(spark, ckpt, "text")
    assert seq == 1
    assert dropped_columns(ckpt) == ["text"]
    live = decode_checkpoint(spark, ckpt)  # schema-less: sidecar rules
    assert live.columns == ["doc_id", "source", "n_chars"]
    want = docs.drop("text")
    assert live.count() == 400
    assert live.exceptAll(want).count() == 0
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "drop_column")]
    assert log[1]["files"] == []  # metadata-only: zero files touched


def test_time_travel_past_drop(spark, docs, tmp_path):
    ckpt = _ckpt(docs, str(tmp_path / "t"))
    drop_column_checkpoint(spark, ckpt, "text")
    # schema-less as_of before the drop: refuse to guess the wide schema
    with pytest.raises(ValueError, match="predates the drop"):
        decode_checkpoint(spark, ckpt, as_of=0)
    # explicit wide schema: the data files are all still present
    old = decode_checkpoint(spark, ckpt, docs.schema, as_of=0)
    assert old.count() == 400
    assert old.exceptAll(docs).count() == 0
    # as_of AT the drop commit decodes the narrowed snapshot fine
    assert decode_checkpoint(spark, ckpt, as_of=1).columns == \
        ["doc_id", "source", "n_chars"]


def test_change_feed_ignores_drop(spark, docs, tmp_path):
    ckpt = _ckpt(docs, str(tmp_path / "c"))
    drop_column_checkpoint(spark, ckpt, "n_chars")
    feed = read_changes(spark, ckpt, since=0, key_col="doc_id")
    assert feed.count() == 0  # a drop inserts/deletes no rows


def test_compact_reclaims_dropped_rows(spark, docs, tmp_path):
    ckpt = _ckpt(docs, str(tmp_path / "s"))
    drop_column_checkpoint(spark, ckpt, "text")
    dst = str(tmp_path / "compacted")
    compact_checkpoint(spark, ckpt, dst)
    man = spark.read.parquet(dst)
    assert man.filter(F.col("column").startswith("text")).count() == 0
    assert man.filter("column = 'doc_id'").count() > 0
    live = decode_checkpoint(spark, dst)
    assert live.columns == ["doc_id", "source", "n_chars"]
    assert live.exceptAll(docs.drop("text")).count() == 0


def test_backfill_refuses_existing_and_dropped_names(spark, docs,
                                                     tmp_path):
    """Re-adding a name whose manifest rows still exist (any existing
    column, or a schema-dropped one pre-compaction) would collide in
    decode's dropDuplicates — refused loudly; after compaction the
    name is genuinely free again."""
    from wills_columnar_format_spark.engine import backfill_column

    ckpt = _ckpt(docs, str(tmp_path / "b"))
    drop_column_checkpoint(spark, ckpt, "text")
    man = spark.read.parquet(ckpt)
    kv = docs.select("doc_id", F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="already has manifest rows"):
        backfill_column(man, kv, "doc_id", "text")
    with pytest.raises(ValueError, match="already has manifest rows"):
        backfill_column(man, docs.select("doc_id", "source"), "doc_id",
                        "source")
    # compaction strips the dropped rows -> the name is free again
    dst = str(tmp_path / "bc")
    compact_checkpoint(spark, ckpt, dst)
    man2 = backfill_column(spark.read.parquet(dst), kv, "doc_id", "text")
    from wills_columnar_format_spark.engine import decode_table

    dec = decode_table(man2, docs.schema)
    assert dec.count() == 400
    assert dec.filter(F.col("text") != "x").count() == 0


def test_refusals(spark, docs, tmp_path):
    ckpt = _ckpt(docs, str(tmp_path / "r"))
    with pytest.raises(ValueError, match="not in the table"):
        drop_column_checkpoint(spark, ckpt, "nope")
    # unlogged checkpoint (plain parquet write): refused
    bare = str(tmp_path / "bare")
    encode_table(docs, key_col="doc_id",
                 num_partitions=1).write.parquet(bare)
    with pytest.raises(ValueError, match="_commits log"):
        drop_column_checkpoint(spark, bare, "text")
    # last-column drop refused
    one = docs.select("doc_id")
    last = str(tmp_path / "one")
    write_checkpoint(encode_table(one, key_col="doc_id",
                                  num_partitions=1),
                     last, schema=one.schema)
    with pytest.raises(ValueError, match="LAST column"):
        drop_column_checkpoint(spark, last, "doc_id")
