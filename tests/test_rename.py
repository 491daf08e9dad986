"""RENAME COLUMN (``rename_column_checkpoint``) — Delta column-mapping
semantics on this format.

The rename is metadata-only: the ``_table_schema`` sidecar field is
renamed with its PHYSICAL manifest name in field metadata, and every
checkpoint-boundary path translates — decode (all pruning args),
delete/upsert/update/delete_where mutations, appends of freshly encoded
manifests, and the change feed. The re-encoding compaction and in-place
optimize MATERIALIZE the rename; the metadata compact carries it.
"""

import os

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import engine
from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    delete_keys_checkpoint,
    drop_column_checkpoint,
    encode_table,
    read_changes,
    read_checkpoint_schema,
    rename_column_checkpoint,
    upsert_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", f"text {i}", i % 97) for i in range(400)],
        "doc_id long, source string, text string, n_chars long",
    )


@pytest.fixture()
def ckpt(spark, docs, tmp_path):
    path = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64),
        path, schema=docs.schema)
    return path


def test_rename_decode_and_pruning_args(spark, docs, ckpt):
    seq = rename_column_checkpoint(ckpt, "n_chars", "length")
    assert seq == 1
    out = decode_checkpoint(spark, ckpt)
    assert out.columns == ["doc_id", "source", "text", "length"]
    rows = {r.doc_id: r.length for r in out.collect()}
    assert rows == {i: i % 97 for i in range(400)}

    # value_range on the NEW name prunes + filters exactly
    vr = decode_checkpoint(spark, ckpt, value_range=("length", 10, 12))
    assert sorted(r.doc_id for r in vr.collect()) == \
        sorted(i for i in range(400) if 10 <= i % 97 <= 12)
    # projection by the new name
    proj = decode_checkpoint(spark, ckpt, columns=["length", "doc_id"])
    assert proj.columns == ["length", "doc_id"]
    assert proj.count() == 400
    # old name is gone everywhere
    with pytest.raises(Exception, match="n_chars"):
        decode_checkpoint(spark, ckpt, columns=["n_chars"]).collect()


def test_rename_key_column_lookup_and_mutations(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "doc_id", "id")
    hit = decode_checkpoint(spark, ckpt, keys=[7, 9], key_col="id")
    assert sorted(r.id for r in hit.collect()) == [7, 9]

    delete_keys_checkpoint(spark, ckpt, [0, 1, 2], "id")
    assert decode_checkpoint(spark, ckpt).count() == 397

    batch = (docs.filter(F.col("doc_id") < 5)
             .withColumnRenamed("doc_id", "id")
             .withColumn("n_chars", F.lit(-1))
             .withColumnRenamed("n_chars", "n_chars"))
    upsert_checkpoint(spark, ckpt, batch, "id", num_partitions=1)
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 400  # 0,1,2 reinserted
    assert out.filter(F.col("n_chars") == -1).count() == 5
    # the physical manifest never grew a second name for the key
    man = spark.read.parquet(ckpt)
    roots = {r["column"].split("#")[0] for r in
             man.select("column").distinct().collect()}
    assert "id" not in roots and "doc_id" in roots


def test_rename_update_where_and_delete_where(spark, docs, ckpt):
    from wills_columnar_format_spark.engine import (
        delete_where_checkpoint,
        update_where_checkpoint,
    )

    rename_column_checkpoint(ckpt, "n_chars", "length")
    got = update_where_checkpoint(
        spark, ckpt, ("length", 0, 1), {"source": "tiny"}, "doc_id")
    assert got["updated"] == \
        len([i for i in range(400) if i % 97 <= 1])
    out = decode_checkpoint(spark, ckpt)
    assert out.filter(F.col("source") == "tiny").count() == got["updated"]

    delete_where_checkpoint(spark, ckpt, ("length", 90, 96))
    out = decode_checkpoint(spark, ckpt)
    assert out.filter(F.col("length") >= 90).count() == 0
    assert out.count() == 400 - len(
        [i for i in range(400) if i % 97 >= 90])


def test_rename_append_lands_physical(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "text", "body")
    more = spark.createDataFrame(
        [(i, "new", f"body {i}", 1) for i in range(1000, 1050)],
        "doc_id long, source string, body string, n_chars long",
    )
    write_checkpoint(
        encode_table(more, key_col="doc_id", num_partitions=1),
        ckpt, mode="append")
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 450
    assert out.filter(F.col("doc_id") >= 1000) \
        .filter(F.col("body").startswith("body")).count() == 50
    # the sidecar mapping survived the append (schema kept, not clobbered)
    assert engine._checkpoint_rename_map(ckpt) == {"body": "text"}
    man = spark.read.parquet(ckpt)
    roots = {r["column"].split("#")[0] for r in
             man.select("column").distinct().collect()}
    assert "body" not in roots  # fresh chunks landed under physical name


def test_rename_change_feed_speaks_new_names(spark, docs, ckpt):
    delete_keys_checkpoint(spark, ckpt, [3], "doc_id")
    rename_column_checkpoint(ckpt, "source", "origin")
    delete_keys_checkpoint(spark, ckpt, [4], "doc_id")
    feed = read_changes(spark, ckpt, since=-1, key_col="doc_id")
    assert "origin" in feed.columns and "source" not in feed.columns
    dels = sorted(r.doc_id for r in
                  feed.filter("_change_type = 'delete'").collect())
    assert dels == [3, 4]
    ins = feed.filter("_change_type = 'insert'")
    assert ins.count() == 400
    assert ins.filter(F.col("origin").isNull()).count() == 0


def test_rename_time_travel_shows_current_names(spark, docs, ckpt):
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    rename_column_checkpoint(ckpt, "n_chars", "length")
    snap = decode_checkpoint(spark, ckpt, as_of=0)
    assert snap.columns == ["doc_id", "source", "text", "length"]
    assert snap.count() == 400


def test_rename_compact_materializes(spark, docs, ckpt, tmp_path):
    from wills_columnar_format_spark.engine import compact_checkpoint

    rename_column_checkpoint(ckpt, "n_chars", "length")

    # metadata-only compact CARRIES the mapping
    meta = str(tmp_path / "meta")
    compact_checkpoint(spark, ckpt, meta, num_files=2)
    assert engine._checkpoint_rename_map(meta) == {"length": "n_chars"}
    assert decode_checkpoint(spark, meta).columns == \
        ["doc_id", "source", "text", "length"]

    # re-encoding compact MATERIALIZES it
    reenc = str(tmp_path / "reenc")
    compact_checkpoint(spark, ckpt, reenc, rechunk_rows=4096,
                       key_col="doc_id")
    assert engine._checkpoint_rename_map(reenc) == {}
    out = decode_checkpoint(spark, reenc)
    assert out.columns == ["doc_id", "source", "text", "length"]
    assert out.count() == 400
    roots = {r["column"].split("#")[0] for r in
             spark.read.parquet(reenc)
             .select("column").distinct().collect()}
    assert "length" in roots and "n_chars" not in roots


def test_rename_optimize_in_place_materializes(spark, docs, ckpt):
    from wills_columnar_format_spark.engine import optimize_checkpoint

    rename_column_checkpoint(ckpt, "n_chars", "length")
    delete_keys_checkpoint(spark, ckpt, [0, 1], "doc_id")
    optimize_checkpoint(spark, ckpt, key_col="doc_id",
                        rechunk_rows=4096)
    assert engine._checkpoint_rename_map(ckpt) == {}
    sidecar = read_checkpoint_schema(ckpt)
    assert sidecar.names == ["doc_id", "source", "text", "length"]
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 398
    assert out.filter(F.col("length") > 90).count() > 0


def test_rename_chain_keeps_original_physical(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "n_chars", "size")
    rename_column_checkpoint(ckpt, "size", "length")
    assert engine._checkpoint_rename_map(ckpt) == {"length": "n_chars"}
    out = decode_checkpoint(spark, ckpt,
                            value_range=("length", 0, 5))
    assert out.count() == len([i for i in range(400) if i % 97 <= 5])


def test_rename_refusals(spark, docs, ckpt, tmp_path):
    with pytest.raises(ValueError, match="not in the table"):
        rename_column_checkpoint(ckpt, "nope", "x")
    with pytest.raises(ValueError, match="already names"):
        rename_column_checkpoint(ckpt, "n_chars", "source")
    with pytest.raises(ValueError, match="reserved"):
        rename_column_checkpoint(ckpt, "n_chars", "a#b")
    with pytest.raises(ValueError, match="reserved"):
        rename_column_checkpoint(ckpt, "n_chars", "_hidden")
    rename_column_checkpoint(ckpt, "n_chars", "length")
    with pytest.raises(ValueError, match="PHYSICAL"):
        # n_chars is still field 'length's physical manifest name
        rename_column_checkpoint(ckpt, "source", "n_chars")
    with pytest.raises(ValueError, match="RENAMED"):
        drop_column_checkpoint(spark, ckpt, "length")

    unlogged = str(tmp_path / "u")
    encode_table(docs, key_col="doc_id",
                 num_partitions=1).write.parquet(unlogged)
    with pytest.raises(ValueError, match="_commits|_table_schema"):
        rename_column_checkpoint(unlogged, "n_chars", "length")


def test_rename_history_and_zero_exchange(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "n_chars", "length")
    from wills_columnar_format_spark.engine import read_commit_log

    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "rename_column")]
    assert log[-1]["generation"] == "n_chars:length"
    assert log[-1]["files"] == []
    # the shuffle-free decode path survives the translation hop
    dec = decode_checkpoint(spark, ckpt)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert dec.count() == 400
