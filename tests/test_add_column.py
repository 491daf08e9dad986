"""ADD COLUMN (``add_column_checkpoint``) — Delta's metadata-only
ALTER TABLE ADD COLUMN with a default on this format.

The add is metadata-only: the ``_table_schema`` sidecar widens by one
field carrying a typed default in field metadata, and an ``add_column``
commit logs it. Chunks encoded BEFORE the add carry no sub-columns for
the field; decode synthesizes a constant/null array per such chunk.
Chunks appended after the add carry real data — mixed checkpoints
decode seamlessly. Re-encoding compaction / optimize MATERIALIZE the
fill; ``delete_where`` refuses predicates the default might satisfy.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import engine
from wills_columnar_format_spark.engine import (
    add_column_checkpoint,
    compact_checkpoint,
    decode_checkpoint,
    delete_keys_checkpoint,
    delete_where_checkpoint,
    drop_column_checkpoint,
    encode_table,
    optimize_checkpoint,
    read_checkpoint_schema,
    read_commit_log,
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


def test_add_null_and_constant_defaults_decode(spark, docs, ckpt):
    seq = add_column_checkpoint(ckpt, "lang", "string", default="en")
    assert seq == 1
    add_column_checkpoint(ckpt, "score", "double")  # NULL default
    out = decode_checkpoint(spark, ckpt)
    assert out.columns == ["doc_id", "source", "text", "n_chars",
                           "lang", "score"]
    assert out.count() == 400
    assert out.filter(F.col("lang") == "en").count() == 400
    assert out.filter(F.col("score").isNull()).count() == 400
    # projection mixing stored + added columns
    proj = decode_checkpoint(spark, ckpt, columns=["lang", "doc_id"])
    assert proj.columns == ["lang", "doc_id"]
    assert proj.filter(F.col("lang") == "en").count() == 400


def test_add_all_added_projection_refused(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    with pytest.raises(ValueError, match="anchor row counts"):
        decode_checkpoint(spark, ckpt, columns=["lang"]).collect()


def test_add_then_append_mixes_real_and_filled(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    more = spark.createDataFrame(
        [(i, "new", f"t{i}", 1, "fr") for i in range(1000, 1050)],
        "doc_id long, source string, text string, n_chars long, "
        "lang string",
    )
    write_checkpoint(
        encode_table(more, key_col="doc_id", num_partitions=1),
        ckpt, mode="append")
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 450
    assert out.filter(F.col("lang") == "fr").count() == 50
    assert out.filter(F.col("lang") == "en").count() == 400
    # the sidecar still carries the default marker after the append
    assert engine._added_defaults(read_checkpoint_schema(ckpt)) == \
        {"lang": "en"}


def test_add_value_range_filters_without_pruning(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "prio", "long", default=7)
    more = spark.createDataFrame(
        [(i, "new", f"t{i}", 1, i - 1000) for i in range(1000, 1050)],
        "doc_id long, source string, text string, n_chars long, "
        "prio long",
    )
    write_checkpoint(
        encode_table(more, key_col="doc_id", num_partitions=1),
        ckpt, mode="append")
    # range covering the default: all 400 old + matching new rows
    hit = decode_checkpoint(spark, ckpt, value_range=("prio", 5, 10))
    assert hit.count() == 400 + 6  # new rows prio 5..10
    # range excluding the default: only new rows
    hit = decode_checkpoint(spark, ckpt, value_range=("prio", 20, 30))
    assert sorted(r.doc_id for r in hit.collect()) == \
        list(range(1020, 1031))
    # value_in on the added column
    hit = decode_checkpoint(spark, ckpt, value_in=("prio", [7, 42]))
    assert hit.count() == 400 + 2  # defaults + new prio 7 and 42


def test_add_upsert_and_point_lookup(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    batch = spark.createDataFrame(
        [(3, "upd", "new text 3", 0, "de")],
        "doc_id long, source string, text string, n_chars long, "
        "lang string",
    )
    upsert_checkpoint(spark, ckpt, batch, "doc_id", num_partitions=1)
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 400
    row = out.filter(F.col("doc_id") == 3).collect()[0]
    assert row.lang == "de" and row.source == "upd"
    hit = decode_checkpoint(spark, ckpt, keys=[3, 4], key_col="doc_id")
    got = {r.doc_id: r.lang for r in hit.collect()}
    assert got == {3: "de", 4: "en"}


def test_add_delete_where_guard(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "prio", "long", default=7)
    # predicate the default satisfies — refused until materialized
    with pytest.raises(ValueError, match="metadata-added"):
        delete_where_checkpoint(spark, ckpt, ("prio", 0, 10))
    # predicate the default can NOT satisfy — allowed (no-op here)
    delete_where_checkpoint(spark, ckpt, ("prio", 100, 200))
    assert decode_checkpoint(spark, ckpt).count() == 400
    # delete_where on stored columns is unaffected
    delete_where_checkpoint(spark, ckpt, ("n_chars", 90, 96))
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 400 - len(
        [i for i in range(400) if i % 97 >= 90])
    # the filled column survives the mask pass
    assert out.filter(F.col("prio") == 7).count() == out.count()
    # NULL default never matches a predicate — always allowed
    add_column_checkpoint(ckpt, "score", "double")
    delete_where_checkpoint(spark, ckpt, ("score", 0.0, 1.0))


def test_add_compact_materializes(spark, docs, ckpt, tmp_path):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    add_column_checkpoint(ckpt, "score", "double")  # NULL default

    # metadata-only compact CARRIES the markers
    meta = str(tmp_path / "meta")
    compact_checkpoint(spark, ckpt, meta, num_files=2)
    assert set(engine._added_defaults(read_checkpoint_schema(meta))) == \
        {"lang", "score"}
    out = decode_checkpoint(spark, meta)
    assert out.filter(F.col("lang") == "en").count() == 400

    # re-encoding compact MATERIALIZES the fill and strips the markers
    reenc = str(tmp_path / "reenc")
    compact_checkpoint(spark, ckpt, reenc, rechunk_rows=4096,
                       key_col="doc_id")
    assert engine._added_defaults(read_checkpoint_schema(reenc)) == {}
    roots = {r["column"].split("#")[0] for r in
             spark.read.parquet(reenc)
             .select("column").distinct().collect()}
    assert "lang" in roots and "score" in roots
    out = decode_checkpoint(spark, reenc)
    assert out.filter(F.col("lang") == "en").count() == 400
    assert out.filter(F.col("score").isNull()).count() == 400
    # materialized column now prunes by value like any stored column
    assert decode_checkpoint(
        spark, reenc, value_range=("lang", "en", "en")).count() == 400


def test_add_optimize_in_place_materializes(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "prio", "long", default=7)
    delete_keys_checkpoint(spark, ckpt, [0, 1], "doc_id")
    optimize_checkpoint(spark, ckpt, key_col="doc_id",
                        rechunk_rows=4096)
    assert engine._added_defaults(read_checkpoint_schema(ckpt)) == {}
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 398
    assert out.filter(F.col("prio") == 7).count() == 398
    # delete_where on the now-materialized column works
    delete_where_checkpoint(spark, ckpt, ("prio", 0, 10))
    assert decode_checkpoint(spark, ckpt).count() == 0


def test_add_time_travel_shows_current_schema(spark, docs, ckpt):
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    snap = decode_checkpoint(spark, ckpt, as_of=0)
    assert snap.columns == ["doc_id", "source", "text", "n_chars",
                            "lang"]
    assert snap.count() == 400
    assert snap.filter(F.col("lang") == "en").count() == 400


def test_add_then_rename_and_drop(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    rename_column_checkpoint(ckpt, "lang", "language")
    out = decode_checkpoint(spark, ckpt)
    assert "language" in out.columns
    assert out.filter(F.col("language") == "en").count() == 400
    drop_column_checkpoint(spark, ckpt, "language")
    out = decode_checkpoint(spark, ckpt)
    assert out.columns == ["doc_id", "source", "text", "n_chars"]


def test_add_refusals(spark, docs, ckpt, tmp_path):
    with pytest.raises(ValueError, match="already names"):
        add_column_checkpoint(ckpt, "n_chars", "long")
    with pytest.raises(ValueError, match="reserved"):
        add_column_checkpoint(ckpt, "a#b", "long")
    with pytest.raises(ValueError, match="reserved"):
        add_column_checkpoint(ckpt, "_hidden", "long")
    with pytest.raises((pa.lib.ArrowInvalid, pa.lib.ArrowTypeError,
                        TypeError, ValueError)):
        add_column_checkpoint(ckpt, "bad", "long", default="not an int")
    rename_column_checkpoint(ckpt, "n_chars", "length")
    with pytest.raises(ValueError, match="PHYSICAL"):
        add_column_checkpoint(ckpt, "n_chars", "long")

    unlogged = str(tmp_path / "u")
    encode_table(docs, key_col="doc_id",
                 num_partitions=1).write.parquet(unlogged)
    with pytest.raises(ValueError, match="_commits|_table_schema"):
        add_column_checkpoint(unlogged, "x", "long")


def test_add_history_and_zero_exchange(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "lang", "string", default="en")
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "add_column")]
    assert log[-1]["files"] == []
    dec = decode_checkpoint(spark, ckpt)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert dec.count() == 400


def test_add_array_type_default(spark, docs, ckpt):
    add_column_checkpoint(ckpt, "tags", "array<string>")
    out = decode_checkpoint(spark, ckpt)
    assert out.filter(F.col("tags").isNull()).count() == 400
    more = spark.createDataFrame(
        [(1000, "new", "t", 1, ["a", "b"])],
        "doc_id long, source string, text string, n_chars long, "
        "tags array<string>",
    )
    write_checkpoint(
        encode_table(more, key_col="doc_id", num_partitions=1,
                     allow_nulls=True),
        ckpt, mode="append")
    out = decode_checkpoint(spark, ckpt)
    assert out.count() == 401
    row = out.filter(F.col("doc_id") == 1000).collect()[0]
    assert row.tags == ["a", "b"]


import pyarrow as pa  # noqa: E402  (used in test_add_refusals)
