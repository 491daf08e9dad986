"""MERGE INTO (``merge_checkpoint``) — conditional matched /
not-matched clauses landed as ONE logged ``merge`` commit.

Physical model: mask sidecars for updated+deleted keys plus one
appended generation for updated+inserted rows, exactly an upsert's
two-append shape, so the clustered decode survives and the change feed
attributes the merge as the insert/delete pairs it is.
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    checkpoint_history,
    decode_checkpoint,
    encode_table,
    merge_checkpoint,
    read_changes,
    rename_column_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", i % 97) for i in range(300)],
        "doc_id long, source string, n_chars long",
    )


@pytest.fixture()
def ckpt(spark, docs, tmp_path):
    path = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64),
        path, schema=docs.schema)
    return path


def _rows(spark, ckpt):
    return {r.doc_id: (r.source, r.n_chars)
            for r in decode_checkpoint(spark, ckpt).collect()}


def test_merge_upsert_shape(spark, docs, ckpt):
    src = spark.createDataFrame(
        [(5, "new", 1000), (7, "new", 1001), (900, "new", 1002)],
        "doc_id long, source string, n_chars long")
    res = merge_checkpoint(spark, ckpt, src, "doc_id")
    assert (res["updated"], res["deleted"], res["inserted"]) == (2, 0, 1)
    rows = _rows(spark, ckpt)
    assert len(rows) == 301
    assert rows[5] == ("new", 1000)
    assert rows[7] == ("new", 1001)
    assert rows[900] == ("new", 1002)
    assert rows[6] == ("src1", 6 % 97)
    # one commit, kind 'merge'
    hist = checkpoint_history(spark, ckpt).collect()
    assert [r.action for r in hist] == ["create", "merge"]


def test_merge_conditional_update_set_map(spark, docs, ckpt):
    # update only where the source value is LARGER; bump, don't replace
    src = spark.createDataFrame(
        [(10, "x", 5), (11, "x", 100000), (950, "x", 7)],
        "doc_id long, source string, n_chars long")
    res = merge_checkpoint(
        spark, ckpt, src, "doc_id",
        matched_condition=F.col("src_n_chars") > F.col("n_chars"),
        set_map={"n_chars": F.col("n_chars") + F.col("src_n_chars")},
        not_matched_condition=F.col("n_chars") < 100,
    )
    assert (res["updated"], res["deleted"], res["inserted"]) == (1, 0, 1)
    rows = _rows(spark, ckpt)
    assert rows[10] == (f"src{10 % 5}", 10 % 97)     # condition failed
    assert rows[11] == (f"src{11 % 5}", 11 % 97 + 100000)  # partial SET
    assert rows[950] == ("x", 7)


def test_merge_delete_clause(spark, docs, ckpt):
    src = spark.createDataFrame(
        [(20, "d", 0), (21, "d", 0), (960, "d", 3)],
        "doc_id long, source string, n_chars long")
    res = merge_checkpoint(
        spark, ckpt, src, "doc_id", when_matched="delete",
        matched_condition=F.col("doc_id") == 20)
    assert (res["updated"], res["deleted"], res["inserted"]) == (0, 1, 1)
    rows = _rows(spark, ckpt)
    assert 20 not in rows
    assert rows[21] == (f"src{21 % 5}", 21 % 97)  # matched, cond failed
    assert rows[960] == ("d", 3)


def test_merge_insert_only_and_update_only(spark, docs, ckpt):
    src = spark.createDataFrame(
        [(30, "io", 1), (970, "io", 2)],
        "doc_id long, source string, n_chars long")
    res = merge_checkpoint(spark, ckpt, src, "doc_id",
                           when_matched=None)
    assert (res["updated"], res["deleted"], res["inserted"]) == (0, 0, 1)
    rows = _rows(spark, ckpt)
    assert rows[30] == (f"src{30 % 5}", 30 % 97)  # untouched
    assert rows[970] == ("io", 2)

    src2 = spark.createDataFrame(
        [(31, "uo", 9), (980, "uo", 9)],
        "doc_id long, source string, n_chars long")
    res2 = merge_checkpoint(spark, ckpt, src2, "doc_id",
                            when_not_matched=None)
    assert (res2["updated"], res2["deleted"], res2["inserted"]) == (1, 0, 0)
    rows = _rows(spark, ckpt)
    assert rows[31] == ("uo", 9)
    assert 980 not in rows


def test_merge_refusals_and_noop(spark, docs, ckpt):
    dup = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)],
        "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="key-unique"):
        merge_checkpoint(spark, ckpt, dup, "doc_id")
    bad_cols = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="must equal the table"):
        merge_checkpoint(spark, ckpt, bad_cols, "doc_id")
    with pytest.raises(ValueError, match="no clauses"):
        merge_checkpoint(spark, ckpt, dup.limit(1), "doc_id",
                         when_matched=None, when_not_matched=None)
    with pytest.raises(ValueError, match="set_map only applies"):
        merge_checkpoint(spark, ckpt, dup.limit(1), "doc_id",
                         when_matched="delete", set_map={"n_chars": 1})
    with pytest.raises(ValueError, match="key column"):
        merge_checkpoint(spark, ckpt, dup.limit(1), "doc_id",
                         set_map={"doc_id": 9})
    # a merge that touches nothing writes no phantom commit
    n0 = checkpoint_history(spark, ckpt).count()
    src = spark.createDataFrame(
        [(2, "z", 0)], "doc_id long, source string, n_chars long")
    res = merge_checkpoint(
        spark, ckpt, src, "doc_id",
        matched_condition=F.lit(False), when_not_matched=None)
    assert res == {"updated": 0, "deleted": 0, "inserted": 0, "gen": ""}
    assert checkpoint_history(spark, ckpt).count() == n0


def test_merge_through_rename_and_feed(spark, docs, ckpt):
    rename_column_checkpoint(ckpt, "n_chars", "length")
    src = spark.createDataFrame(
        [(40, "rn", 777), (990, "rn", 778)],
        "doc_id long, source string, length long")
    res = merge_checkpoint(spark, ckpt, src, "doc_id")
    assert (res["updated"], res["inserted"]) == (1, 1)
    out = {r.doc_id: r.length
           for r in decode_checkpoint(spark, ckpt).collect()}
    assert out[40] == 777 and out[990] == 778

    # the change feed sees the merge as its delete+insert pairs
    feed = read_changes(spark, ckpt, since=1, key_col="doc_id")
    ch = {(r.doc_id, r._change_type) for r in feed.collect()}
    assert (40, "delete") in ch and (40, "insert") in ch
    assert (990, "insert") in ch and (990, "delete") not in ch


def test_merge_time_travel_and_zero_exchange(spark, docs, ckpt):
    src = spark.createDataFrame(
        [(50, "tt", 42)], "doc_id long, source string, n_chars long")
    merge_checkpoint(spark, ckpt, src, "doc_id")
    old = decode_checkpoint(spark, ckpt, as_of=0)
    assert {r.n_chars for r in old.filter(F.col("doc_id") == 50).collect()} \
        == {50 % 97}
    dec = decode_checkpoint(spark, ckpt)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert dec.filter(F.col("doc_id") == 50).first().n_chars == 42
