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


# ---------------------------------------------------------------------------
# merge_into_df: fully distributed classic-upsert MERGE (round 5)
# ---------------------------------------------------------------------------


def test_merge_into_df_matches_upsert_shape(spark, docs, ckpt):
    from wills_columnar_format_spark.engine import merge_into_df

    src = spark.createDataFrame(
        [(5, "new", 1000), (7, "new", 1001), (900, "new", 1002)],
        "doc_id long, source string, n_chars long")
    res = merge_into_df(spark, ckpt, src, "doc_id")
    assert (res["updated"], res["deleted"], res["inserted"]) == (2, 0, 1)
    rows = _rows(spark, ckpt)
    assert len(rows) == 301
    assert rows[5] == ("new", 1000)
    assert rows[7] == ("new", 1001)
    assert rows[900] == ("new", 1002)
    assert rows[6] == ("src1", 6 % 97)
    hist = checkpoint_history(spark, ckpt).collect()
    assert [r.action for r in hist] == ["create", "merge"]
    # replay the SAME batch: idempotent at the row level (fresh
    # generation, no chunk-key collision) and counts re-attribute —
    # every key now matches the live snapshot
    res2 = merge_into_df(spark, ckpt, src, "doc_id")
    assert (res2["updated"], res2["inserted"]) == (3, 0)
    assert res2["gen"] != res["gen"]
    assert _rows(spark, ckpt) == rows


def test_merge_into_df_change_feed_and_time_travel(spark, docs, ckpt):
    from wills_columnar_format_spark.engine import merge_into_df

    src = spark.createDataFrame(
        [(1, "m", -1), (990, "m", -2)],
        "doc_id long, source string, n_chars long")
    merge_into_df(spark, ckpt, src, "doc_id")
    # time travel: snapshot 0 is the pre-merge table
    pre = decode_checkpoint(spark, ckpt, as_of=0)
    assert pre.count() == 300
    assert {r.doc_id: r.source for r in pre.filter(
        F.col("doc_id") == 1).collect()} == {1: "src1"}
    feed = read_changes(spark, ckpt, since=0, key_col="doc_id").collect()
    kinds = {(r.doc_id, r._change_type) for r in feed}
    assert (1, "delete") in kinds and (1, "insert") in kinds
    assert (990, "insert") in kinds and (990, "delete") not in kinds


def test_merge_into_df_refusals(spark, docs, ckpt):
    from wills_columnar_format_spark.engine import merge_into_df

    dup = spark.createDataFrame(
        [(5, "a", 1), (5, "b", 2)],
        "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="key-unique"):
        merge_into_df(spark, ckpt, dup, "doc_id")
    narrow = spark.createDataFrame([(5, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="must equal the table's"):
        merge_into_df(spark, ckpt, narrow, "doc_id")
    empty = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long")
    assert merge_into_df(spark, ckpt, empty, "doc_id")["gen"] == ""
    hist = checkpoint_history(spark, ckpt).collect()
    assert [r.action for r in hist] == ["create"]  # no phantom commit


def test_merge_checkpoint_overflow_points_at_merge_into_df(
        spark, docs, ckpt, monkeypatch):
    from wills_columnar_format_spark import engine as eng

    monkeypatch.setattr(eng, "UPSERT_KEYS_MAX", 100)
    src = spark.createDataFrame(
        [(i, "x", i) for i in range(150)],
        "doc_id long, source string, n_chars long")
    with pytest.raises(ValueError, match="merge_into_df"):
        merge_checkpoint(spark, ckpt, src, "doc_id")


def test_upsert_checkpoint_past_cap_goes_distributed(
        spark, docs, ckpt, monkeypatch):
    # lower the driver ceiling to force the distributed mark pass and
    # verify the full upsert contract survives it: replacement, append,
    # logged commit, replay idempotency
    from wills_columnar_format_spark import engine as eng

    monkeypatch.setattr(eng, "UPSERT_KEYS_MAX", 50)
    src = spark.createDataFrame(
        [(i, "up", 10000 + i) for i in range(250, 400)],
        "doc_id long, source string, n_chars long")
    gen1 = eng.upsert_checkpoint(spark, ckpt, src, "doc_id",
                                 num_partitions=2, chunk_rows=64)
    rows = _rows(spark, ckpt)
    assert len(rows) == 400
    assert rows[260] == ("up", 10260)
    assert rows[10] == ("src0", 10 % 97)
    hist = checkpoint_history(spark, ckpt).collect()
    assert [r.action for r in hist] == ["create", "upsert"]
    # replay: fresh generation (file-listing salt), identical rows
    gen2 = eng.upsert_checkpoint(spark, ckpt, src, "doc_id",
                                 num_partitions=2, chunk_rows=64)
    assert gen2 != gen1
    assert _rows(spark, ckpt) == rows


def test_upsert_table_past_cap_goes_distributed(spark, docs, monkeypatch):
    from wills_columnar_format_spark import engine as eng

    monkeypatch.setattr(eng, "UPSERT_KEYS_MAX", 50)
    m = encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64)
    src = spark.createDataFrame(
        [(i, "up", -i) for i in range(200, 350)],
        "doc_id long, source string, n_chars long")
    out = eng.upsert_table(m, src, "doc_id", num_partitions=2,
                           chunk_rows=64)
    dec = eng.decode_table(out, docs.schema)
    got = {r.doc_id: (r.source, r.n_chars) for r in dec.collect()}
    assert len(got) == 350
    assert got[210] == ("up", -210)
    assert got[10] == ("src0", 10 % 97)
