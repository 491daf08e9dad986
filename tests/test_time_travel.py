"""Snapshot time travel over checkpoint mutations.

Mutations on this format only ever APPEND files (delete/upsert write
sidecar + new-generation files; data blobs are immutable), so a
snapshot is exactly a file subset. ``write_checkpoint`` starts a
``_commits/`` log recording which files each commit added;
``decode_checkpoint(as_of=seq)`` restricts every read — metadata pass,
sidecar collection, fallbacks — to the files of commits <= seq.

Pins: per-commit snapshots equal the expected table states; upsert is
ONE commit (no torn deleted-but-not-reinserted snapshot); snapshots
compose with keys=/columns=/value_range; the as_of fast path stays
zero-Exchange; an as_of read never writes the ``_clustered`` marker
(its sidecar verdict is partial); unlogged checkpoints refuse as_of;
history is exposed as a DataFrame.
"""

import os

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import ensure_token_table
from wills_columnar_format_spark.engine import (
    checkpoint_history,
    decode_checkpoint,
    delete_keys_checkpoint,
    encode_table,
    read_commit_log,
    upsert_checkpoint,
    write_checkpoint,
)

N = 2_000


@pytest.fixture(scope="module")
def token_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok_tt") / "t")
    ensure_token_table(path, N, seed=21)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def ids(token_df):
    return sorted(r["doc_id"] for r in token_df.select("doc_id").collect())


@pytest.fixture(scope="module")
def ckpt(spark, token_df, ids, tmp_path_factory):
    """Checkpoint with three commits: create -> delete 200 -> upsert 100."""
    path = str(tmp_path_factory.mktemp("ckpt_tt") / "m")
    m = encode_table(token_df, key_col="doc_id", num_partitions=4,
                     chunk_rows=256)
    write_checkpoint(m, path, schema=token_df.schema)
    delete_keys_checkpoint(spark, path, ids[:200], "doc_id")
    up = (token_df.filter(F.col("doc_id").isin(ids[500:600]))
          .withColumn("n_tok", F.lit(777)))
    upsert_checkpoint(spark, path, up, "doc_id", num_partitions=2)
    return path


def test_history(spark, ckpt):
    h = checkpoint_history(spark, ckpt).orderBy("seq").collect()
    assert [(r["seq"], r["action"]) for r in h] == \
        [(0, "create"), (1, "delete"), (2, "upsert")]
    assert all(r["n_files"] > 0 for r in h)


def test_snapshot_create_equals_original(spark, token_df, ckpt):
    s0 = decode_checkpoint(spark, ckpt, as_of=0)
    assert s0.count() == N
    assert s0.exceptAll(token_df).count() == 0


def test_snapshot_after_delete(spark, token_df, ids, ckpt):
    s1 = decode_checkpoint(spark, ckpt, as_of=1)
    assert s1.count() == N - 200
    assert s1.filter(F.col("doc_id").isin(ids[:200])).count() == 0
    # the upsert is invisible at this snapshot
    assert s1.filter(F.col("n_tok") == 777).count() == 0


def test_snapshot_after_upsert_equals_current(spark, ids, ckpt):
    s2 = decode_checkpoint(spark, ckpt, as_of=2)
    cur = decode_checkpoint(spark, ckpt)
    assert s2.count() == cur.count() == N - 200
    assert s2.exceptAll(cur).count() == 0
    got = s2.filter(F.col("doc_id").isin(ids[500:600])) \
            .agg(F.min("n_tok"), F.max("n_tok")).first()
    assert got == (777, 777)


def test_snapshot_composes_with_pruning(spark, ids, ckpt):
    pl = decode_checkpoint(spark, ckpt, as_of=0,
                           keys=[ids[10], ids[50]], key_col="doc_id")
    assert sorted(r["doc_id"] for r in pl.collect()) == \
        sorted([ids[10], ids[50]])
    proj = decode_checkpoint(spark, ckpt, as_of=1, columns=["doc_id"])
    assert proj.columns == ["doc_id"] and proj.count() == N - 200
    vr = decode_checkpoint(spark, ckpt, as_of=0,
                           value_range=("n_tok", 10, 40))
    assert vr.filter(~F.col("n_tok").between(10, 40)).count() == 0


def test_snapshot_zero_exchange_and_no_marker_write(spark, ckpt):
    marker = os.path.join(ckpt, "_clustered")
    if os.path.exists(marker):
        os.remove(marker)
    s0 = decode_checkpoint(spark, ckpt, as_of=0)
    plan = s0._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    s0.count()
    # an as_of read must not certify the (partial) sidecar verdict
    assert not os.path.exists(marker)


def test_bad_seq_raises(spark, ckpt):
    with pytest.raises(ValueError, match="not a commit"):
        decode_checkpoint(spark, ckpt, as_of=99)


def test_unlogged_checkpoint_refuses_as_of(spark, token_df, tmp_path):
    path = str(tmp_path / "m")
    encode_table(token_df, key_col="doc_id",
                 num_partitions=2).write.parquet(path)
    assert read_commit_log(path) is None
    with pytest.raises(ValueError, match="_commits"):
        decode_checkpoint(spark, path, token_df.schema, as_of=0)


def test_compact_starts_fresh_log(spark, token_df, ckpt, tmp_path):
    from wills_columnar_format_spark.engine import compact_checkpoint

    dst = str(tmp_path / "c")
    compact_checkpoint(spark, ckpt, dst)
    log = read_commit_log(dst)
    assert [(r["seq"], r["action"]) for r in log] == [(0, "compact")]
    s0 = decode_checkpoint(spark, dst, as_of=0)
    cur = decode_checkpoint(spark, ckpt)
    assert s0.count() == cur.count()
    assert s0.exceptAll(cur).count() == 0


def test_append_mode_logs_commit(spark, token_df, tmp_path):
    path = str(tmp_path / "m")
    half = token_df.filter(F.col("n_tok") % 2 == 0)
    rest = token_df.filter(F.col("n_tok") % 2 == 1)
    write_checkpoint(
        encode_table(half, key_col="doc_id", num_partitions=2),
        path, schema=token_df.schema)
    write_checkpoint(
        encode_table(rest, key_col="doc_id", num_partitions=2),
        path, mode="append")
    log = read_commit_log(path)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "append")]
    s0 = decode_checkpoint(spark, path, as_of=0)
    assert s0.count() == half.count()
    s1 = decode_checkpoint(spark, path, as_of=1)
    assert s1.count() == N
