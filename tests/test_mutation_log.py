"""Commit-log hardening: crash brackets for logged mutations, torn
records, and log seeding for append-onto-unlogged checkpoints.

Logged delete/upsert are TWO appends (data files, then the commit
record); a crash between them would leave time-travel snapshots
silently missing the mutation forever. The ``_mutation_pending``
marker brackets that window: every read/mutate path refuses a marked
dir and ``finish_mutation`` reconciles from the marker's pre-mutation
file listing. Commit records land via temp+rename, so an unparseable
record means external damage and raises a NAMED error instead of
silently truncating history.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark import engine
from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    delete_keys_checkpoint,
    encode_table,
    finish_mutation,
    read_commit_log,
    upsert_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", f"text {i}", i % 97) for i in range(400)],
        "doc_id long, source string, text string, n_chars long",
    )


def _logged_ckpt(spark, docs, tmp_path):
    ckpt = str(tmp_path / "m")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4,
                     chunk_rows=64),
        ckpt, schema=docs.schema)
    return ckpt


def _crash_after_data_append(monkeypatch):
    """Simulate a crash in the window between the mutation's data-file
    append and its commit-record append: the marker is written, the
    data lands, the commit record never does."""
    monkeypatch.setattr(engine, "_end_logged_mutation",
                        lambda *a, **k: None)


def test_interrupted_delete_blocks_then_finishes(
        spark, docs, tmp_path, monkeypatch):
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    _crash_after_data_append(monkeypatch)
    delete_keys_checkpoint(spark, ckpt, list(range(0, 40)), "doc_id")
    monkeypatch.undo()

    # marker present: live files hold the sidecars, the log does not
    assert engine._read_mutation_pending(ckpt) is not None
    assert len(read_commit_log(ckpt)) == 1
    for blocked in (
        lambda: decode_checkpoint(spark, ckpt),
        lambda: delete_keys_checkpoint(spark, ckpt, [1], "doc_id"),
        lambda: upsert_checkpoint(
            spark, ckpt, docs.limit(1), "doc_id", num_partitions=1),
    ):
        with pytest.raises(IOError, match="finish_mutation"):
            blocked()

    assert finish_mutation(ckpt) == "delete"
    assert engine._read_mutation_pending(ckpt) is None
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete")]
    live = decode_checkpoint(spark, ckpt)
    assert live.count() == 360
    snap = decode_checkpoint(spark, ckpt, as_of=1)
    assert snap.count() == 360  # snapshot == live again


def test_interrupted_upsert_full_append_records_upsert(
        spark, docs, tmp_path, monkeypatch):
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    batch = docs.filter(F.col("doc_id") < 30).withColumn(
        "n_chars", F.lit(-1))
    _crash_after_data_append(monkeypatch)
    upsert_checkpoint(spark, ckpt, batch, "doc_id", num_partitions=2)
    monkeypatch.undo()

    assert engine._read_mutation_pending(ckpt) is not None
    assert finish_mutation(ckpt) == "upsert"
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "upsert")]
    live = decode_checkpoint(spark, ckpt)
    assert live.count() == 400
    assert live.filter(F.col("n_chars") == -1).count() == 30
    snap = decode_checkpoint(spark, ckpt, as_of=1)
    assert snap.exceptAll(live).count() == 0


def test_interrupted_upsert_sidecars_only_records_delete(
        spark, docs, tmp_path):
    """Upsert is sidecars-then-new-generation; when only the sidecars
    landed, the rows are physically GONE from live reads, so
    reconciliation must record the delete it physically is."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    keys = list(range(0, 30))
    before = engine._list_data_files(ckpt)
    gen = engine._deletes_generation(
        list(dict.fromkeys(engine._canon_temporal_keys(keys))))
    assert engine._begin_logged_mutation(ckpt, "upsert", gen, before)
    delete_keys_checkpoint(spark, ckpt, keys, "doc_id", _log=False)

    assert finish_mutation(ckpt) == "delete"
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete")]
    assert decode_checkpoint(spark, ckpt).count() == 370
    assert decode_checkpoint(spark, ckpt, as_of=1).count() == 370


def test_commit_record_write_failure_keeps_marker(
        spark, docs, tmp_path, monkeypatch):
    """A mutation whose data files landed but whose COMMIT RECORD could
    not be written (_append_commit swallows storage errors into None)
    must raise and KEEP the marker — deleting it would leave the files
    permanently unrecorded and every snapshot/CDF consumer silently
    diverged from live reads (review finding, round 4)."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    monkeypatch.setattr(engine, "_append_commit", lambda *a, **k: None)
    with pytest.raises(IOError, match="finish_mutation"):
        delete_keys_checkpoint(spark, ckpt, list(range(0, 40)), "doc_id")
    monkeypatch.undo()

    # the window is still open: marker present, readers refuse
    assert engine._read_mutation_pending(ckpt) is not None
    with pytest.raises(IOError, match="finish_mutation"):
        decode_checkpoint(spark, ckpt)
    # storage healed: reconciliation records the delete exactly once
    assert finish_mutation(ckpt) == "delete"
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete")]
    assert decode_checkpoint(spark, ckpt).count() == 360


def test_finish_mutation_commit_failure_keeps_marker(
        spark, docs, tmp_path, monkeypatch):
    """finish_mutation itself hitting the commit-record failure must
    also keep the marker so it can be retried."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    before = engine._list_data_files(ckpt)
    assert engine._begin_logged_mutation(ckpt, "delete", "g", before)
    delete_keys_checkpoint(spark, ckpt, [0, 1], "doc_id", _log=False)
    monkeypatch.setattr(engine, "_append_commit", lambda *a, **k: None)
    with pytest.raises(IOError, match="finish_mutation"):
        finish_mutation(ckpt)
    monkeypatch.undo()
    assert engine._read_mutation_pending(ckpt) is not None
    assert finish_mutation(ckpt) == "delete"
    assert engine._read_mutation_pending(ckpt) is None


def test_finish_mutation_nothing_landed(spark, docs, tmp_path):
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    before = engine._list_data_files(ckpt)
    assert engine._begin_logged_mutation(ckpt, "delete", "g", before)
    assert finish_mutation(ckpt) == ""
    assert len(read_commit_log(ckpt)) == 1  # no phantom commit
    assert engine._read_mutation_pending(ckpt) is None


def test_finish_mutation_without_marker_raises(spark, docs, tmp_path):
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    with pytest.raises(ValueError, match="_mutation_pending"):
        finish_mutation(ckpt)


def test_unlogged_checkpoint_skips_bracket(spark, docs, tmp_path,
                                           monkeypatch):
    """No commit log -> no snapshot model to protect: mutations on a
    plain-parquet checkpoint never write the marker."""
    ckpt = str(tmp_path / "u")
    encode_table(docs, key_col="doc_id",
                 num_partitions=2).write.parquet(ckpt)
    delete_keys_checkpoint(spark, ckpt, [1, 2, 3], "doc_id")
    assert engine._read_mutation_pending(ckpt) is None
    assert read_commit_log(ckpt) is None
    assert decode_checkpoint(spark, ckpt, docs.schema).count() == 397


def test_append_onto_unlogged_seeds_create(spark, docs, tmp_path):
    """write_checkpoint(mode='append') onto a plain df.write.parquet
    checkpoint seeds commit 0 with the PRE-append listing, else every
    time-travel read would silently drop the base table."""
    ckpt = str(tmp_path / "s")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    encode_table(half, key_col="doc_id",
                 num_partitions=2).write.parquet(ckpt)
    assert read_commit_log(ckpt) is None
    write_checkpoint(
        encode_table(rest, key_col="doc_id", num_partitions=2),
        ckpt, mode="append", schema=docs.schema)
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "append")]
    assert decode_checkpoint(spark, ckpt, as_of=0).count() == half.count()
    assert decode_checkpoint(spark, ckpt, as_of=1).count() == 400


def test_torn_commit_record_raises_named(spark, docs, tmp_path):
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    cpath = os.path.join(ckpt, "_commits", "000000.json")
    with open(cpath, "w") as f:
        f.write('{"seq": 0, "action": "crea')  # externally damaged
    with pytest.raises(IOError, match="commit log is damaged"):
        read_commit_log(ckpt)


def test_commit_seq_from_listing(spark, docs, tmp_path):
    """Next-seq derivation reads the _commits/ listing, not file
    contents — and keeps counting past the highest seq present."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    assert engine._commit_log_seqs(ckpt) == [0]
    # drop a foreign high-seq record; the next commit must go above it
    rec = {"seq": 7, "action": "append", "generation": "", "files": []}
    with open(os.path.join(ckpt, "_commits", "000007.json"), "w") as f:
        json.dump(rec, f)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    assert engine._commit_log_seqs(ckpt) == [0, 7, 8]


def test_gapped_commit_log_refused(spark, docs, tmp_path):
    """A commit record deleted externally must raise a NAMED error —
    silently skipping it would drop that commit's files from every
    later snapshot."""
    import os

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [1, 2], "doc_id")
    delete_keys_checkpoint(spark, ckpt, [3], "doc_id")
    os.remove(os.path.join(ckpt, "_commits", "000001.json"))
    with pytest.raises(IOError, match="gapped|missing"):
        read_commit_log(ckpt)
    with pytest.raises(IOError, match="gapped|missing"):
        decode_checkpoint(spark, ckpt, as_of=0).count()


def test_rollup_commit_log_roundtrip(spark, docs, tmp_path):
    """rollup_commit_log bundles the 0..head records into one file and
    prunes the per-commit files; history, time travel, and subsequent
    mutations (which must claim seqs ABOVE the rollup) are unchanged."""
    from wills_columnar_format_spark.engine import (
        decode_checkpoint as dc,
        rollup_commit_log,
    )

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0, 1], "doc_id")
    delete_keys_checkpoint(spark, ckpt, [2], "doc_id")
    before = read_commit_log(ckpt)
    assert [r["seq"] for r in before] == [0, 1, 2]

    assert rollup_commit_log(ckpt) == 2
    names = sorted(os.listdir(os.path.join(ckpt, "_commits")))
    assert names == ["rollup-000002.json"]  # singles pruned
    assert read_commit_log(ckpt) == before  # verbatim history
    assert engine._commit_log_seqs(ckpt) == [0, 1, 2]

    # mutations continue above the rollup and read back combined
    delete_keys_checkpoint(spark, ckpt, [3], "doc_id")
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete"), (2, "delete"), (3, "delete")]
    assert dc(spark, ckpt).count() == 396
    assert dc(spark, ckpt, as_of=1).count() == 398  # time travel intact

    # a second rollup supersedes the first
    assert rollup_commit_log(ckpt) == 3
    names = sorted(os.listdir(os.path.join(ckpt, "_commits")))
    assert names == ["rollup-000003.json"]
    assert dc(spark, ckpt, as_of=2).count() == 397


def test_rollup_gap_detection_survives(spark, docs, tmp_path):
    """Deleting a post-rollup record still raises the gapped error;
    deleting the rollup itself (the whole 0..N prefix) is also caught."""
    from wills_columnar_format_spark.engine import rollup_commit_log

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    rollup_commit_log(ckpt)
    delete_keys_checkpoint(spark, ckpt, [1], "doc_id")
    delete_keys_checkpoint(spark, ckpt, [2], "doc_id")
    cdir = os.path.join(ckpt, "_commits")
    os.remove(os.path.join(cdir, "000002.json"))
    with pytest.raises(IOError, match="gapped|missing"):
        read_commit_log(ckpt)


def test_rollup_interacts_with_restore_changes_clone(
        spark, docs, tmp_path):
    """Cross-feature: a pruned rollup is the ONLY carrier of early
    history, and restore / change feed / clone must keep working from
    it — restore rolls back to a commit whose record lives in the
    rollup, the feed replays a fully rolled-up window, and a clone of
    a rolled-up source starts an independent log."""
    from wills_columnar_format_spark.engine import (
        clone_checkpoint,
        read_changes,
        restore_checkpoint,
        rollup_commit_log,
    )

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0, 1], "doc_id")
    delete_keys_checkpoint(spark, ckpt, [2], "doc_id")
    feed_before = sorted(
        (r["_commit_seq"], r["_change_type"], r["doc_id"])
        for r in read_changes(spark, ckpt, since=0, until=2,
                              key_col="doc_id").collect())
    assert rollup_commit_log(ckpt) == 2  # prunes 000000..000002.json

    # change feed replays the rolled-up window identically
    feed_after = sorted(
        (r["_commit_seq"], r["_change_type"], r["doc_id"])
        for r in read_changes(spark, ckpt, since=0, until=2,
                              key_col="doc_id").collect())
    assert feed_after == feed_before
    assert [t[2] for t in feed_after] == [0, 1, 2]

    # clone of a rolled-up source: independent log, same rows
    clone = str(tmp_path / "clone")
    clone_checkpoint(spark, ckpt, clone)
    clog = read_commit_log(clone)
    assert [(r["seq"], r["action"]) for r in clog] == [(0, "clone")]
    assert decode_checkpoint(spark, clone).count() == 397

    # restore to a commit whose record lives ONLY in the rollup
    seq = restore_checkpoint(spark, ckpt, as_of=1)
    assert decode_checkpoint(spark, ckpt).count() == 398
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete"), (2, "delete"), (3, "restore")]
    with pytest.raises(ValueError, match="rolled back"):
        decode_checkpoint(spark, ckpt, as_of=2).count()

    # a second rollup covers the restore commit; history still reads
    assert rollup_commit_log(ckpt) == seq
    assert [(r["seq"], r["action"]) for r in read_commit_log(ckpt)] == \
        [(0, "create"), (1, "delete"), (2, "delete"), (3, "restore")]
    assert decode_checkpoint(spark, ckpt, as_of=1).count() == 398
    # the clone never saw any of it
    assert decode_checkpoint(spark, clone).count() == 397


def test_read_retries_past_concurrent_prune(
        spark, docs, tmp_path, monkeypatch):
    """A listed commit file that vanishes before its get (a concurrent
    rollup prune swept it) makes the reader re-list instead of
    surfacing a raw FileNotFoundError; a log that keeps vanishing is
    reported as a racing prune loop."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    expect = read_commit_log(ckpt)

    real = engine._read_commit_log_once
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise FileNotFoundError("swept by a concurrent prune")
        return real(d)

    monkeypatch.setattr(engine, "_read_commit_log_once", flaky)
    assert read_commit_log(ckpt) == expect
    assert calls["n"] == 3

    monkeypatch.setattr(
        engine, "_read_commit_log_once",
        lambda d: (_ for _ in ()).throw(FileNotFoundError("always")))
    with pytest.raises(IOError, match="kept changing"):
        read_commit_log(ckpt)


def test_read_retries_transient_gap(spark, docs, tmp_path, monkeypatch):
    """An apparent gap from ONE listing is retried (a listing that
    straddles the rollup rename + prune can miss both the rollup and
    the pruned singles); only a gap stable across fresh listings
    raises — the persistent case is pinned by
    test_gapped_commit_log_refused / test_rollup_gap_detection_survives."""
    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    expect = read_commit_log(ckpt)

    real = engine._read_commit_log_once
    calls = {"n": 0}

    def flaky(d):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise engine._CommitLogGap("transient straddled listing")
        return real(d)

    monkeypatch.setattr(engine, "_read_commit_log_once", flaky)
    assert read_commit_log(ckpt) == expect
    assert calls["n"] == 3


def test_append_retracts_rollup_shadowed_claim(
        spark, docs, tmp_path, monkeypatch):
    """A writer whose claim listing missed a fresh rollup AND its
    pruned singles would claim a PRUNED seq (the exclusive create
    succeeds on the deleted name) and the record would be invisible
    behind the rollup forever. The post-publish verify must catch the
    shadow, retract the claim, and re-claim above the rollup."""
    from wills_columnar_format_spark.engine import rollup_commit_log

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    delete_keys_checkpoint(spark, ckpt, [1], "doc_id")
    assert rollup_commit_log(ckpt) == 2  # prunes 000000..000002.json

    real = engine._commit_log_seqs
    calls = {"n": 0}

    def stale_once(d):
        calls["n"] += 1
        return [] if calls["n"] == 1 else real(d)

    monkeypatch.setattr(engine, "_commit_log_seqs", stale_once)
    seq = engine._append_commit(ckpt, "delete", "g-test", ["x.parquet"])
    assert seq == 3  # NOT 0: the shadowed claim was retracted
    assert calls["n"] >= 2
    cdir = os.path.join(ckpt, "_commits")
    assert not os.path.exists(os.path.join(cdir, "000000.json"))
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete"), (2, "delete"), (3, "delete")]
    assert log[-1]["files"] == ["x.parquet"]


def test_vacuum_orphans_sweeps_stale_transients_only(
        spark, docs, tmp_path):
    """vacuum_orphans deletes age-gated crashed-writer leftovers
    (_staging_* dirs, *.tmp publish files) and NOTHING else: fresh
    stages survive, an optimize-owned _staging_optimize survives, and
    data/markers/commit records are untouched."""
    import time

    from wills_columnar_format_spark.engine import vacuum_orphans

    ckpt = _logged_ckpt(spark, docs, tmp_path)
    delete_keys_checkpoint(spark, ckpt, [0], "doc_id")
    old_ts = time.time() - 7200

    stale = os.path.join(ckpt, "_staging_deadbeef")
    os.makedirs(stale)
    os.utime(stale, (old_ts, old_ts))
    fresh = os.path.join(ckpt, "_staging_cafe")
    os.makedirs(fresh)
    tmp1 = os.path.join(ckpt, "_sync_state.json.tmp")
    open(tmp1, "w").write("{}")
    os.utime(tmp1, (old_ts, old_ts))
    tmp2 = os.path.join(ckpt, "_commits", "000009.json.abc.tmp")
    open(tmp2, "w").write("{}")
    os.utime(tmp2, (old_ts, old_ts))
    opt_stage = os.path.join(ckpt, "_staging_optimize")
    os.makedirs(opt_stage)
    os.utime(opt_stage, (old_ts, old_ts))
    with open(os.path.join(ckpt, "_optimize_pending"), "w") as f:
        json.dump({"old": [], "new": []}, f)

    before_data = engine._list_data_files(ckpt)
    deleted = vacuum_orphans(ckpt, older_than_seconds=3600)
    assert sorted(os.path.basename(d) for d in deleted) == \
        ["000009.json.abc.tmp", "_staging_deadbeef",
         "_sync_state.json.tmp"]
    assert os.path.isdir(fresh)          # age gate
    assert os.path.isdir(opt_stage)      # optimize owns it
    assert engine._list_data_files(ckpt) == before_data
    assert len(read_commit_log(ckpt)) == 2

    # marker cleared -> an old optimize stage is sweepable
    os.remove(os.path.join(ckpt, "_optimize_pending"))
    deleted = vacuum_orphans(ckpt, older_than_seconds=3600)
    assert [os.path.basename(d) for d in deleted] == ["_staging_optimize"]
