"""RESTORE to a snapshot (``restore_checkpoint``).

Mutations only ever append files, so a rollback is deleting the files
later commits added + one ``restore`` commit. Pins: live state equals
the target snapshot after rolling back a delete and an upsert; time
travel to <= target and >= restore works while rolled-back snapshots
raise the "rolled back" error; the change feed refuses windows
crossing a restore; crash inside the window rolls FORWARD via
finish_mutation; refusals (head no-op, drop_column in the window,
unlogged checkpoints).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    decode_checkpoint,
    delete_keys_checkpoint,
    drop_column_checkpoint,
    encode_table,
    finish_mutation,
    read_changes,
    read_commit_log,
    restore_checkpoint,
    upsert_checkpoint,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", (i * 7) % 500) for i in range(400)],
        "doc_id long, source string, n_chars long",
    )


def _mutated_ckpt(spark, docs, path):
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        path, schema=docs.schema)                        # commit 0
    delete_keys_checkpoint(spark, path, [1, 2, 3], "doc_id")  # commit 1
    batch = docs.filter("doc_id < 10").withColumn(
        "source", F.lit("patched"))
    upsert_checkpoint(spark, path, batch, "doc_id")      # commit 2
    return path


def test_restore_rolls_back_mutations(spark, docs, tmp_path):
    ckpt = _mutated_ckpt(spark, docs, str(tmp_path / "r"))
    assert decode_checkpoint(spark, ckpt).count() == 400  # upsert re-added
    seq = restore_checkpoint(spark, ckpt, 0)
    assert seq == 3
    live = decode_checkpoint(spark, ckpt)
    assert live.count() == 400
    assert live.exceptAll(docs).count() == 0  # pristine: no patched rows
    assert live.filter("source = 'patched'").count() == 0
    log = read_commit_log(ckpt)
    assert [(r["seq"], r["action"]) for r in log] == \
        [(0, "create"), (1, "delete"), (2, "upsert"), (3, "restore")]
    # time travel: target and restore snapshots read; inside raises
    assert decode_checkpoint(spark, ckpt, as_of=0).count() == 400
    assert decode_checkpoint(spark, ckpt, as_of=3).count() == 400
    with pytest.raises(ValueError, match="rolled back"):
        decode_checkpoint(spark, ckpt, as_of=1)
    # head no-op: nothing logged
    assert restore_checkpoint(spark, ckpt, 3) == 3
    assert len(read_commit_log(ckpt)) == 4


def test_change_feed_refuses_restore_window(spark, docs, tmp_path):
    ckpt = _mutated_ckpt(spark, docs, str(tmp_path / "c"))
    restore_checkpoint(spark, ckpt, 0)
    with pytest.raises(ValueError, match="resync"):
        read_changes(spark, ckpt, since=0, key_col="doc_id")
    # a post-restore window is clean
    assert read_changes(spark, ckpt, since=3, key_col="doc_id").count() == 0


def test_restore_crash_rolls_forward(spark, docs, tmp_path):
    """Simulate a crash mid-restore: marker present, victims partially
    deleted — reads refuse, finish_mutation completes the restore."""
    import json
    import os

    ckpt = _mutated_ckpt(spark, docs, str(tmp_path / "x"))
    from wills_columnar_format_spark.engine import (
        _files_as_of,
        _list_data_files,
    )

    live = _list_data_files(ckpt)
    allowed = _files_as_of(ckpt, 0)
    victims = sorted(set(live) - set(allowed))
    assert victims
    with open(os.path.join(ckpt, "_mutation_pending"), "w") as f:
        json.dump({"action": "restore", "generation": "0",
                   "before": live, "victims": victims,
                   "restore_files": sorted(allowed)}, f)
    os.remove(os.path.join(ckpt, victims[0]))  # partial crash state
    with pytest.raises(IOError, match="interrupted"):
        decode_checkpoint(spark, ckpt)
    assert finish_mutation(ckpt) == "restore"
    live_df = decode_checkpoint(spark, ckpt)
    assert live_df.count() == 400
    assert live_df.exceptAll(docs).count() == 0
    assert read_commit_log(ckpt)[-1]["action"] == "restore"


def test_finish_after_commit_landed_appends_nothing(spark, docs,
                                                    tmp_path):
    """Crash AFTER the restore commit landed but BEFORE the marker was
    removed: finish_mutation must NOT append a duplicate restore commit
    (the duplicate would mark the first one's snapshot 'rolled back' —
    review finding)."""
    import json
    import os

    ckpt = _mutated_ckpt(spark, docs, str(tmp_path / "z"))
    from wills_columnar_format_spark.engine import (
        _files_as_of,
        _list_data_files,
    )

    seq = restore_checkpoint(spark, ckpt, 0)  # commit 3, clean
    live = _list_data_files(ckpt)
    with open(os.path.join(ckpt, "_mutation_pending"), "w") as f:
        json.dump({"action": "restore", "generation": "0",
                   "before": live, "victims": [],
                   "restore_files": sorted(_files_as_of(ckpt, 0))}, f)
    assert finish_mutation(ckpt) == "restore"
    log = read_commit_log(ckpt)
    assert [r["seq"] for r in log] == [0, 1, 2, 3]  # no duplicate
    assert decode_checkpoint(spark, ckpt, as_of=seq).count() == 400


def test_restore_refuses_drop_window(spark, docs, tmp_path):
    ckpt = str(tmp_path / "d")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=1),
        ckpt, schema=docs.schema)
    drop_column_checkpoint(spark, ckpt, "source")
    with pytest.raises(ValueError, match="cannot be widened"):
        restore_checkpoint(spark, ckpt, 0)
