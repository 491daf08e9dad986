"""CLONE a checkpoint (``clone_checkpoint``).

Hard-link (local) / stream-copy clone of the current snapshot with an
independent commit log. Pins: clone decodes identical to the source;
mutations on either side never leak to the other — including an
in-place optimize VACUUM on the source (link semantics: deleting one
name never reclaims a still-linked inode); the clone starts history
at its own create commit; refusals (empty source, non-empty dest,
pending mutation).
"""

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.engine import (
    clone_checkpoint,
    decode_checkpoint,
    delete_keys_checkpoint,
    encode_table,
    optimize_checkpoint,
    read_commit_log,
    write_checkpoint,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"src{i % 5}", (i * 7) % 500) for i in range(400)],
        "doc_id long, source string, n_chars long",
    )


def test_clone_decodes_identical_and_isolates(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        src, schema=docs.schema)
    assert clone_checkpoint(spark, src, dst) == dst
    got = decode_checkpoint(spark, dst)
    assert got.count() == 400
    assert got.exceptAll(docs).count() == 0
    log = read_commit_log(dst)
    assert [(r["seq"], r["action"]) for r in log] == [(0, "clone")]
    assert log[0]["generation"].startswith("clone:")
    # mutate the CLONE: source untouched
    delete_keys_checkpoint(spark, dst, [1, 2, 3], "doc_id")
    assert decode_checkpoint(spark, dst).count() == 397
    assert decode_checkpoint(spark, src).count() == 400
    # mutate the SOURCE: clone untouched
    delete_keys_checkpoint(spark, src, list(range(100)), "doc_id")
    assert decode_checkpoint(spark, src).count() == 300
    assert decode_checkpoint(spark, dst).count() == 397


def test_clone_survives_source_vacuum(spark, docs, tmp_path):
    """optimize_checkpoint on the source physically DELETES its old
    file names; the clone's hard links must keep reading."""
    src = str(tmp_path / "s")
    dst = str(tmp_path / "d")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        src, schema=docs.schema)
    clone_checkpoint(spark, src, dst)
    optimize_checkpoint(spark, src, key_col="doc_id")
    assert decode_checkpoint(spark, src).count() == 400
    got = decode_checkpoint(spark, dst)  # clone reads its own links
    assert got.count() == 400
    assert got.exceptAll(docs).count() == 0


def test_clone_of_mutated_source_feed_barrier(spark, docs, tmp_path):
    """A clone of a MUTATED source carries mask sidecars in its seq-0
    snapshot: the change feed must refuse that window (decoding the
    files as inserts would resurrect deleted rows — review finding),
    while live decode, time travel, and post-clone windows all work."""
    from wills_columnar_format_spark.engine import read_changes

    src = str(tmp_path / "ms")
    dst = str(tmp_path / "md")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=2,
                     chunk_rows=64),
        src, schema=docs.schema)
    delete_keys_checkpoint(spark, src, list(range(50)), "doc_id")
    clone_checkpoint(spark, src, dst)
    live = decode_checkpoint(spark, dst)
    assert live.count() == 350  # masks ride the clone
    assert decode_checkpoint(spark, dst, as_of=0).count() == 350
    with pytest.raises(ValueError, match="clone SNAPSHOT"):
        read_changes(spark, dst, since=-1, key_col="doc_id")
    # mutations AFTER the clone attribute normally
    delete_keys_checkpoint(spark, dst, [100], "doc_id")
    feed = read_changes(spark, dst, since=0, key_col="doc_id")
    assert feed.count() == 1
    assert feed.first()["_change_type"] == "delete"


def test_clone_refusals(spark, docs, tmp_path):
    src = str(tmp_path / "a")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=1),
        src, schema=docs.schema)
    dst = str(tmp_path / "b")
    clone_checkpoint(spark, src, dst)
    with pytest.raises(ValueError, match="not empty"):
        clone_checkpoint(spark, src, dst)
    with pytest.raises(ValueError, match="no data files"):
        clone_checkpoint(spark, str(tmp_path / "nope"),
                         str(tmp_path / "c"))


def test_clone_failure_cleans_partial_destination(
        spark, docs, tmp_path, monkeypatch):
    """A source file vanishing mid-clone (concurrent restore/optimize)
    must clean up the partial destination so a retry isn't blocked by
    the non-empty check (review finding, round 4)."""
    import os

    from wills_columnar_format_spark import engine

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4),
        src, schema=docs.schema)
    files = engine._list_data_files(src)
    assert len(files) > 1
    victim = files[-1]
    real_link = os.link
    state = {"n": 0}

    def link_with_vanish(a, b):
        state["n"] += 1
        if state["n"] == 2:  # after the first file landed
            os.remove(os.path.join(src, victim))
        return real_link(a, b)

    monkeypatch.setattr(os, "link", link_with_vanish)
    with pytest.raises(IOError, match="mid-clone"):
        clone_checkpoint(spark, src, dst)
    monkeypatch.undo()
    assert engine._list_data_files(dst) == []  # partial dst cleaned

    # heal the source and retry into the same dst
    write_checkpoint(
        encode_table(docs, key_col="doc_id", num_partitions=4),
        src + "2", schema=docs.schema)
    clone_checkpoint(spark, src + "2", dst)
    assert decode_checkpoint(spark, dst).count() == docs.count()
