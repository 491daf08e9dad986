"""Incremental streaming encode: drain-encode-append as files land."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from wills_columnar_format_spark.data import write_token_table
from wills_columnar_format_spark.engine import decode_table
from wills_columnar_format_spark.streaming import encode_stream, read_manifest


@pytest.fixture()
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return str(root / "in"), str(root / "manifest")


def _land_files(in_dir: str, stage_dir: str, names) -> None:
    os.makedirs(in_dir, exist_ok=True)
    for n in names:
        shutil.copy(os.path.join(stage_dir, n), os.path.join(in_dir, n))


def test_streaming_incremental_encode(spark, dirs, tmp_path_factory):
    in_dir, manifest_dir = dirs
    stage = str(tmp_path_factory.mktemp("stage") / "tok")
    write_token_table(stage, 6_000, rows_per_file=2_000)  # 3 files
    files = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    assert len(files) == 3

    schema = spark.read.parquet(stage).schema

    # wave 1: two files land; drain
    _land_files(in_dir, stage, files[:2])
    q = encode_stream(spark, in_dir, manifest_dir, schema, num_partitions=4, chunk_rows=1024)
    q.awaitTermination(120)
    m1 = read_manifest(spark, manifest_dir)
    n1_chunks = m1.count()
    n1_values = m1.filter(F.col("column") == "doc_id").agg(F.sum("n_values")).collect()[0][0]
    assert n1_values == 4_000

    # wave 2: third file lands; drain again — only NEW data is encoded
    _land_files(in_dir, stage, files[2:])
    q = encode_stream(spark, in_dir, manifest_dir, schema, num_partitions=4, chunk_rows=1024)
    q.awaitTermination(120)
    m2 = read_manifest(spark, manifest_dir)
    assert m2.count() > n1_chunks
    n2_values = m2.filter(F.col("column") == "doc_id").agg(F.sum("n_values")).collect()[0][0]
    assert n2_values == 6_000

    # decoded union equals the full input table per row
    orig = spark.read.parquet(stage)
    dec = decode_table(m2, orig.schema)
    assert dec.count() == 6_000
    bad = (
        dec.alias("d").join(orig.alias("o"), "doc_id")
        .filter(
            ~(
                (F.col("d.tokens") == F.col("o.tokens"))
                & (F.col("d.n_tok") == F.col("o.n_tok"))
                & (F.col("d.source") == F.col("o.source"))
            )
        )
        .count()
    )
    assert bad == 0


def test_windowed_event_counts_equals_batch(spark, tmp_path_factory):
    """The streaming tumbling-window aggregation (watermark + window +
    stateful count, drained with availableNow) must equal the batch
    GROUP BY hour over the same static input."""
    from pyspark.sql import functions as F

    from wills_columnar_format_spark.streaming import windowed_event_counts

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path_factory.mktemp("win_in") / "events")
    df.repartition(3).write.parquet(in_dir)
    got = {
        (r.window_start, r.n)
        for r in windowed_event_counts(
            spark, in_dir, df.schema, ts_col="ts",
            query_name="wcfs_win_test",
        ).collect()
    }
    exp = {
        (r.h, r.n)
        for r in df.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n")).collect()
    }
    assert got == exp and len(got) > 0


def test_windowed_append_evicts_and_drops_late(spark, tmp_path_factory):
    """The production append-mode config: windows emit to the durable
    parquet sink exactly when the watermark passes their end (and are
    then EVICTED from state), rows later than the watermark are DROPPED
    rather than reopening finalized windows, and state stays bounded by
    the number of open windows — the three properties that make the
    aggregation runnable forever at 100 TB."""
    from datetime import datetime

    from wills_columnar_format_spark.streaming import windowed_event_counts_append

    work = tmp_path_factory.mktemp("win_append")
    in_dir, sink = str(work / "in"), str(work / "sink")
    os.makedirs(in_dir)

    def land(name, hours):
        spark.createDataFrame(
            [(i, datetime(2024, 1, 1, h, 30)) for i, h in enumerate(hours)],
            "event_id bigint, ts timestamp_ntz",
        ).coalesce(1).write.mode("append").parquet(in_dir)

    schema = "event_id bigint, ts timestamp_ntz"
    from pyspark.sql.types import _parse_datatype_string

    sch = _parse_datatype_string(schema)

    # drain 1: events in hours 0..5; watermark ends at max(ts)-1h =
    # 04:30, so windows [0,1) .. [3,4) finalize; [4,5) and [5,6) stay
    # open (absent from the sink)
    land("a", [0, 0, 1, 2, 3, 4, 5])
    q = windowed_event_counts_append(spark, in_dir, sink, sch, ts_col="ts",
                                     window="1 hour", watermark="1 hour")
    q.awaitTermination()
    got1 = {
        (r.window_start.hour, r.n)
        for r in spark.read.parquet(sink).collect()
    }
    assert got1 == {(0, 2), (1, 1), (2, 1), (3, 1)}

    # drain 2: one LATE row (hour 0 — its window already finalized) and
    # one new row at hour 7. The late row must be dropped: window [0,1)
    # must NOT re-emit or change. Watermark advances to 06:30, so
    # [4,5), [5,6) finalize; [7,8) stays open.
    land("b", [0, 7])
    q = windowed_event_counts_append(spark, in_dir, sink, sch, ts_col="ts",
                                     window="1 hour", watermark="1 hour")
    q.awaitTermination()
    # bounded state: only the open windows remain in the state store
    prog = q.lastProgress
    state_rows = prog["stateOperators"][0]["numRowsTotal"]
    assert state_rows <= 2, f"state not bounded by open windows: {state_rows}"
    got2 = sorted(
        (r.window_start.hour, r.n) for r in spark.read.parquet(sink).collect()
    )
    assert got2 == [(0, 2), (1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


def test_sessionize_stream_custom_state(spark, tmp_path_factory):
    """The CUSTOM stateful operator (applyInPandasWithState): gap
    sessionization with per-key open-session state. Pins the four
    properties a forever-running pipeline needs: (1) sessions closed by
    a later event emit immediately; (2) trailing sessions emit via
    EVENT-TIME TIMEOUT once the watermark passes last+gap, and leave the
    state store; (3) an open session carried across drains MERGES with
    new in-gap events before closing; (4) rows older than the watermark
    are DROPPED, never reopening finalized keys — and state stays
    bounded by open sessions throughout."""
    from datetime import datetime

    from pyspark.sql.types import _parse_datatype_string

    from wills_columnar_format_spark.streaming import sessionize_stream

    work = tmp_path_factory.mktemp("sess_state")
    in_dir, sink = str(work / "in"), str(work / "sink")
    os.makedirs(in_dir)
    sch = _parse_datatype_string("user_id bigint, ts timestamp_ntz")

    def land(rows):
        spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz") \
            .coalesce(1).write.mode("append").parquet(in_dir)

    def H(h, m=0):
        return datetime(2024, 1, 1, h, m)

    def sink_rows():
        return sorted(
            (r.user_id, r.session_start.hour, r.session_end.hour, r.n_events)
            for r in spark.read.parquet(sink).collect()
        )

    # drain 1 (gap 4h, watermark delay 0): user 1 at 00,01,10 — the 10:00
    # event closes session {00,01} intra-batch; {10} stays open (timeout
    # 14:00 > watermark 10:00). user 2 at 02 — timeout 06:00 <= watermark,
    # fires in the final no-data batch.
    land([(1, H(0)), (1, H(1)), (1, H(10)), (2, H(2))])
    q = sessionize_stream(spark, in_dir, sink, sch, key_col="user_id",
                          ts_col="ts", gap_seconds=4 * 3600,
                          watermark="0 seconds")
    q.awaitTermination()
    assert sink_rows() == [(1, 0, 5, 2), (2, 2, 6, 1)]
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1

    # drain 2: 10:30 MERGES into the carried open session; 20:00 closes
    # it (emit 10:00-14:30, n=2, proving the cross-drain merge); user 2's
    # 03:00 row is LATE (watermark 10:00) and must be dropped — no new
    # user-2 session. State again holds exactly the one open session.
    land([(1, H(10, 30)), (1, H(20)), (2, H(3))])
    q = sessionize_stream(spark, in_dir, sink, sch, key_col="user_id",
                          ts_col="ts", gap_seconds=4 * 3600,
                          watermark="0 seconds")
    q.awaitTermination()
    assert sink_rows() == [(1, 0, 5, 2), (1, 10, 14, 2), (2, 2, 6, 1)]
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1


def test_sessionize_stream_watermark_beyond_gap(spark, tmp_path_factory):
    """Watermark delay LONGER than the gap — the configuration where
    emitting 'closed' sessions batch-side would corrupt output (a late
    row inside an already-emitted session would re-create it). With
    finalize-on-watermark emission, a late segment that lands more than
    gap BEFORE a pending session stays a SEPARATE session, and a late
    in-gap row MERGES into the pending session it belongs to."""
    from datetime import datetime

    from pyspark.sql.types import _parse_datatype_string

    from wills_columnar_format_spark.streaming import sessionize_stream

    work = tmp_path_factory.mktemp("sess_wm")
    in_dir, sink = str(work / "in"), str(work / "sink")
    os.makedirs(in_dir)
    sch = _parse_datatype_string("user_id bigint, ts timestamp_ntz")

    def land(rows):
        spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz") \
            .coalesce(1).write.mode("append").parquet(in_dir)

    def H(h, m=0):
        return datetime(2024, 1, 1, h, m)

    args = dict(key_col="user_id", ts_col="ts", gap_seconds=3600,
                watermark="8 hours")
    # drain 1: gap 1h, delay 8h. user 1 at 10:00 -> pending [10:00,11:00).
    # watermark ends at 02:00 -> nothing finalizes.
    land([(1, H(10))])
    q = sessionize_stream(spark, in_dir, sink, sch, **args)
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == 0

    # drain 2: LATE rows (admissible — above the 02:00 watermark):
    # 03:00 is > gap before the pending session => separate session;
    # 10:30 is in-gap => merges into [10:00, 11:30). A fresh row at
    # 23:00 advances the watermark to 15:00, finalizing both earlier
    # sessions with the correct shapes.
    land([(1, H(3)), (1, H(10, 30)), (1, H(23))])
    q = sessionize_stream(spark, in_dir, sink, sch, **args)
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_start.hour, r.session_end.hour,
         r.session_end.minute, r.n_events)
        for r in spark.read.parquet(sink).collect()
    )
    assert got == [(1, 3, 4, 0, 1), (1, 10, 11, 30, 2)]
    assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 1


def test_sessionize_stream_randomized_multi_drain(spark, tmp_path_factory):
    """Property-style: events split RANDOMLY across three drains (so
    every drain carries event-time-late rows), watermark delay wide
    enough that all are admissible, then a far-future sentinel advances
    the watermark past everything — the emitted sessions must equal the
    batch session_window answer on the original events exactly."""
    import numpy as np
    from datetime import datetime, timedelta

    from pyspark.sql.types import _parse_datatype_string

    from wills_columnar_format_spark.streaming import sessionize_stream

    rng = np.random.default_rng(23)
    base = datetime(2024, 1, 1)
    n, nk = 600, 3
    rows = [
        (int(rng.integers(0, nk)),
         base + timedelta(seconds=int(rng.integers(0, 30 * 86400))))
        for _ in range(n)
    ]
    work = tmp_path_factory.mktemp("sess_rand")
    in_dir, sink = str(work / "in"), str(work / "sink")
    os.makedirs(in_dir)
    sch = _parse_datatype_string("user_id bigint, ts timestamp_ntz")

    def land(batch):
        spark.createDataFrame(batch, "user_id bigint, ts timestamp_ntz") \
            .coalesce(1).write.mode("append").parquet(in_dir)

    args = dict(key_col="user_id", ts_col="ts", gap_seconds=6 * 3600,
                watermark="720 hours")  # admits everything (30-day span)
    order = rng.permutation(n)
    for part in np.array_split(order, 3):
        land([rows[i] for i in part.tolist()])
        q = sessionize_stream(spark, in_dir, sink, sch, **args)
        q.awaitTermination()
    # sentinel drain: one far-future event per key pushes the watermark
    # (sentinel max - 720h) beyond every real session's end
    land([(k, base + timedelta(days=120)) for k in range(nk)])
    q = sessionize_stream(spark, in_dir, sink, sch, **args)
    q.awaitTermination()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(sink).collect()
    }
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")
    exp = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in (
            df.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events")
        ).collect()
    }
    assert got == exp and len(exp) > 50


def test_stream_then_rechunk_compact_schema_free(spark, dirs, tmp_path_factory):
    """The full ingest story, nightly-compaction shape: streaming encode
    (small 1k-row chunks, sidecar written automatically) -> re-encoding
    compaction WITHOUT any schema argument (the _table_schema sidecar
    supplies it) -> shuffle-free schema-free decode, lossless, with the
    compacted layout strictly smaller than the streaming one."""
    from wills_columnar_format_spark.engine import (
        compact_checkpoint, decode_checkpoint, read_checkpoint_schema)

    in_dir, manifest_dir = dirs
    stage = str(tmp_path_factory.mktemp("stage_rc") / "tok")
    write_token_table(stage, 6_000, rows_per_file=2_000)
    files = sorted(f for f in os.listdir(stage) if f.endswith(".parquet"))
    _land_files(in_dir, stage, files)
    schema = spark.read.parquet(stage).schema
    q = encode_stream(spark, in_dir, manifest_dir, schema, num_partitions=4,
                      chunk_rows=1024)
    q.awaitTermination(120)
    assert read_checkpoint_schema(manifest_dir) is not None  # sidecar landed

    dst = str(tmp_path_factory.mktemp("stage_rc") / "compacted")
    compact_checkpoint(spark, manifest_dir, dst, rechunk_rows=65536,
                       key_col="doc_id", num_partitions=2,
                       partitioner="hash")
    small = spark.read.parquet(manifest_dir).agg(
        F.sum(F.length("blob"))).collect()[0][0]
    big = spark.read.parquet(dst).agg(F.sum(F.length("blob"))).collect()[0][0]
    assert big < small

    dec = decode_checkpoint(spark, dst)  # no schema anywhere
    assert "Exchange" not in dec._jdf.queryExecution().executedPlan().toString()
    orig = spark.read.parquet(stage)
    assert dec.count() == 6_000
    bad = (dec.alias("d").join(orig.alias("o"), "doc_id")
           .filter(~((F.col("d.tokens") == F.col("o.tokens"))
                     & (F.col("d.n_tok") == F.col("o.n_tok"))
                     & (F.col("d.source") == F.col("o.source")))).count())
    assert bad == 0
