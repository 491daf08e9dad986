"""Incremental (streaming) encode of an append-only token table.

The reference is strictly batch (no streaming constructs anywhere in
src/ — SURVEY.md §2.2), but a 10^12-sequence training-data pipeline is
append-only in practice: new files land, only they should be encoded.
Structured Streaming's file source tracks processed files exactly-once
in its own checkpoint; each micro-batch is a plain DataFrame that flows
through the SAME batch engine (``encode_table``) inside ``foreachBatch``
and appends to the SAME manifest layout.

Crash safety is two-layered:
* the streaming checkpoint replays an unacknowledged micro-batch on
  restart;
* chunk identity is content-based (``chunk_key`` = checksum of the
  chunk's keys, engine.py), and codec choice is a pure function of the
  values — so a replayed batch re-produces byte-identical manifest rows
  and ``decode_table``'s dropDuplicates((chunk_key, column)) collapses
  them. Idempotence end-to-end.
"""

from __future__ import annotations

from .engine import encode_table


def encode_stream(
    spark,
    input_path: str,
    manifest_dir: str,
    schema,
    key_col: str = "doc_id",
    codec: str = "auto",
    num_partitions: int = 8,
    chunk_rows: int = 16384,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start (and return) a streaming query that encodes newly arrived
    parquet files under ``input_path`` into the manifest at
    ``manifest_dir``. With ``available_now`` the query drains what exists
    and stops — call repeatedly as data lands (the cron/airflow pattern);
    otherwise it runs continuously per ``max_files_per_trigger``.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)

    # self-describing manifest: later consumers (decode_checkpoint,
    # rechunking compaction) need no schema argument
    from .engine import write_checkpoint_schema

    try:
        write_checkpoint_schema(manifest_dir, schema)
    except (OSError, ValueError):
        pass

    def handle_batch(batch_df, batch_id: int) -> None:
        manifest = encode_table(
            batch_df,
            key_col=key_col,
            codec=codec,
            num_partitions=num_partitions,
            chunk_rows=chunk_rows,
            partitioner="hash",  # deterministic boundaries for replay idempotence
            snapshot_id=f"stream-batch-{batch_id}",
        )
        manifest.write.mode("append").parquet(manifest_dir)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", manifest_dir.rstrip("/") + "_stream_ckpt")
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_manifest(spark, manifest_dir: str):
    """The accumulated manifest as a DataFrame (dedup'd for replays)."""
    return spark.read.parquet(manifest_dir).dropDuplicates(["chunk_key", "column"])


def windowed_event_counts(
    spark,
    input_path: str,
    schema,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    query_name: str = "wcfs_window_counts",
):
    """Streaming tumbling-window aggregation with late-data handling:
    ``readStream`` → ``withWatermark`` → ``groupBy(window(ts))`` →
    in-memory sink, drained with ``availableNow``. Returns the final
    counts DataFrame (window_start, window_end, n), materialized; the
    memory-sink temp view is dropped before returning so repeated calls
    don't accumulate catalog entries.

    This drain-and-inspect configuration uses ``complete`` output mode,
    which retains ALL window state for the run — correct and bounded
    for a finite ``availableNow`` drain (every window, including the
    trailing ones the watermark hasn't closed, reaches the result). A
    CONTINUOUS 100 TB event pipeline must instead run the same
    watermark+window aggregation in ``append`` mode to a durable sink:
    there the watermark finalizes and EVICTS windows older than the
    horizon, so state stays bounded as the stream runs forever (the
    trade: a window only emits once the watermark passes its end).

    Event-time columns arriving as TIMESTAMP_NTZ are shifted to
    instants whose UTC wall equals the NTZ wall (``from_utc_timestamp``
    on the session-tz cast) and window bounds shifted back — hour
    truncation therefore matches the naive wall-clock GROUP BY in any
    fixed-offset session timezone, including fractional-hour ones
    (DST-transition walls remain inherently ambiguous)."""
    agg = _windowed_agg(spark, input_path, schema, ts_col, window, watermark)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(query_name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(query_name)
    return out


def _windowed_agg(spark, input_path, schema, ts_col, window, watermark,
                  max_files_per_trigger=None):
    """The shared watermark+tumbling-window aggregation plan: returns
    (window_start, window_end, n) with NTZ wall-clock window bounds (see
    windowed_event_counts for the timezone-shift reasoning)."""
    from pyspark.sql import functions as F

    tz = spark.conf.get("spark.sql.session.timeZone")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    # watermarks require TIMESTAMP; make the instant's UTC wall equal
    # the NTZ wall so epoch-aligned windows truncate on wall hours
    stream = stream.withColumn(
        "__evt", F.from_utc_timestamp(F.col(ts_col).cast("timestamp"), tz)
    )
    return (
        stream.withWatermark("__evt", watermark)
        .groupBy(F.window(F.col("__evt"), window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.to_utc_timestamp(F.col("w.start"), tz).cast("timestamp_ntz").alias("window_start"),
            F.to_utc_timestamp(F.col("w.end"), tz).cast("timestamp_ntz").alias("window_end"),
            F.col("n"),
        )
    )


def sessionize_stream(
    spark,
    input_path: str,
    sink_dir: str,
    schema,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 4 * 3600,
    watermark: str = "0 seconds",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """CUSTOM stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` — per-key arbitrary state, event-time
    timeouts, append-mode emission to a durable parquet sink. Returns
    the started StreamingQuery.

    This is the operator class the built-in aggregations cannot express:
    per-key state is an OPEN SESSION (start, last-event, count) that
    must survive across micro-batches and close either when a later
    event of the same key arrives >= gap after it (emitted immediately,
    batch-side) or when the event-time watermark passes ``last + gap``
    (emitted by the state TIMEOUT — Spark calls the function once more
    for the key with ``state.hasTimedOut`` set, which is what bounds
    state on a forever-running stream: closed keys leave the store).

    Semantics match ``F.session_window`` / the batch ``session_agg``
    oracle: an event extends the session iff it lands strictly inside
    ``last + gap``; session_end = last event + gap. The per-batch rows
    of one key are sorted by event time inside the function (one pandas
    sort per key-batch, vectorized); cross-batch reordering is governed
    by the watermark exactly as for the built-in operators. State and
    arithmetic are integer epoch MICROS end-to-end (the pandas
    timestamp path never touches a timezone); the wrapper converts the
    NTZ wall to instants and back with the same session-tz shift the
    windowed aggregations use.

    Scale shape (100 TB of events): one shuffle of the stream on the
    key per micro-batch; state-store size is bounded by the number of
    OPEN sessions (keys active within the watermark horizon), not
    stream history; each state row is 3 longs. Reference parity: n/a —
    the reference is batch-only (SURVEY.md §2.2); this fills the task
    brief's custom-stateful-operator slot.
    """
    import pandas as pd  # noqa: F401 (worker-side type of the iterator)
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    gap_us = int(gap_seconds) * 1_000_000
    tz = spark.conf.get("spark.sql.session.timeZone")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    stream = stream.withColumn(
        "__evt", F.from_utc_timestamp(F.col(ts_col).cast("timestamp"), tz)
    ).withWatermark("__evt", watermark)
    # the watermark column itself must flow into the stateful operator
    # (Spark ties event-time timeouts to its presence in the child plan)
    rows = stream.select(
        F.col(key_col).alias("k"), F.unix_micros("__evt").alias("ts_us"),
        "__evt",
    )

    out_type = StructType([
        StructField("k", rows.schema["k"].dataType),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ])
    state_type = StructType([
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ])

    def fn(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        k = key[0]
        closed = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((k, start, last, n))
            state.remove()
        else:
            cur = state.get if state.exists else None
            parts = [pdf["ts_us"].to_numpy(dtype=np.int64) for pdf in pdf_iter]
            ts = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
            if len(ts):
                # vectorized gap segmentation: a break wherever the
                # inter-event gap reaches the threshold; per-row work is
                # numpy, the Python loop below runs once per SEGMENT
                # (i.e. per emitted session — the output unit)
                brk = np.flatnonzero(np.diff(ts) >= gap_us)
                starts = np.concatenate([[0], brk + 1])
                ends = np.concatenate([brk, [len(ts) - 1]])
                for s, e in zip(starts.tolist(), ends.tolist()):
                    seg = (int(ts[s]), int(ts[e]), e - s + 1)
                    # merge with the carried state (an open session may
                    # swallow several segments when a late row extended
                    # its reach — cur[1] only grows, so test per segment)
                    if cur is not None and seg[0] < cur[1] + gap_us:
                        cur = (min(cur[0], seg[0]), max(cur[1], seg[1]),
                               cur[2] + seg[2])
                    else:
                        if cur is not None:
                            closed.append((k, *cur))
                        cur = seg
            if cur is not None:
                state.update(cur)
                # fire when the watermark passes session end (ms floor:
                # the watermark is millisecond-granular)
                timeout_ms = (cur[1] + gap_us) // 1000
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        if closed:
            yield pd.DataFrame(
                closed, columns=["k", "start_us", "last_us", "n_events"]
            )

    sessions = rows.groupBy("k").applyInPandasWithState(
        fn, out_type, state_type, "append", GroupStateTimeout.EventTimeTimeout
    )
    out = sessions.select(
        F.col("k").alias(key_col),
        F.to_utc_timestamp(F.timestamp_micros("start_us"), tz)
        .cast("timestamp_ntz").alias("session_start"),
        F.to_utc_timestamp(F.timestamp_micros(F.col("last_us") + F.lit(gap_us)), tz)
        .cast("timestamp_ntz").alias("session_end"),
        F.col("n_events"),
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", sink_dir.rstrip("/") + "_stream_ckpt")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts_append(
    spark,
    input_path: str,
    sink_dir: str,
    schema,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """The PRODUCTION shape of ``windowed_event_counts``: the same
    watermark + tumbling-window aggregation running in ``append`` mode
    to a durable parquet sink. Returns the started StreamingQuery.

    Append mode is what makes a continuous 100 TB event pipeline
    viable: a window only emits once the watermark passes its end, and
    on emission its state is EVICTED — state-store size stays bounded
    by the number of OPEN windows (watermark horizon / window length),
    independent of how long the stream has run. The complete-mode
    variant above, by contrast, retains every window ever seen and is
    only appropriate for finite availableNow drains.

    The cost is the same trade Spark documents for every append-mode
    aggregation: rows arriving later than ``watermark`` past the
    max seen event time are DROPPED (they belong to already-finalized
    windows), and the trailing not-yet-closed windows are absent from
    the sink until a later drain advances the watermark past them.
    Both behaviors are pinned in tests/test_streaming.py.

    Call repeatedly with ``available_now`` as data lands (the
    cron/airflow pattern — the checkpoint carries the watermark across
    drains, so each drain finalizes what the new data's event times
    allow); or run continuously with ``max_files_per_trigger``.
    """
    agg = _windowed_agg(spark, input_path, schema, ts_col, window, watermark,
                        max_files_per_trigger=max_files_per_trigger)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", sink_dir.rstrip("/") + "_stream_ckpt")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
