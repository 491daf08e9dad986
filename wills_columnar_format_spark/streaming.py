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
    in-memory sink, drained with ``availableNow``. The stateful-agg
    shape a 100 TB event pipeline runs continuously — state is bounded
    by the watermark horizon (windows older than the watermark are
    finalized and evicted), so executor state does not grow with stream
    length. Returns the final counts DataFrame
    (window_start, window_end, n)."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).parquet(input_path)
    # watermarks require TIMESTAMP (with local tz); parquet NTZ event
    # times are cast in, and window bounds cast back to NTZ so the
    # output dtype matches the source column's
    stream = stream.withColumn("__evt", F.col(ts_col).cast("timestamp"))
    agg = (
        stream.withWatermark("__evt", watermark)
        .groupBy(F.window(F.col("__evt"), window).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            F.col("n"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
