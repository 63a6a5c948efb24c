"""Structured Streaming operators.

The reference's ``sync`` loop is a hand-rolled micro-batch poll
(/root/reference/src/cmd_sync.go:56-75). Spark-first, the same shape is a
Structured Streaming source -> windowed aggregation -> sink, with watermarks
bounding state. Here: tumbling-window counts over the events stream.

``availableNow`` processes the whole backlog as micro-batches then stops —
the batch-parity mode (used by the correctness gate: the final complete-mode
result equals the batch groupBy). In production the same query runs
continuously with the watermark evicting state.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_window_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window event counts via a real streaming query (memory sink,
    availableNow trigger), returned as a batch DataFrame."""
    path = os.path.join(sf_dir, "events.parquet")
    # events.ts is nanos parquet — read as long, truncate to micros (see
    # plans.workload._events for the batch-side twin of this conversion)
    # pin for foreign sessions; read at execution time so not restorable
    # here — session.get_spark sets it at construction (no-op there)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from execute_sync_spark.streaming.util import stage_stream_dir, stream_input_schema

    schema = stream_input_schema(spark, path)
    stream_dir = stage_stream_dir(path, prefix="stream_events_")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    if "ts" in stream.columns and dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    name = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        windowed.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def stream_sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window counts: each event contributes to duration/slide
    overlapping windows (2 here). Same streaming machinery as the tumbling
    form; state per (window, key) — the watermark bounds how many window
    panes stay open, so state is O(keys * duration/slide), independent of
    stream length."""
    path = os.path.join(sf_dir, "events.parquet")
    # pin for foreign sessions; read at execution time so not restorable
    # here — session.get_spark sets it at construction (no-op there)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from execute_sync_spark.streaming.util import stage_stream_dir, stream_input_schema

    schema = stream_input_schema(spark, path)
    stream_dir = stage_stream_dir(path, prefix="stream_slide_")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    if "ts" in stream.columns and dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    windowed = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    from execute_sync_spark.streaming.util import run_to_memory

    out = run_to_memory(spark, windowed, "complete", "stream_slide")
    return out.select(
        F.col("win.start").alias("window_start"), "event_type", "n_events", "total_value"
    )


def stream_dedup_events(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on event_id
    over a stream that replays the backlog TWICE (two links to the same
    file), so every event arrives duplicated — the at-least-once delivery
    shape a real ingest pipeline sees. The watermark bounds the dedup state:
    a key is evictable once the watermark passes its event time, which is
    what makes exact streaming dedup feasible on an infinite stream (plain
    dropDuplicates would grow state forever).

    Batch-parity: duplicates carry identical payloads, so the kept-first
    result equals SELECT DISTINCT over the backlog."""
    path = os.path.join(sf_dir, "events.parquet")
    # pin for foreign sessions; read at execution time so not restorable
    # here — session.get_spark sets it at construction (no-op there)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from execute_sync_spark.streaming.util import stage_stream_dir, stream_input_schema

    schema = stream_input_schema(spark, path)
    stream_dir = stage_stream_dir(path, prefix="stream_dedup_", replicas=2)
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    if "ts" in stream.columns and dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    deduped = (
        stream.select("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    from execute_sync_spark.streaming.util import run_to_memory

    return run_to_memory(spark, deduped, "append", "stream_dedup")
