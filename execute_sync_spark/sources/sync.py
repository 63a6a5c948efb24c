"""The sync orchestration (SURVEY §3.1): fetch pages -> land -> sink ->
commit watermark. The driver loop is intentionally tiny — all heavy lifting
(parse, shred, dedup, write) is distributed Spark work.

Crash-consistency contract (cmd_sync.go:175-177): the watermark is persisted
only AFTER the sink append succeeds, so a crash between append and save
re-ingests the same page under a new batch_date — absorbed by D1 dedup.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone
from typing import Optional

from pyspark.sql import SparkSession

from execute_sync_spark.landing.ingest import land_ndjson_lines
from execute_sync_spark.sources.execute_api import WatermarkStore


def sync_once(
    spark: SparkSession,
    source,
    sink,
    state: WatermarkStore,
    force: bool = False,
    chunk_size: Optional[int] = None,
) -> int:
    """One fetch-and-process pass; returns documents landed."""
    since = state.load(force=force)
    total = 0
    for page in source.pages(since):
        if page.lines:
            batch_date = datetime.now(timezone.utc)
            landed = land_ndjson_lines(spark, page.lines, batch_date, chunk_size=chunk_size)
            # the highwater mark identifies the page -> idempotent append
            # (P10); a force refresh deliberately re-lands everything, so it
            # bypasses the txn guard (parity with the reference's append)
            txn_id = None if force else page.highwater_mark
            total += sink.append(landed, txn_id=txn_id)
        if page.highwater_mark:
            state.save(page.highwater_mark)
    return total


def sync_loop(
    spark: SparkSession,
    source,
    sink,
    state: WatermarkStore,
    wait_seconds: int = 600,
    max_iterations: Optional[int] = None,
    chunk_size: Optional[int] = None,
) -> None:
    """The ``sync`` command loop (cmd_sync.go:56-75): pass, sleep, repeat."""
    i = 0
    while True:
        sync_once(spark, source, sink, state, chunk_size=chunk_size)
        i += 1
        if max_iterations is not None and i >= max_iterations:
            return
        time.sleep(wait_seconds)
