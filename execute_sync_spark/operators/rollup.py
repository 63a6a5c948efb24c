"""Incremental continuous aggregate over an append-only event log — the
hypertable "continuous aggregate" / materialized-view-maintenance idiom,
made IDEMPOTENT under at-least-once batch replay.

Layout: ``{path}/day=D/batch_id=B/part-*.parquet`` holds PARTIAL hourly
aggregates — one (day, batch_id) partition per ingested batch. A refresh
writes the batch's partials with dynamic partition overwrite, so replaying
the same batch (a foreachBatch restart after a crash, the reference's
watermark-after-upload window) OVERWRITES its own partitions instead of
double-counting — the exactly-once contract falls out of the layout, with
no ledger and no read-modify-write race. The event log is never re-read
for a refresh; at 100 TB a late batch for an old day costs one small
partition write, regardless of log size.

``read()`` folds the partials (sum of sums/counts — associative, the rule
for any incrementally-maintained aggregate); ``compact()`` collapses a
day's accumulated batch partials into one, the OPTIMIZE analog for
long-lived rollups. (Contrast ``ParquetSink.refresh_latest``, which must
re-read the log because D2 latest-version is NOT additive.)
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hourly(events: DataFrame) -> DataFrame:
    """Partial hourly aggregates of one event set (map-side combined)."""
    return events.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).withColumn("day", F.to_date("bucket_start").cast("string"))


class HourlyRollup:
    """Materialized hourly (event_type, hour) rollup maintained from
    batches, replay-idempotent per batch_id."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- full build ---------------------------------------------------------

    def build(self, events: DataFrame) -> str:
        """Full (re)build — the bootstrap from a complete log, or the
        escape hatch if the rollup is ever suspected stale. Replaces the
        whole table (static overwrite) under batch_id=__full__."""
        (
            _hourly(events)
            .withColumn("batch_id", F.lit("__full__"))
            .write.mode("overwrite")
            .partitionBy("day", "batch_id")
            .parquet(self.path)
        )
        return self.path

    # -- incremental refresh ------------------------------------------------

    def refresh(self, new_batch: DataFrame, batch_id=None) -> list[str]:
        """Fold one batch into the rollup. Writes the batch's partial
        aggregates under (day, batch_id) with DYNAMIC partition overwrite:
        only the partitions this batch produces are replaced, every other
        partition keeps its physical files (inode-asserted in
        tests/test_rollup.py), and a REPLAY of the same batch_id rewrites
        its own partitions instead of double-counting (replay-asserted).

        ``batch_id`` is the replay-stable identity — foreachBatch's epoch
        id is exactly right. A None batch_id gets a random one: still
        correct for a batch that runs once, but replays of it would
        double-count, so streaming callers must pass the epoch id.
        Returns the touched day list."""
        bid = str(batch_id) if batch_id is not None else uuid.uuid4().hex[:12]
        deltas = _hourly(new_batch).withColumn("batch_id", F.lit(bid)).persist()
        try:
            touched = sorted(r.day for r in deltas.select("day").distinct().collect())
            if not touched:
                return []
            (
                deltas.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("day", "batch_id")
                .parquet(self.path)
            )
        finally:
            deltas.unpersist()
        return touched

    # -- compaction ---------------------------------------------------------

    def compact(self) -> list[str]:
        """Collapse each day's accumulated batch partials into a single
        ``batch_id=__compacted__`` partition — bounds partial-file growth
        on long-lived rollups (the OPTIMIZE analog). Per-day subtree swap,
        same pattern as ParquetSink.prune."""
        merged = (
            self.read()
            .withColumn("batch_id", F.lit("__compacted__"))
            .select("event_type", "bucket_start", "n_events", "sum_value", "day", "batch_id")
        )
        tmp = f"{self.path}_compact_{os.getpid()}"
        merged.write.mode("overwrite").partitionBy("day", "batch_id").parquet(tmp)
        days = [
            d for d in os.listdir(tmp)
            if d.startswith("day=") and os.path.isdir(os.path.join(tmp, d))
        ]
        for d in days:
            src, dst = os.path.join(tmp, d), os.path.join(self.path, d)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            os.rename(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        return sorted(d[len("day="):] for d in days)

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        """The rollup: partials folded to one row per (type, hour). Day is
        a partition column, so day predicates prune to subtrees before the
        fold."""
        return (
            self.spark.read.parquet(self.path)
            .groupBy("event_type", "bucket_start", "day")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
