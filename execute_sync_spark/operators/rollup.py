"""Incremental continuous aggregate over an append-only event log — the
hypertable "continuous aggregate" / materialized-view-maintenance idiom,
made IDEMPOTENT under at-least-once batch replay.

Layout: ``{path}/day=D/batch_id=B/part-*.parquet`` holds PARTIAL hourly
aggregates — one (day, batch_id) partition per ingested batch. A refresh
writes the batch's partials with dynamic partition overwrite, so replaying
the same batch (a foreachBatch restart after a crash, the reference's
watermark-after-upload window) OVERWRITES its own partitions instead of
double-counting — the exactly-once contract falls out of the layout, with
no read-modify-write race. Compaction preserves the contract with a
per-day ``_absorbed.json`` manifest (underscore-prefixed ⇒ invisible to
the parquet reader, like ``_SUCCESS``): a replay of a batch that was
already folded into the compacted partition finds its id in the manifest
and skips that day. The event log is never re-read for a refresh; at
100 TB a late batch for an old day costs one small partition write,
regardless of log size.

``read()`` folds the partials (sum of sums/counts — associative, the rule
for any incrementally-maintained aggregate); ``compact()`` collapses a
day's accumulated batch partials into one, the OPTIMIZE analog for
long-lived rollups. (Contrast ``ParquetSink.refresh_latest``, which must
re-read the log because D2 latest-version is NOT additive.)
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_absorbed.json"


def _hourly(events: DataFrame) -> DataFrame:
    """Partial hourly aggregates of one event set (map-side combined).
    Rows with a NULL timestamp cannot be bucketed and are dropped — the
    same rule on the build and refresh paths, so a dirty log never makes
    the incremental path diverge from (or crash harder than) a rebuild."""
    return events.filter(F.col("ts").isNotNull()).groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).withColumn("day", F.to_date("bucket_start").cast("string"))


class HourlyRollup:
    """Materialized hourly (event_type, hour) rollup maintained from
    batches, replay-idempotent per batch_id — including across compaction."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    def _absorbed(self, day: str) -> set[str]:
        """Batch ids already folded into this day's compacted partition."""
        p = os.path.join(self.path, f"day={day}", _MANIFEST)
        try:
            with open(p) as f:
                return set(json.load(f).get("batches", []))
        except (OSError, ValueError):
            return set()

    # -- full build ---------------------------------------------------------

    def build(self, events: DataFrame) -> str:
        """Full (re)build — the bootstrap from a complete log, or the
        escape hatch if the rollup is ever suspected stale. Stages the
        rebuild beside the live table and commits via rename-aside →
        rename-in → delete-old: a crash before the first rename leaves the
        old table live; a crash in the (tiny) two-rename window leaves the
        old table intact under ``{path}_old_*`` for manual recovery —
        never an unrecoverable delete-then-write gap. The write mode is
        pinned STATIC so a session-level dynamic-overwrite default can't
        leave stale batch partials alive under the new table."""
        tmp = f"{self.path}_{uuid.uuid4().hex[:8]}"
        (
            _hourly(events)
            .withColumn("batch_id", F.lit("__full__"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("day", "batch_id")
            .parquet(tmp)
        )
        old_aside = f"{self.path}_old_{uuid.uuid4().hex[:8]}"
        had_live = os.path.isdir(self.path)
        if had_live:
            os.rename(self.path, old_aside)
        os.rename(tmp, self.path)
        if had_live:
            shutil.rmtree(old_aside, ignore_errors=True)
        return self.path

    # -- incremental refresh ------------------------------------------------

    def refresh(self, new_batch: DataFrame, batch_id=None) -> list[str]:
        """Fold one batch into the rollup. Writes the batch's partial
        aggregates under (day, batch_id) with DYNAMIC partition overwrite:
        only the partitions this batch produces are replaced, every other
        partition keeps its physical files (inode-asserted in
        tests/test_rollup.py), and a REPLAY of the same batch_id rewrites
        its own partitions — or, if compaction already absorbed it, skips
        the day entirely (manifest check) — instead of double-counting
        (replay-asserted, incl. the compact-then-replay window).

        ``batch_id`` is the replay-stable identity — foreachBatch's epoch
        id is exactly right. A None batch_id gets a random one: still
        correct for a batch that runs once, but replays of it would
        double-count, so streaming callers must pass the epoch id.
        Returns the list of days actually written."""
        bid = str(batch_id) if batch_id is not None else uuid.uuid4().hex[:12]
        deltas = _hourly(new_batch).withColumn("batch_id", F.lit(bid)).persist()
        try:
            touched = sorted(r.day for r in deltas.select("day").distinct().collect())
            # compact-then-replay: days whose compacted partition already
            # contains this batch id must not receive it again
            touched = [d for d in touched if bid not in self._absorbed(d)]
            if not touched:
                return []
            (
                deltas.filter(F.col("day").isin(touched))
                .write.mode("overwrite")
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
        on long-lived rollups (the OPTIMIZE analog). Each swapped day dir
        carries an ``_absorbed.json`` manifest of every batch id folded in
        (previous manifest included), so replays of absorbed batches stay
        idempotent; the per-day ``os.rename`` is the atomic commit point
        (same pattern as ParquetSink.prune — a crash mid-compact leaves
        every day either fully old or fully new, both consistent)."""
        if not os.path.isdir(self.path):
            return []
        # only days holding UNCOMPACTED partials need work — periodic
        # compaction is O(days with new batches), not O(full table)
        days = sorted(
            d[len("day="):]
            for d in os.listdir(self.path)
            if d.startswith("day=") and os.path.isdir(os.path.join(self.path, d))
            and any(
                b.startswith("batch_id=") and b != "batch_id=__compacted__"
                for b in os.listdir(os.path.join(self.path, d))
            )
        )
        if not days:
            return []
        merged = (
            self.read()
            .filter(F.col("day").cast("string").isin(days))
            .withColumn("batch_id", F.lit("__compacted__"))
            .select("event_type", "bucket_start", "n_events", "sum_value", "day", "batch_id")
        )
        tmp = f"{self.path}_compact_{os.getpid()}"
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "static"
        ).partitionBy("day", "batch_id").parquet(tmp)
        for day in days:
            live = os.path.join(self.path, f"day={day}")
            absorbed = self._absorbed(day) | {
                b[len("batch_id="):]
                for b in os.listdir(live)
                if b.startswith("batch_id=") and b != "batch_id=__compacted__"
            }
            src = os.path.join(tmp, f"day={day}")
            with open(os.path.join(src, _MANIFEST), "w") as f:
                json.dump({"batches": sorted(absorbed)}, f)
            # recoverable two-rename swap: aside dir is "_"-prefixed, so
            # Spark's reader ignores it if a crash strands it mid-window
            aside = os.path.join(self.path, f"_old_day_{day.replace('-', '')}_{os.getpid()}")
            os.rename(live, aside)
            os.rename(src, live)
            shutil.rmtree(aside, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return days

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        """The rollup: partials folded to one row per (type, hour). Day is
        a partition column, so day predicates prune to subtrees before the
        fold. A rollup that has never been written reads as EMPTY (a new
        stream whose first batches were all empty is a normal state, not
        an error)."""
        if not os.path.isdir(self.path):
            return self.spark.createDataFrame(
                [],
                "event_type string, bucket_start timestamp, day date, "
                "n_events long, sum_value double",
            )
        return (
            self.spark.read.parquet(self.path)
            .groupBy("event_type", "bucket_start", "day")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
