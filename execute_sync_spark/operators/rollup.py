"""Incremental continuous aggregate over an append-only event log — the
hypertable "continuous aggregate" / materialized-view-maintenance idiom.

A materialized hourly rollup table lives on disk partitioned by DAY; each
arriving batch is folded in by ADDITIVE MERGE: the batch's partial
aggregates (count / sum are associative) union with the existing rollup
rows of ONLY the day partitions the batch touches, re-aggregate, and those
partitions swap atomically. The event log is never re-read for a refresh —
at 100 TB a day's late events cost one partition-pruned rollup read plus
one small write, regardless of log size. (Contrast `ParquetSink
.refresh_latest`, which must re-read the log because D2 latest-version is
NOT additive; rollup sums are, so this path is cheaper still.)

Layout: ``{path}/day=YYYY-MM-DD/part-*.parquet`` with rows
(event_type, bucket_start, n_events, sum_value). AVG is derivable as
sum/n downstream; only associative aggregates are maintained (the rule for
any incrementally-maintained view).
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
    """Materialized hourly (event_type, hour) rollup with per-day
    incremental refresh."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")

    # -- full build ---------------------------------------------------------

    def build(self, events: DataFrame) -> str:
        """Full (re)build — the bootstrap, or the escape hatch if the
        rollup is ever suspected stale."""
        tmp = f"{self.path}_{uuid.uuid4().hex[:8]}"
        _hourly(events).write.mode("overwrite").partitionBy("day").parquet(tmp)
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)
        return self.path

    # -- incremental refresh ------------------------------------------------

    def refresh(self, new_batch: DataFrame) -> list[str]:
        """Fold one new batch into the rollup. Only the day partitions the
        batch touches are read (partition-pruned) and rewritten; all other
        partitions keep their physical files (inode-asserted in
        tests/test_rollup.py). Returns the refreshed day list.

        Additivity is the contract: existing rollup rows and the batch's
        partial aggregates union and re-sum — correct for count/sum
        whatever order batches arrive in, including late data for old days.
        """
        if not os.path.isdir(self.path):
            self.build(new_batch)
            return ["*"]

        deltas = _hourly(new_batch)
        touched = [r.day for r in deltas.select("day").distinct().collect()]
        if not touched:
            return []
        existing = self.read().filter(F.col("day").isin(touched))
        merged = (
            existing.select(deltas.columns)
            .unionByName(deltas)
            .groupBy("event_type", "bucket_start", "day")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
            .select(deltas.columns)
        )
        tmp = f"{self.path}_delta_{os.getpid()}"
        merged.write.mode("overwrite").partitionBy("day").parquet(tmp)
        for d in touched:
            src = os.path.join(tmp, f"day={d}")
            dst = os.path.join(self.path, f"day={d}")
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            if os.path.isdir(src):
                os.rename(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        return sorted(touched)

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        """The materialized rollup (day is a partition column ⇒ day
        predicates prune to subtrees)."""
        return self.spark.read.parquet(self.path)
