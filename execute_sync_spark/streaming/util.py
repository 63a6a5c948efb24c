"""Shared helper for one-shot (availableNow) streaming queries landing in a
memory sink, with state-store sizing that is safe under CONCURRENT query
submission on a shared SparkSession."""

from __future__ import annotations

import os
import tempfile
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stage_stream_dir(path: str, prefix: str = "stream_", replicas: int = 1) -> str:
    """Expose a parquet source to the FILE-stream reader via a temp dir of
    symlinks (testdata is read-only; the file-stream source needs a
    directory of data files).

    ``path`` may be a single parquet FILE (testdata ships those) or a
    Spark-WRITTEN DIRECTORY of part-files (e.g. the 10x scale synthesis).
    The directory case must link the individual part-files: symlinking the
    directory itself makes the non-recursive file-stream listing silently
    see ZERO files — every streaming query "succeeds" on an empty stream
    (caught in round 5 when all stream_* 10x timings collapsed to ~0.2 s).

    ``replicas`` links the same source N times under distinct names — the
    at-least-once replay shape the streaming-dedup query exercises."""
    # a RELATIVE source path would become a relative symlink TARGET, which
    # resolves against the symlink's own temp directory -> broken links and
    # a silently-empty stream (bitten by an ad-hoc r16 measurement script)
    path = os.path.abspath(path)
    stream_dir = tempfile.mkdtemp(prefix=prefix)
    if os.path.isdir(path):
        parts = [f for f in sorted(os.listdir(path))
                 if not f.startswith(("_", "."))]
        if not parts:
            raise ValueError(f"no data files under parquet dir {path!r}")
        for r in range(replicas):
            for f in parts:
                os.symlink(os.path.join(path, f),
                           os.path.join(stream_dir, f"r{r}_{f}"))
    else:
        for r in range(replicas):
            os.symlink(path, os.path.join(stream_dir, f"events_r{r}.parquet"))
    return stream_dir


def stream_input_schema(spark: SparkSession, path: str) -> T.StructType:
    """Batch-inferred parquet schema with TIMESTAMP_NTZ fields promoted to
    TIMESTAMP (LTZ). Watermarks/event-time require LTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the testdata's timestamp
    encoding is not ours to pin: events.parquet has shipped as both
    TIMESTAMP(NANOS) (read as long via legacy nanosAsLong, converted by the
    callers) and plain micros with isAdjustedToUTC=false (inferred NTZ).
    With the session timezone pinned UTC the promotion preserves wall-clock
    values exactly, so batch oracles are unaffected."""
    # pin UTC for foreign (driver-owned) sessions — same rationale and
    # deliberate non-restore as plans.workload._t: the conf is read at
    # execution time, after this lazily-used schema is returned
    from execute_sync_spark.session import read_parquet_cached

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = read_parquet_cached(spark, path).schema
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.TimestampType() if isinstance(f.dataType, T.TimestampNTZType) else f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
    )

# Serializes only the conf-mutate -> start() window. Structured Streaming
# pins spark.sql.shuffle.partitions (the state-store count) into the query's
# batch-0 offset metadata at start, so the session value can be restored the
# moment start() returns — later micro-batches keep the pinned value. Without
# the lock, two queries starting together could leak "8" as the session-wide
# relational default (observed in the bench's concurrent throughput pass).
_START_LOCK = threading.Lock()


def run_to_memory(
    spark: SparkSession,
    df: DataFrame,
    output_mode: str,
    name_prefix: str,
    shuffle_partitions: int = 8,
) -> DataFrame:
    """Run df as an availableNow streaming query into a memory sink and
    return the sink table. One state store exists per shuffle partition
    (stream-stream joins keep four) — sizing the shuffle to key cardinality,
    not the relational default, cuts store-init cost several-fold for
    low-cardinality keys."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    with _START_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    return spark.table(name)
