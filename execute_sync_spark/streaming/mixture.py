"""Streaming-maintained temperature-mixture stats (round 14).

``curate_temperature_mix`` derives per-domain (n_docs, n_tokens) from a
corpus scan; at 100 TB a mixture that must stay CURRENT as documents
stream in cannot re-scan the corpus per refresh. This module maintains the
per-domain counts as a persisted per-batch stats sidecar — the
``_bm25_write_stats`` layout: one small parquet dir per ingest batch under
``{path}/batch_id=<epoch>``, written with dynamic partition overwrite so a
replayed epoch overwrites ITSELF (value-identical) instead of
double-counting — and recomputes mixture weights from the summed stats.

Exactly-once story (the streaming/clusters.py contract): the file-source
checkpoint gives exactly-once batch delivery, and the per-batch stats
write is replay-idempotent, so a crash between the stats write and the
checkpoint commit replays as an overwrite of identical rows. The invariant
pinned by tests: after any prefix of micro-batches,
``mixture_from_stats`` equals ``temperature_mixture`` run flat over every
document delivered so far — micro-batch cadence, restart, and duplicate
delivery included. The equality is structural, not approximate: both
paths feed integer (n_docs, n_tokens) counts into the ONE shared math
body ``curation.mixture_from_counts``.

At 100 TB the stats relation is (domains x batches) rows — trivially
small — while the corpus-scale work (token counting) happens once per
batch on the batch only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mixture_stats(
    docs: DataFrame,
    path: str,
    batch_id: str,
    text_col: str = "text",
    group_col: str = "source",
) -> None:
    """One (group, n_docs, n_tokens) stats dir for one ingest batch.
    Overwrites its own ``batch_id=`` dir only: replays are idempotent."""
    from execute_sync_spark.functions.text import tokens as _tokens

    stats = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_tokens(text_col))).cast("long").alias("n_tokens"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, f"batch_id={batch_id}")
    )


def mixture_from_stats(
    spark: SparkSession,
    path: str,
    temperature: float = 0.7,
    group_col: str = "source",
) -> DataFrame:
    """Mixture weights from the persisted stats sidecar: sum the
    per-batch integer counts per domain, then the shared math body —
    equals ``temperature_mixture`` over the union of every batch's
    documents, exactly."""
    from execute_sync_spark.functions.curation import mixture_from_counts

    stats = spark.read.parquet(path)
    counts = stats.groupBy(group_col).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    return mixture_from_counts(counts, temperature, group_col=group_col)


def stream_mixture_maintenance(
    spark: SparkSession,
    docs_dir: str,
    stats_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    group_col: str = "source",
    schema=None,
    available_now: bool = True,
):
    """Maintain the mixture stats sidecar from a parquet document-feed
    directory: each discovered file becomes one micro-batch whose
    per-domain counts land under ``batch_id=e<epoch>`` (the epoch id is
    the replay-stable batch key — the streaming/phash.py convention).
    Start with ``write_mixture_stats(base_docs, path, "__base__")`` when
    a bootstrap corpus predates the stream; starting on an empty or
    not-yet-created feed works (explicit-schema fallback, the
    streaming/clusters.py ADVICE r12 contract)."""
    from pyspark.errors import AnalysisException

    if schema is None:
        try:
            schema = spark.read.parquet(docs_dir).schema
        except AnalysisException:
            schema = f"doc_id long, {text_col} string, {group_col} string"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        write_mixture_stats(
            batch_df, stats_path, f"e{epoch_id}", text_col, group_col
        )

    # The trigger is applied only under available_now (the streaming/phash.py
    # and streaming/clusters.py pattern — ADVICE r14): a caller asking for a
    # continuous maintenance stream must get one, not a silently drain-and-
    # stop query that terminates after the currently available files.
    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
