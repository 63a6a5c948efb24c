"""Streaming-fed payload phash index maintenance (round 13).

``multimodal.append_phash_index`` is batch-incremental: a new payload
batch is fingerprinted alone (the existing index is never read or
reshuffled) and lands under its own ``batch_id`` partitions via the
shared commit protocol. This module drives it from Structured Streaming
exactly like the cluster state (``streaming/clusters.py``) and the
landing feed (``streaming/ingest.py``): a payload feed directory is a
file-source stream, each micro-batch appends one index batch inside
``foreachBatch``.

Exactly-once story: the file-source checkpoint gives exactly-once *batch
delivery*; the append itself is replay-IDEMPOTENT (the foreachBatch
epoch id is the commit protocol's ``batch_id``, so a replayed epoch
dynamically overwrites its own partitions, and an epoch already folded
in by ``compact_phash_index`` is skipped through the manifests). A crash
after the index write but before the checkpoint commit therefore replays
as a no-op. The invariant pinned by tests/test_round13_ops.py: after any
prefix of micro-batches, probing the index equals the in-flight
``phash_pairs`` banding over (base corpus + every payload delivered so
far), restricted to the query ids — cadence, restart, and
compact-mid-stream included.

At 100 TB the feed is the media-ingest landing stream; the index then
answers near-dup image lookups continuously, without ever re-fingerprinting
the corpus.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def stream_phash_maintenance(
    spark: SparkSession,
    payload_dir: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    available_now: bool = True,
    schema=None,
):
    """Maintain a persisted phash band index from a parquet payload-feed
    directory (rows: ``(id_col long, content binary)``). Each discovered
    file becomes one micro-batch handed to ``append_phash_index`` with
    the epoch id as the replay-stable ``batch_id``. The index at
    ``index_path`` must exist (``build_phash_index`` — possibly over an
    empty base corpus). Returns the number of batches applied when
    draining with ``availableNow``, else the streaming query.

    ``schema``: explicit feed schema (StructType or DDL string); when
    omitted, inferred from files already present, falling back to the
    canonical ``(id_col long, content binary)`` shape for an empty or
    not-yet-created feed (the ``stream_cluster_maintenance`` startup
    contract)."""
    from pyspark.errors import AnalysisException

    from execute_sync_spark.functions.multimodal import append_phash_index

    if schema is None:
        try:
            schema = spark.read.parquet(payload_dir).schema
        except AnalysisException:
            schema = f"{id_col} long, content binary"
    hpath = spark._jvm.org.apache.hadoop.fs.Path(payload_dir)
    hpath.getFileSystem(spark._jsc.hadoopConfiguration()).mkdirs(hpath)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload_dir)
        .select(id_col, "content")
    )
    batches = {"n": 0}

    def handle(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        append_phash_index(
            batch_df, index_path, batch_id=f"stream-{batch_id}", id_col=id_col
        )
        batches["n"] += 1

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return batches["n"]
    return writer.start()
