"""Streaming-fed incremental cluster maintenance (VERDICT r11 task 5).

``graph.update_cluster_state`` is batch-incremental: a batch of new
near-dup edges re-solves ONLY the components it touches, via
partition-pruned read-back of the persisted ``{path}/labels`` +
``{path}/edges`` bucket layout. This module drives it from Structured
Streaming the same way the LSH index is streaming-fed
(``streaming/ingest.py`` / ``functions/index_commit.py`` precedent): an
edge feed directory is a file-source stream, and each micro-batch applies
one incremental update inside ``foreachBatch``.

Exactly-once story: the file-source checkpoint gives exactly-once *batch
delivery*; the state update itself is replay-IDEMPOTENT (re-applying a
batch whose edges are already in the canonical edge set touches those
components and re-solves them to the identical labels — the documented
crash-heal property of ``update_cluster_state``), so a crash after the
state write but before the checkpoint commit replays as a no-op. The
invariant pinned by tests/test_round12_ops.py: after any prefix of
micro-batches, the persisted labels equal ``connected_components`` run
flat over every edge delivered so far — micro-batch cadence, duplicate
delivery, and crash replay included.

At 100 TB the edge feed is the near-dup pair stream (LSH/banding output)
and ``n_buckets`` grows with the corpus so each touched-bucket rewrite
stays a few GB; the stream then maintains corpus-wide duplicate clusters
continuously instead of re-clustering petabytes per refresh.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def stream_cluster_maintenance(
    spark: SparkSession,
    edges_dir: str,
    state_path: str,
    checkpoint_dir: str,
    src: str = "id_a",
    dst: str = "id_b",
    available_now: bool = True,
    schema=None,
):
    """Maintain a persisted cluster state from a parquet edge-feed
    directory. Each discovered file becomes one micro-batch handed to
    ``graph.update_cluster_state`` (one file per trigger keeps
    batch==drop parity, mirroring ``stream_sync``). The state at
    ``state_path`` must exist (``graph.build_cluster_state`` — possibly
    over an empty base edge set). Returns the number of batches applied
    when draining with ``availableNow``, else the streaming query.

    ``schema``: explicit edge schema (StructType or DDL string). When
    omitted it is inferred from files already present in the feed, and —
    the routine case of starting the maintenance stream BEFORE the first
    edge file lands (ADVICE r12) — falls back to the canonical
    ``(src long, dst long)`` edge shape instead of throwing on the empty
    or not-yet-created directory."""
    from pyspark.errors import AnalysisException

    from execute_sync_spark.functions.graph import update_cluster_state

    # streaming file sources need an explicit schema; when none is given,
    # infer it once from the files already present (an edge feed is
    # homogeneous by contract), or fall back to the canonical edge shape
    # for an empty/not-yet-created feed
    if schema is None:
        try:
            schema = spark.read.parquet(edges_dir).schema
        except AnalysisException:
            schema = f"{src} long, {dst} long"
    # the maintenance stream owns its watch dir: materialize it when the
    # stream starts before the first edge file lands, or the file source
    # itself throws PATH_NOT_FOUND (Hadoop FS mkdirs — works on any DFS,
    # no-op when present)
    hpath = spark._jvm.org.apache.hadoop.fs.Path(edges_dir)
    hpath.getFileSystem(spark._jsc.hadoopConfiguration()).mkdirs(hpath)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_dir)
        .select(src, dst)
    )
    batches = {"n": 0}

    def handle(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        update_cluster_state(batch_df.sparkSession, state_path, batch_df, src, dst)
        batches["n"] += 1

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return batches["n"]
    return writer.start()
