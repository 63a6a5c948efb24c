"""Streaming-maintained NB quality classifier (round 16 — VERDICT r15
task 4: the ``streaming/mixture.py`` precedent applied to the learned
quality-classifier family shipped in r15).

``curate_quality_classifier`` trains the CCNet/GPT-3-style filter from a
corpus scan; a production filter must RETRAIN AS THE CRAWL LANDS without
re-scanning the corpus per refresh. Naive Bayes makes that exact: the
model is two integer class-frequency tables plus two document counts —
pure sums — so per-batch sufficient statistics summed token-wise
reconstruct the flat-trained model EXACTLY (no SGD state, no ordering
sensitivity). This module maintains those statistics as a persisted
per-batch sidecar — the ``streaming/mixture.py`` layout: one small
parquet dir per ingest batch under ``{path}/tokenstats/batch_id=<id>``
and ``{path}/docstats/batch_id=<id>``, each written with overwrite so a
replayed epoch overwrites ITSELF (value-identical) instead of
double-counting — and rebuilds the model by summing.

Exactly-once story (the streaming/clusters.py contract): the file-source
checkpoint gives exactly-once batch delivery, and the per-batch stats
write is replay-idempotent, so a crash between the stats write and the
checkpoint commit replays as an overwrite of identical rows.

The invariant pinned by tests (tests/test_round16_ops.py): after ANY
prefix of micro-batches, ``score_from_stats`` over the documents
delivered so far equals ``curation.nb_quality_classifier`` run flat over
the same documents — micro-batch cadence, restart, and duplicate
delivery included. The equality is structural, not approximate: both
paths feed the same integer statistics into the ONE shared scoring body
``curation.nb_score_tf`` (tokenized by the ONE shared
``curation.nb_labeled_tf``), the ``mixture_from_counts`` precedent.

At 100 TB the sidecar is (vocabulary x batches) rows of integers —
bounded by compaction or by switching the stats to the hashed-bucket key
(``nb_quality_classifier_hashed``'s 10k-bucket bound applies verbatim;
the sidecar schema is the same two-count shape) — while the corpus-scale
work (tokenization + counting) happens once per batch on the batch only.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_classifier_stats(
    docs: DataFrame,
    positive: Column,
    path: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One batch's NB sufficient statistics: the (token, cp, cn) class
    frequency table under ``tokenstats/batch_id=`` and the 1-row
    (n_pos_docs, n_neg_docs) under ``docstats/batch_id=``. Integer counts
    only — sums of sums reconstruct the flat model exactly. Overwrites
    its own ``batch_id=`` dirs only: replays are idempotent."""
    from execute_sync_spark.functions.curation import nb_labeled_tf, nb_token_freq

    lab, tf = nb_labeled_tf(docs, positive, text_col, id_col)
    nb_token_freq(tf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "tokenstats", f"batch_id={batch_id}")
    )
    lab.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0))
        .cast("long").alias("n_pos_docs"),
        F.sum(F.when(~F.col("__pos"), 1).otherwise(0))
        .cast("long").alias("n_neg_docs"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "docstats", f"batch_id={batch_id}")
    )


def classifier_from_stats(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Rebuild the NB model from the sidecar: per-token integer sums give
    the (token, cp, cn) frequency relation; summed doc counts give the
    1-row (_dp, _dn) prior inputs — both EXACTLY what flat training over
    the union of every batch's documents produces (vocabulary = the union
    vocabulary, since a token sums over only the batches that saw it)."""
    freq = (
        spark.read.parquet(os.path.join(path, "tokenstats"))
        .groupBy("token")
        .agg(F.sum("cp").alias("cp"), F.sum("cn").alias("cn"))
    )
    doc_counts = spark.read.parquet(os.path.join(path, "docstats")).agg(
        F.sum("n_pos_docs").cast("double").alias("_dp"),
        F.sum("n_neg_docs").cast("double").alias("_dn"),
    )
    return freq, doc_counts


def score_from_stats(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` with the stream-maintained model: same output
    contract as ``curation.nb_quality_classifier`` (doc_id, label_hq,
    n_tokens, nb_score, pred_hq), produced by the SAME shared scoring
    body — only the model statistics come from the sidecar instead of an
    inline corpus scan."""
    from execute_sync_spark.functions.curation import nb_labeled_tf, nb_score_tf

    _, tf = nb_labeled_tf(docs, positive, text_col, id_col)
    freq, doc_counts = classifier_from_stats(spark, path)
    return nb_score_tf(tf, freq, doc_counts, id_col)


def stream_classifier_maintenance(
    spark: SparkSession,
    docs_dir: str,
    stats_path: str,
    checkpoint_dir: str,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema=None,
    available_now: bool = True,
):
    """Maintain the classifier-stats sidecar from a parquet document-feed
    directory: each discovered file becomes one micro-batch whose NB
    statistics land under ``batch_id=e<epoch>`` (the epoch id is the
    replay-stable batch key — the streaming/phash.py convention).
    ``positive`` must be an unbound label expression (e.g.
    ``F.col("lang") == "en"``) — it is applied to every micro-batch.
    Start with ``write_classifier_stats(base_docs, positive, path,
    "__base__")`` when a bootstrap corpus predates the stream; starting
    on an empty or not-yet-created feed works (explicit-schema fallback,
    the streaming/clusters.py ADVICE r12 contract)."""
    from pyspark.errors import AnalysisException

    if schema is None:
        try:
            schema = spark.read.parquet(docs_dir).schema
        except AnalysisException:
            schema = f"{id_col} long, {text_col} string, lang string"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        write_classifier_stats(
            batch_df, positive, stats_path, f"e{epoch_id}", text_col, id_col
        )

    # trigger only under available_now (the streaming/mixture.py pattern,
    # ADVICE r14): a caller asking for continuous maintenance must get a
    # live query, not a drain-and-stop one
    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
