"""Streaming-maintained Stupid-Backoff language model (round 16 second
wave — the third streaming twin after ``streaming/mixture.py`` (r14) and
``streaming/classifier.py`` (r16): the same per-batch-integer-sidecar +
one-shared-scoring-body recipe applied to the ``text_backoff_lm``
family).

A production perplexity filter retrains its LM as the crawl lands.
Stupid Backoff (Brants et al. 2007) makes that exact the same way Naive
Bayes did: the entire model is three integer n-gram count tables — pure
sums — and n-grams never cross a document (the lag window is per-doc),
so they never cross a batch; per-batch counts summed key-wise
reconstruct the flat-trained model EXACTLY. No discounting pass, no
normalization state — the property that made Stupid Backoff the
MapReduce-era choice is precisely the property that makes it
streamable.

Sidecar layout (the ``streaming/classifier.py`` convention): one small
parquet dir per ingest batch under ``{path}/unigrams/batch_id=<id>``,
``bigrams/...``, ``trigrams/...``, each written with overwrite so a
replayed epoch overwrites ITSELF (value-identical) instead of
double-counting. Exactly-once story unchanged: file-source checkpoint
for batch delivery + replay-idempotent stats writes.

The invariant pinned by tests (tests/test_round16b_ops.py): after ANY
prefix of micro-batches, ``score_from_lm_stats`` over documents equals
``text.backoff_lm`` trained flat on the same delivered train slice —
cadence, restart, and duplicate delivery included. Structural equality:
both paths feed integer counts into the ONE shared
``text.backoff_lm_score`` body over the ONE shared
``text.backoff_lm_grams`` relation.

At 100 TB the sidecar is (n-gram vocabulary × batches) rows of
integers — the trigram table dominates, exactly as in the Brants
serving layout; compaction is a key-wise re-sum (associative), and the
scoring joins stay sharded n-gram-key equi-joins.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_lm_stats(
    docs: DataFrame,
    path: str,
    batch_id: str,
    train_filter: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One batch's Stupid-Backoff sufficient statistics: the integer
    unigram/bigram/trigram count tables of the batch's train slice,
    each under its own ``batch_id=`` dir. Overwrites its own dirs only:
    replays are idempotent."""
    from execute_sync_spark.functions.text import backoff_lm_counts, backoff_lm_grams

    g = backoff_lm_grams(docs, train_filter, text_col, id_col)
    uni, bi, tri = backoff_lm_counts(g)
    for name, df in (("unigrams", uni), ("bigrams", bi), ("trigrams", tri)):
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, name, f"batch_id={batch_id}")
        )


def lm_from_stats(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Rebuild the model from the sidecar: key-wise integer sums per
    order — exactly what flat training over the union of every batch's
    train documents produces (an n-gram sums over only the batches that
    saw it, and n-grams never span documents)."""
    uni = (
        spark.read.parquet(os.path.join(path, "unigrams"))
        .groupBy("w")
        .agg(F.sum("c1").alias("c1"))
    )
    bi = (
        spark.read.parquet(os.path.join(path, "bigrams"))
        .groupBy("w1", "w")
        .agg(F.sum("c2").alias("c2"))
    )
    tri = (
        spark.read.parquet(os.path.join(path, "trigrams"))
        .groupBy("w2", "w1", "w")
        .agg(F.sum("c3").alias("c3"))
    )
    return uni, bi, tri


def score_from_lm_stats(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    alpha: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score ``docs`` with the stream-maintained LM: same output contract
    as ``text.backoff_lm`` (doc_id, n_tokens, avg_logprob, ppl_proxy,
    n_backoff, n_oov), produced by the SAME shared scoring body — only
    the count relations come from the sidecar instead of an inline
    corpus aggregation."""
    from execute_sync_spark.functions.text import backoff_lm_grams, backoff_lm_score

    g = backoff_lm_grams(docs, None, text_col, id_col)
    uni, bi, tri = lm_from_stats(spark, path)
    return backoff_lm_score(g, uni, bi, tri, alpha=alpha, id_col=id_col)


def stream_lm_maintenance(
    spark: SparkSession,
    docs_dir: str,
    stats_path: str,
    checkpoint_dir: str,
    train_filter: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema=None,
    available_now: bool = True,
):
    """Maintain the LM-stats sidecar from a parquet document-feed
    directory: each discovered file becomes one micro-batch whose n-gram
    statistics land under ``batch_id=e<epoch>`` (the epoch id is the
    replay-stable batch key). ``train_filter`` must be an unbound
    expression (e.g. ``F.col("source") != "src0"``) applied per batch.
    Starting on an empty or not-yet-created feed works (explicit-schema
    fallback, the streaming/clusters.py ADVICE r12 contract); a caller
    asking for continuous maintenance (``available_now=False``) gets a
    live query (the ADVICE r14 contract)."""
    from pyspark.errors import AnalysisException

    if schema is None:
        try:
            schema = spark.read.parquet(docs_dir).schema
        except AnalysisException:
            schema = f"{id_col} long, {text_col} string, source string"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        write_lm_stats(
            batch_df, stats_path, f"e{epoch_id}", train_filter, text_col, id_col
        )

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
