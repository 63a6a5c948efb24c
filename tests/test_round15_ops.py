"""Round-15 tests: ADVICE r14 pinning tests + the round's new operators.

Each ADVICE item is closed with a test that would FAIL on the pre-fix
code (the r13/r14 precedent), not just a patch.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r14 (medium): stream_mixture_maintenance(available_now=False) must
# return a CONTINUOUS maintenance stream, not a drain-and-stop query.


def test_stream_mixture_continuous_mode(spark, tmp_path):
    """available_now=False: the query keeps running after draining the
    currently available files (the pre-fix code hard-coded
    .trigger(availableNow=True), which terminates after the drain)."""
    from execute_sync_spark.streaming.mixture import (
        mixture_from_stats,
        stream_mixture_maintenance,
        write_mixture_stats,
    )

    feed = str(tmp_path / "feed")
    stats = str(tmp_path / "stats")
    os.makedirs(feed)
    docs = spark.createDataFrame(
        [(1, "alpha beta", "src0")], "doc_id long, text string, source string"
    )
    write_mixture_stats(docs, stats, "__base__")
    docs.coalesce(1).write.mode("append").parquet(feed)

    q = stream_mixture_maintenance(
        spark, feed, stats, str(tmp_path / "ck"), available_now=False
    )
    try:
        q.processAllAvailable()
        # a drain-and-stop (availableNow) query is terminated here; a
        # continuous one is still active awaiting new files
        assert q.isActive
        # and it really did process the available file
        rows = {tuple(r) for r in mixture_from_stats(spark, stats).collect()}
        assert rows  # non-empty mixture from base + batch stats
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# ADVICE r14 (low): the 12-pair covering band family is exact only at
# hamming <= PHASH_MAX_HAMMING — wider requests must fail loudly.


def test_phash_max_hamming_guard(spark):
    from execute_sync_spark.functions import multimodal as mm

    binaries = spark.createDataFrame(
        [(1, bytearray(b"abcdefgh"))], "doc_id long, content binary"
    )
    with pytest.raises(ValueError, match="covering band family"):
        mm.phash_pairs(binaries, max_hamming=mm.PHASH_MAX_HAMMING + 1)
    with pytest.raises(ValueError, match="covering band family"):
        mm.phash_neighbors_indexed(
            spark, "/nonexistent", binaries,
            max_hamming=mm.PHASH_MAX_HAMMING + 1,
        )
    # the documented boundary itself stays allowed
    assert (
        mm.phash_pairs(binaries, max_hamming=mm.PHASH_MAX_HAMMING).count() == 0
    )


# ---------------------------------------------------------------------------
# ADVICE r14 (low): minhash_signatures accepts a precomputed shingles
# relation (the ngram_jaccard_pairs contract) so minhash_estimate_vs_true's
# one-shingle-pass docstring is physically true.


def test_minhash_signatures_shingles_param(spark):
    from execute_sync_spark.functions import dedupe

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    sh = dedupe.word_shingles(docs)
    via_param = dedupe.minhash_signatures(docs, shingles=sh)
    rederived = dedupe.minhash_signatures(docs)
    assert sorted(map(tuple, via_param.collect())) == sorted(
        map(tuple, rederived.collect())
    )
    # the threaded relation is really what gets aggregated: a doctored
    # shingle set must change the signature (i.e. the param is not ignored)
    doctored = dedupe.minhash_signatures(
        docs, shingles=sh.filter(F.col("doc_id") != 3)
    )
    assert doctored.filter(F.col("doc_id") == 3).count() == 0


# ---------------------------------------------------------------------------
# round-15 new op: NB quality classifier (exact + hashed production twin)


def test_nb_classifier_hashed_agreement(spark):
    """The hashed-vocabulary twin must (a) classify non-degenerately and
    (b) agree with the exact form on the vast majority of documents —
    the dsir_weights_hashed collision-error story applied to NB. Pinned
    on the sf0.001 corpus (500-doc fixture scale is the gate's job)."""
    from execute_sync_spark.functions import curation
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pos = F.col("lang") == "en"
    exact = curation.nb_quality_classifier(docs, pos).select(
        "doc_id", F.col("pred_hq").alias("p_exact")
    )
    hashed = curation.nb_quality_classifier_hashed(docs, pos).select(
        "doc_id", F.col("pred_hq").alias("p_hashed"), "nb_score"
    )
    j = exact.join(hashed, "doc_id")
    n = j.count()
    assert n > 0
    agree = j.filter(F.col("p_exact") == F.col("p_hashed")).count()
    assert agree / n >= 0.9, f"hashed/exact agreement {agree}/{n}"
    # non-degenerate: both predicted classes appear
    preds = {r.p_hashed for r in j.select("p_hashed").distinct().collect()}
    assert preds == {True, False}
