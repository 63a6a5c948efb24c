"""Round-12 operator tests.

1. Streaming-fed incremental clustering (streaming/clusters.py,
   VERDICT r11 task 5): the persisted cluster state driven from a
   Structured Streaming file source survives micro-batch cadence,
   duplicate delivery, and checkpoint-replay restarts, always equal to a
   flat ``connected_components`` over every edge delivered so far.
2. Perceptual-hash payload near-dup (functions/multimodal.py
   byte_grams / payload_simhash / phash_pairs, VERDICT r11 task 4):
   banding exactness vs brute force, edit tolerance, valve behavior.
3. √N kNN recall row (workload.sim_knn_join_sqrt_recall, VERDICT r11
   task 3): contract booleans hold and the underlying recall numbers are
   real (re-derived independently).
"""

import os

import pytest
from pyspark.sql import functions as F

from execute_sync_spark.functions import graph, multimodal
from execute_sync_spark.streaming import stream_cluster_maintenance


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _labels(df):
    return {r.id: r.cluster_id for r in df.collect()}


def _full(spark, pairs):
    return _labels(graph.connected_components(_edges(spark, pairs), "id_a", "id_b"))


def _state_labels(spark, path):
    return _labels(
        spark.read.parquet(os.path.join(path, "labels")).select("id", "cluster_id")
    )


# ---------------------------------------------------------------------------
# streaming-fed incremental clustering


def test_stream_clusters_equals_full(spark, tmp_path):
    """Edge files dropped into a feed dir, drained with availableNow one
    file per micro-batch: the persisted labels equal a flat recompute
    over every edge delivered — including a batch that MERGES two
    components built by earlier batches."""
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    base = [(1, 2), (10, 11), (20, 21)]
    graph.build_cluster_state(_edges(spark, base), state, n_buckets=4)
    drops = [[(2, 3)], [(11, 20)], [(30, 31)]]
    for i, pairs in enumerate(drops):
        _edges(spark, pairs).coalesce(1).write.mode("append").parquet(feed)
    n = stream_cluster_maintenance(spark, feed, state, ck)
    assert n >= 1  # file source may coalesce drops written before start
    seen = base + [p for d in drops for p in d]
    assert _state_labels(spark, state) == _full(spark, seen)


def test_stream_clusters_incremental_restart_and_new_files(spark, tmp_path):
    """Restarting the stream on the same checkpoint re-processes NOTHING
    (exactly-once delivery), and only newly dropped files apply."""
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    graph.build_cluster_state(_edges(spark, [(1, 2)]), state, n_buckets=4)
    _edges(spark, [(2, 3)]).coalesce(1).write.mode("append").parquet(feed)
    stream_cluster_maintenance(spark, feed, state, ck)
    after_first = _state_labels(spark, state)
    assert after_first == _full(spark, [(1, 2), (2, 3)])
    # restart with no new data: no-op
    n2 = stream_cluster_maintenance(spark, feed, state, ck)
    assert n2 == 0
    assert _state_labels(spark, state) == after_first
    # drop a merging file and restart: only the new file applies
    _edges(spark, [(3, 10), (10, 11)]).coalesce(1).write.mode("append").parquet(feed)
    stream_cluster_maintenance(spark, feed, state, ck)
    assert _state_labels(spark, state) == _full(
        spark, [(1, 2), (2, 3), (3, 10), (10, 11)]
    )


def test_stream_clusters_duplicate_delivery_idempotent(spark, tmp_path):
    """The same edge batch delivered twice (two identical files — the
    at-least-once world upstream of the checkpoint) converges to the same
    labels: update_cluster_state replay-heals."""
    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    graph.build_cluster_state(_edges(spark, [(1, 2)]), state, n_buckets=4)
    for _ in range(2):
        _edges(spark, [(2, 3), (3, 4)]).coalesce(1).write.mode("append").parquet(feed)
    stream_cluster_maintenance(spark, feed, state, ck)
    assert _state_labels(spark, state) == _full(spark, [(1, 2), (2, 3), (3, 4)])


# ---------------------------------------------------------------------------
# perceptual-hash payload near-dup


def _binaries(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return multimodal.binary_with_meta(df)


BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the caravan rolls through the dusty town at midnight carrying "
    "spices silk and stories from the far side of the mountains"
)


def test_phash_near_dup_found_unrelated_not(spark):
    """A one-word edit stays within the hamming threshold; an unrelated
    payload does not pair with either."""
    near = BASE.replace("midnight", "noon")
    other = (
        "completely different content about parquet files shuffles and "
        "broadcast joins in a distributed query engine running on many "
        "executors with adaptive execution enabled for skewed workloads"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.phash_pairs(_binaries(spark, [BASE, near, other])).collect()
    }
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)


def test_phash_banding_exact_vs_bruteforce(spark):
    """Banded candidate generation loses NOTHING at the default
    threshold: pairs == brute-force hamming<=PHASH_MAX_HAMMING over all
    payload pairs (the 12-pair covering family is pigeonhole-exact to
    hamming 5: 5 flipped bits leave >= 3 of the 8 primitive bands
    intact, two of them on the same half, so some combo key still
    collides — see multimodal._PHASH_COMBOS)."""
    texts = [BASE]
    texts += [BASE.replace("dusty", w) for w in ("muddy", "sunny", "foggy")]
    texts += [f"unrelated filler number {i} with its own words entirely" for i in range(6)]
    bm = _binaries(spark, texts)
    got = {(r.id_a, r.id_b, r.hamming) for r in multimodal.phash_pairs(bm).collect()}
    ph = {r.doc_id: r.phash for r in multimodal.payload_simhash(bm).collect()}
    want = set()
    ids = sorted(ph)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin((ph[i] ^ ph[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= multimodal.PHASH_MAX_HAMMING:
                    want.add((i, j, d))
    assert want, "fixture lost its planted near-dups"
    assert got == want


def test_phash_short_payload_and_determinism(spark):
    """Payloads shorter than the gram width hash to 0 (and pair with each
    other at hamming 0); the relation is deterministic under
    repartitioning."""
    bm = _binaries(spark, ["ab", "xy", BASE])
    ph = {r.doc_id: r.phash for r in multimodal.payload_simhash(bm).collect()}
    assert ph[0] == 0 and ph[1] == 0
    pairs = {(r.id_a, r.id_b): r.hamming for r in multimodal.phash_pairs(bm).collect()}
    assert pairs[(0, 1)] == 0
    bm8 = _binaries(spark, ["ab", "xy", BASE]).repartition(8)
    assert {
        (r.id_a, r.id_b, r.hamming) for r in multimodal.phash_pairs(bm8).collect()
    } == {(a, b, h) for (a, b), h in pairs.items()}


def test_phash_max_bucket_valve(spark):
    """The max_bucket valve drops oversized band buckets: identical
    payloads all share every band, so a valve below the group size
    removes the candidate pairs entirely."""
    bm = _binaries(spark, [BASE] * 5)
    assert multimodal.phash_pairs(bm).count() == 10  # C(5,2), hamming 0
    assert multimodal.phash_pairs(bm, max_bucket=4).count() == 0


# ---------------------------------------------------------------------------
# √N kNN recall row


def test_knn_sqrt_recall_contract(spark):
    """The gated booleans hold at the test SF, and the recall they
    summarize is real: re-derive edge recall independently from the two
    underlying relations and check it clears the same lift floor."""
    import math

    from execute_sync_spark.functions import similarity
    from execute_sync_spark.plans import workload

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = workload.sim_knn_join_sqrt_recall(spark, sf).collect()
    assert [r.nprobe for r in sorted(rows, key=lambda r: r.nprobe)] == [2, 4, 8]
    assert all(r.recall_lift_ok and r.recall_monotone_ok for r in rows)
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    n = emb.count()
    k_cells = max(8, math.isqrt(n))
    cents = similarity.kmeans_fit_sample(emb, k=k_cells, iters=10)
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in similarity.knn_join_blocked(
            emb.withColumn("__g", F.lit(0)), k=3, block_col="__g"
        ).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in similarity.knn_join_cells(emb, cents, k=3, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 1.5 * 2 / k_cells
    assert len(exact) == 3 * n
