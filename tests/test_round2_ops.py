"""Behavioral invariants for the round-2 operators (beyond the oracle
equality the driver gate already checks)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _emb(spark):
    import os
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_lsh_topk_recall_vs_exact(spark):
    """OR-amplified ANN must (a) agree with the exact ranker on the cosine of
    any pair both return, and (b) recover a solid fraction of true top-5
    neighbors: 6 tables x 4 bits captures a weakly-similar pair with
    p = 1-(1-(1-theta/pi)^4)^6 ~ 0.5-0.7 on this corpus."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, q, k=5).collect()
    approx = similarity.lsh_topk(emb, q, k=5).collect()
    exact_pairs = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id): r.cos_sim for r in approx}
    # agreement: any ANN pair also scored by exact search has the same cosine
    for pair, sim in approx_pairs.items():
        if pair in exact_pairs:
            assert exact_pairs[pair] == sim
    hits = len(set(exact_pairs) & set(approx_pairs))
    assert hits / len(exact_pairs) >= 0.4, f"recall {hits}/{len(exact_pairs)}"


def test_pack_sequences_invariants(spark):
    """Every doc is packed exactly once; within a shard, packs are dense
    (0..max) and every pack except possibly the last stays under budget +
    one document (contiguous binning can overshoot by at most the doc that
    crosses the boundary)."""
    from execute_sync_spark.plans import workload

    out = workload.curate_pack_sequences(spark, SF_DIR).collect()
    docs = {r.doc_id for r in out}
    assert len(docs) == len(out)  # one row per doc
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        packs = sorted({r.pack_id for r in rows})
        assert packs == list(range(len(packs))), f"shard {shard} packs not dense"
        # replay the running total: pack boundary logic holds
        cum = 0
        for r in rows:
            assert r.pack_id == cum // 2048
            cum += r.n_tokens


def test_stream_dedup_is_exact(spark):
    """The twice-replayed stream dedups back to exactly the original events."""
    from execute_sync_spark.plans import workload

    out = workload.stream_dedup(spark, SF_DIR)
    ev = workload._events(spark, SF_DIR)
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


def test_change_feed_actions_partition_the_current_keys(spark):
    """insert + update + unchanged = all current document keys; inserts are
    exactly the keys absent from the as-of snapshot."""
    from execute_sync_spark.operators import dedup as dedup_ops
    from execute_sync_spark.plans import workload

    feed = workload.d2_change_feed(spark, SF_DIR)
    landing = workload._derived_landing(spark, SF_DIR)
    cur_keys = dedup_ops.latest(landing).select("type", "id").distinct()
    old_keys = (
        dedup_ops.latest(landing.filter(F.col("batch_date") <= workload._ASOF_CUTOFF))
        .select("type", "id")
        .distinct()
    )
    inserts = feed.filter(F.col("change") == "insert").select("type", "id")
    expected_inserts = cur_keys.exceptAll(old_keys)
    assert inserts.exceptAll(expected_inserts).count() == 0
    assert expected_inserts.exceptAll(inserts).count() == 0
    # every feed row references a current key
    assert feed.join(cur_keys, ["type", "id"], "left_anti").count() == 0


def test_lsh_topk_vectorized_matches_expression_twin(spark):
    """The BLAS path and the pure-DataFrame path must emit identical rows
    (same buckets, same rounded cosines, same ranks)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, similarity.lsh_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, similarity.lsh_topk_vectorized(emb, q, k=5).collect()))
    assert a == b


def test_quantized_topk_vectorized_matches_expression_twin(spark):
    """Round-5 BLAS promotion of the declared sim_quantized_topk path: the
    batch-matrix form and the HOF-expression form must emit identical rows
    (same neighbors, same HALF_UP-rounded scores, same ranks)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    quant = similarity.quantize_embeddings(emb)
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, similarity.quantized_topk(quant, q, k=5).collect()))
    b = sorted(map(tuple, similarity.quantized_topk_vectorized(quant, q, k=5).collect()))
    assert a == b


def test_ivf_topk_vectorized_matches_expression_twin(spark):
    """Round-5 BLAS promotion of the declared sim_ivf_topk path: inline
    assignment + in-cell scoring must reproduce the expression form exactly
    (same cells, same neighbors, same rounded scores, same ranks)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    centroids = emb.filter(F.col("vec_id") < 8)
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, similarity.ivf_topk(emb, q, centroids, k=3).collect()))
    b = sorted(map(tuple, similarity.ivf_topk_vectorized(emb, q, centroids, k=3).collect()))
    assert a == b


def test_range_search_vectorized_matches_expression_form(spark):
    """Round-5 BLAS promotion of sim_range_search: the batch-matrix form
    must reproduce the expression crossJoin form exactly (same matches,
    same HALF_UP-rounded scores; threshold applied to the ROUNDED score in
    both)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    qe = q.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").cast("array<double>").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").cast("array<double>").alias("cv"))
    expr = (
        c.crossJoin(F.broadcast(qe))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.round(similarity.cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.25)
    )
    a = sorted(map(tuple, expr.collect()))
    b = sorted(map(tuple, similarity.range_search_vectorized(emb, q, 0.25).collect()))
    assert a == b


def test_ivf_multiprobe_dominates_single_probe(spark):
    """nprobe=2 searches a superset of nprobe=1's candidates, so each
    query's rank-i score must be >= the single-probe rank-i score."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    centroids = emb.filter(F.col("vec_id") < 8)
    q = emb.filter(F.col("vec_id") < 10)
    single = similarity.ivf_topk_vectorized(emb, q, centroids, k=3, nprobe=1).collect()
    multi = similarity.ivf_topk_vectorized(emb, q, centroids, k=3, nprobe=2).collect()
    s1 = {(r.query_id, r.rank): r.cos_sim for r in single}
    s2 = {(r.query_id, r.rank): r.cos_sim for r in multi}
    assert s1 and set(s1) <= set(s2)
    assert all(s2[key] >= s1[key] for key in s1)


def test_lsh_multiprobe_dominates_single_probe(spark):
    """Hamming-1 probing must be a candidate-superset of single-probe: equal
    or better recall against the exact ranker (measured 98% vs 66%)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_topk(emb, q, k=5).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in similarity.lsh_topk_vectorized(emb, q, k=5).collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in similarity.lsh_topk_vectorized(emb, q, k=5, multiprobe=True).collect()}
    assert len(exact & multi) >= len(exact & single)
    assert len(exact & multi) / len(exact) >= 0.8


def test_quantized_topk_tracks_exact_ranking(spark):
    """int8 quantization must barely perturb the ranking: top-5 sets from
    the quantized ranker recover >= 80% of the exact float top-5, and each
    shared pair's quantized cosine is within 0.02 of the float cosine
    (per-dim rounding error is <= 1/254 of the max-magnitude component)."""
    from execute_sync_spark.functions import similarity

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in similarity.cosine_topk(emb, q, k=5).collect()}
    quant = {(r.query_id, r.neighbor_id): r.cos_sim_q
             for r in similarity.quantized_topk(
                 similarity.quantize_embeddings(emb), q, k=5).collect()}
    hits = set(exact) & set(quant)
    assert len(hits) / len(exact) >= 0.8, f"recall {len(hits)}/{len(exact)}"
    for pair in hits:
        assert abs(exact[pair] - quant[pair]) <= 0.02, (pair, exact[pair], quant[pair])


def test_zero_vector_scores_null_and_ranks_last_on_both_paths(spark):
    """Zero-vector contract (ADVICE r5): an all-zero embedding scores NULL
    cosine and ranks LAST under DESC on every path — the expression path's
    CASE-guarded division (bare 0/0 throws under Spark 4 ANSI), the BLAS
    twin (NaN becomes NULL through the Arrow round-trip; np.lexsort already
    sorts NaN last), and the DuckDB oracle (0.0/0.0 IS NULL, default NULLS
    LAST). Pinned here so the three paths can't silently diverge on ranks
    when a corpus contains a zero vector."""
    from execute_sync_spark.functions import similarity

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.5, 0.5, 0.0, 0.0]),
        (4, [0.1, 0.9, 0.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 0.0]),  # zero vector: cosine NULL vs everything
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2)

    # k=3: the NULL-scored neighbor must be EXCLUDED (enough non-null rows)
    a3 = sorted(map(repr, map(tuple, similarity.cosine_topk(emb, q, k=3).collect())))
    b3 = sorted(map(repr, map(tuple, similarity.cosine_topk_vectorized(emb, q, k=3).collect())))
    assert a3 == b3
    assert not any(", 5," in r for r in a3), a3

    # k=5: all 5 candidates kept — the zero vector appears at the BOTTOM
    # rank with a NULL score, identically on both paths
    a5 = similarity.cosine_topk(emb, q, k=5)
    b5 = similarity.cosine_topk_vectorized(emb, q, k=5)
    assert sorted(map(repr, map(tuple, a5.collect()))) == sorted(
        map(repr, map(tuple, b5.collect()))
    )
    for df in (a5, b5):
        last = df.filter(F.col("rank") == 5).collect()
        assert len(last) == 2 and all(
            r.neighbor_id == 5 and r.cos_sim is None for r in last
        ), last
