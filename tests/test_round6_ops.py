"""Behavioral tests for the late-round-6 operators: SemDeDup semantic
dedup, product-quantization ANN, and the corpus-self unigram LM scorer.
(The driver-gate oracle equivalence for all three is covered by
tests/test_workload.py; these pin the semantics on hand-built inputs.)"""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# semantic dedup


def test_semantic_dedup_keeps_lowest_id(spark):
    from execute_sync_spark.functions import similarity

    # two well-separated clusters; ids 10/11/12 are near-identical around
    # centroid A, 20/21 around centroid B but dissimilar to each other
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 10 -> dropped
        (12, [0.7, 0.7, 0.0, 0.0]),  # same cell, below threshold -> kept
        (20, [0.0, 0.0, 1.0, 0.0]),
        (21, [0.0, 0.0, 0.0, 1.0]),  # other cell, orthogonal -> kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.cell_id, r.kept)
        for r in similarity.semantic_dedup(emb, cents, threshold=0.9).collect()
    }
    assert out[10] == (0, True)
    assert out[11] == (0, False)  # cos(10,11) ~ 1.0 >= 0.9, lower id exists
    assert out[12][1] is True  # cos to 10/11 ~ 0.707 < 0.9
    assert out[20] == (1, True)
    assert out[21] == (1, True)  # orthogonal to 20


def test_semantic_dedup_verdict_is_per_row_independent(spark):
    """The max-over-earlier-points rule: a dropped doc still drops its
    later near-dups (a chain 0~1~2 with cos(0,2) also high drops BOTH 1
    and 2 — verdicts don't depend on processing order)."""
    from execute_sync_spark.functions import similarity

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.02]),
        (2, [0.998, 0.04]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = {r.vec_id: r.kept for r in similarity.semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert out == {0: True, 1: False, 2: False}


# ---------------------------------------------------------------------------
# product quantization


def _toy_vectors(spark, dim=8, n=40):
    import numpy as np

    rng = np.random.RandomState(11)
    V = rng.randn(n, dim).round(3)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        V.astype(float),
    )


def test_pq_codebook_vectors_encode_to_themselves(spark):
    """A sample vector's sub-slices are codewords, so encoding the sample
    must assign each row its own code in every subspace (self-distance 0)."""
    import numpy as np
    from execute_sync_spark.functions import similarity

    emb, _ = _toy_vectors(spark)
    sample = emb.filter(F.col("vec_id") < similarity.PQ_M * 2)  # 8 codewords
    cb = similarity.pq_codebook(sample)
    codes = {
        r.vec_id: list(r.codes)
        for r in similarity.pq_encode(sample, cb).collect()
    }
    for vid, cs in codes.items():
        assert cs == [vid] * similarity.PQ_M
    assert cb.shape == (similarity.PQ_M, 8, 8 // similarity.PQ_M)
    assert not np.isnan(cb).any()


def test_pq_topk_matches_numpy_reference(spark):
    """End-to-end ADC against an independent numpy implementation."""
    import numpy as np
    from execute_sync_spark.functions import similarity

    emb, V = _toy_vectors(spark)
    m = similarity.PQ_M
    dsub = V.shape[1] // m
    cb_sample = emb.filter(F.col("vec_id") < 16)
    cb = similarity.pq_codebook(cb_sample)
    codes_df = similarity.pq_encode(emb, cb)
    got = (
        similarity.pq_topk(codes_df, emb.filter(F.col("vec_id") < 3), cb, k=4)
        .orderBy("query_id", "rank")
        .collect()
    )

    # reference: encode + ADC in plain numpy (same rounding contract)
    C = V[:16].reshape(16, m, dsub).transpose(1, 0, 2)
    codes = np.empty((len(V), m), dtype=int)
    for j in range(m):
        d2 = ((V[:, None, j * dsub:(j + 1) * dsub] - C[j][None]) ** 2).sum(-1)
        codes[:, j] = np.argmin(np.round(d2, 6), axis=1)
    for qid in range(3):
        lut = np.stack(
            [((V[qid, j * dsub:(j + 1) * dsub] - C[j]) ** 2).sum(-1) for j in range(m)]
        )
        D = np.round(lut[np.arange(m), codes].sum(1), 4)
        order = sorted((float(D[i]), i) for i in range(len(V)) if i != qid)[:4]
        mine = [(r.neighbor_id, r.adc_dist) for r in got if r.query_id == qid]
        assert mine == [(i, d) for d, i in order]


def test_pq_topk_excludes_self_and_ranks_dense(spark):
    from execute_sync_spark.functions import similarity

    emb, _ = _toy_vectors(spark)
    cb = similarity.pq_codebook(emb.filter(F.col("vec_id") < 16))
    out = similarity.pq_topk(
        similarity.pq_encode(emb, cb), emb.filter(F.col("vec_id") < 5), cb, k=3
    ).collect()
    assert len(out) == 15
    for r in out:
        assert r.neighbor_id != r.query_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())


# ---------------------------------------------------------------------------
# unigram LM score


def test_unigram_logprob_hand_computed(spark):
    from execute_sync_spark.functions import text

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.unigram_logprob(docs).collect()}
    # corpus: a=2, b=2, c=1, total=5
    d0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    d1 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out[0].n_tokens == 3
    assert out[1].n_tokens == 2
    assert out[0].avg_logprob == pytest.approx(round(d0, 6), abs=1e-6)
    assert out[1].avg_logprob == pytest.approx(round(d1, 6), abs=1e-6)
    assert out[0].ppl_proxy == pytest.approx(round(math.exp(-d0), 4), abs=1e-4)
    # the all-common-words doc is "more typical" => higher avg logprob
    assert out[0].avg_logprob > out[1].avg_logprob


def test_unigram_logprob_empty_and_whitespace_docs(spark):
    from execute_sync_spark.functions import text

    docs = spark.createDataFrame(
        [(0, "x y"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text.unigram_logprob(docs).collect()}
    # token-free docs drop from the output (nothing to score), like the oracle
    assert set(out) == {0}
    assert out[0].n_tokens == 2


# ---------------------------------------------------------------------------
# BM25 retrieval


def test_bm25_hand_computed(spark):
    from execute_sync_spark.functions import text

    docs = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"), (2, "dog dog dog dog")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.bm25_topk(docs, ["apple", "banana"], k=10).collect()}
    # doc 2 matches nothing -> absent; doc 0 matches both terms
    assert set(out) == {0, 1}
    assert out[0].n_terms_hit == 2 and out[1].n_terms_hit == 1
    # independent reference computation
    N, avgdl = 3.0, (3 + 2 + 4) / 3
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log((N - df + 0.5) / (df + 0.5) + 1)

    def ts(tf, dl, df):
        return idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    d0 = ts(2, 3, 1) + ts(1, 3, 2)  # apple tf=2 df=1; banana tf=1 df=2
    d1 = ts(1, 2, 2)
    assert out[0].score == pytest.approx(round(d0, 6), abs=1e-6)
    assert out[1].score == pytest.approx(round(d1, 6), abs=1e-6)
    assert out[0].rank == 1 and out[1].rank == 2


def test_bm25_rare_term_outscores_common(spark):
    """idf must favor the rarer term at equal tf/dl."""
    from execute_sync_spark.functions import text

    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(9)] + [(9, "rare filler")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in text.bm25_topk(docs, ["common", "rare"], k=20).collect()}
    assert out[9] > out[0]


# ---------------------------------------------------------------------------
# time-series gap fill


def test_gapfill_dense_spine_and_locf(spark, tmp_path):
    import os

    from execute_sync_spark.plans import workload

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
            (2, "2024-01-01 03:20:00", 1, "click", 3.0, "{}"),
            (3, "2024-01-01 01:00:00", 2, "view", 5.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path)
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    rows = workload.q_gapfill_timeseries(spark, sf).collect()
    # spine: 2 types x 4 hours (00..03)
    assert len(rows) == 8
    click = sorted(
        [r for r in rows if r.event_type == "click"], key=lambda r: r.bucket_start
    )
    assert [r.n_events for r in click] == [1, 0, 0, 1]
    # LOCF carries hour-0's sum through the empty hours 1-2
    assert [r.locf_sum for r in click] == [2.0, 2.0, 2.0, 3.0]
    view = sorted([r for r in rows if r.event_type == "view"], key=lambda r: r.bucket_start)
    # leading gap before the first observation stays NULL
    assert [r.locf_sum for r in view] == [None, 5.0, 5.0, 5.0]


# ---------------------------------------------------------------------------
# cohort retention


def test_cohort_retention_hand_computed(spark, tmp_path):
    import os

    from execute_sync_spark.plans import workload

    # users 1,2 first seen week of 2024-01-01 (Mon); user 1 returns week+1;
    # user 3 first seen week+1
    ev = spark.createDataFrame(
        [
            (1, "2024-01-02 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-03 10:00:00", 2, "click", 1.0, "{}"),
            (3, "2024-01-09 10:00:00", 1, "view", 1.0, "{}"),
            (4, "2024-01-10 10:00:00", 3, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf = str(tmp_path)
    ev.write.parquet(os.path.join(sf, "events.parquet"))
    rows = {
        (r.cohort_week, r.week_no): (r.n_active, r.cohort_n, r.retention)
        for r in workload.q_cohort_retention(spark, sf).collect()
    }
    assert rows[("2024-01-01", 0)] == (2, 2, 1.0)
    assert rows[("2024-01-01", 1)] == (1, 2, 0.5)
    assert rows[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(rows) == 3


# ---------------------------------------------------------------------------
# production-path compositions


def test_semantic_dedup_with_kmeans_centroids(spark):
    """The declared query uses fixed centroids for oracle stability; the
    production path feeds kmeans_fit centroids in — same contract: one
    verdict per vector, and within every cell the lowest surviving id is
    always kept."""
    from tests.conftest import SF_DIR

    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = similarity.kmeans_fit(emb, k=4, iters=2)
    out = similarity.semantic_dedup(emb, cents, threshold=0.35).collect()
    assert len(out) == emb.count()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)
    for rows in by_cell.values():
        lowest = min(r.vec_id for r in rows)
        assert next(r.kept for r in rows if r.vec_id == lowest) is True


def test_ivfpq_with_all_cells_probed_equals_plain_pq(spark):
    """With nprobe = |cells| the coarse quantizer prunes nothing, so IVF+PQ
    must return exactly plain PQ-ADC's answer — the composition only ever
    REMOVES candidates."""
    from execute_sync_spark.functions import similarity

    emb, _ = _toy_vectors(spark)
    cents = emb.filter(F.col("vec_id") < 3)
    cb = similarity.pq_codebook(emb.filter(F.col("vec_id") < 16))
    queries = emb.filter(F.col("vec_id") < 4)
    full = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in similarity.pq_topk(
            similarity.pq_encode(emb, cb), queries, cb, k=3
        ).collect()
    }
    ivfpq = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_dist)
        for r in similarity.ivfpq_topk(emb, queries, cents, cb, k=3, nprobe=3).collect()
    }
    assert ivfpq == full


def test_ivfpq_prunes_to_probed_cells(spark):
    """With nprobe=1 every neighbor must share the query's own cell."""
    from execute_sync_spark.functions import similarity

    emb, _ = _toy_vectors(spark)
    cents = emb.filter(F.col("vec_id") < 3)
    cb = similarity.pq_codebook(emb.filter(F.col("vec_id") < 16))
    queries = emb.filter(F.col("vec_id") < 4)
    cells = {
        r.vec_id: r.cell_id
        for r in similarity.assign_cells(emb, cents).collect()
    }
    out = similarity.ivfpq_topk(emb, queries, cents, cb, k=5, nprobe=1).collect()
    assert out
    for r in out:
        assert cells[r.neighbor_id] == cells[r.query_id]


def test_pq_train_beats_sample_slice_codebook(spark):
    """The trained codebook must quantize the corpus with LOWER mean squared
    reconstruction error than the sample-slice codebook (that is its whole
    point), and plug into the same encode/search pipeline."""
    import numpy as np
    from execute_sync_spark.functions import similarity

    emb, V = _toy_vectors(spark, dim=8, n=40)
    m, dsub = similarity.PQ_M, 8 // similarity.PQ_M

    def mse(cb):
        err = 0.0
        codes = {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, cb).collect()}
        for vid, cs in codes.items():
            for j, c in enumerate(cs):
                err += ((V[vid, j * dsub:(j + 1) * dsub] - cb[j][c]) ** 2).sum()
        return err / len(codes)

    naive = similarity.pq_codebook(emb.filter(F.col("vec_id") < 8))
    trained = similarity.pq_train(emb, k_codes=8, iters=8)
    assert trained.shape == naive.shape == (m, 8, dsub)
    assert mse(trained) < mse(naive)
    # and search still works end-to-end on the trained codebook
    out = similarity.pq_topk(
        similarity.pq_encode(emb, trained), emb.filter(F.col("vec_id") < 2), trained, k=3
    ).collect()
    assert len(out) == 6


def test_semantic_scores_derive_any_threshold(spark):
    """One score pass must reproduce semantic_dedup's verdicts for EVERY
    threshold (the sweep contract), on the real test corpus."""
    from tests.conftest import SF_DIR

    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8)
    scores = {
        r.vec_id: r.max_lower_sim
        for r in similarity.semantic_dedup_scores(emb, cents).collect()
    }
    for t in (0.2, 0.35, 0.45):
        verdicts = {
            r.vec_id: r.kept
            for r in similarity.semantic_dedup(emb, cents, threshold=t).collect()
        }
        derived = {
            vid: (s is None or s < t) for vid, s in scores.items()
        }
        assert derived == verdicts, t
