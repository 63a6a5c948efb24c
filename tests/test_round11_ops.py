"""Round-11 operator tests: incremental cluster-state maintenance
(functions/graph.py build_cluster_state / update_cluster_state).

The contract under test: after ANY sequence of batch updates the persisted
labels equal a full recompute over the union of all edge sets, updates
rewrite only the touched label buckets, and replays are no-ops. The
driver-gated query (graph_clusters_incremental) pins the same contract
against the DuckDB closure oracle; these tests pin the state machinery on
adversarial shapes the corpus data doesn't produce.
"""

import os

from pyspark.sql import functions as F

from execute_sync_spark.functions import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _labels(df):
    return {r.id: r.cluster_id for r in df.collect()}


def _full(spark, pairs):
    return _labels(graph.connected_components(_edges(spark, pairs), "id_a", "id_b"))


def test_incremental_equals_full_over_batches(spark, tmp_path):
    """Three successive batches; after each update the state equals a
    full recompute over every edge seen so far."""
    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    batches = [
        [(3, 4)],            # grow cluster {1,2,3}
        [(11, 20)],          # MERGE clusters {10,11} and {20,21}
        [(30, 31), (31, 32)] # brand-new component, all-new nodes
    ]
    path = str(tmp_path / "state")
    graph.build_cluster_state(_edges(spark, base), path, n_buckets=4)
    seen = list(base)
    for b in batches:
        out = graph.update_cluster_state(spark, path, _edges(spark, b))
        seen += b
        assert _labels(out) == _full(spark, seen)


def test_incremental_merge_relabels_to_global_min(spark, tmp_path):
    """A bridging edge merges two persisted components; every member of
    both must re-label to the merged component's global minimum."""
    path = str(tmp_path / "state")
    graph.build_cluster_state(_edges(spark, [(5, 6), (1, 2)]), path, n_buckets=4)
    out = _labels(graph.update_cluster_state(spark, path, _edges(spark, [(2, 5)])))
    assert out == {1: 1, 2: 1, 5: 1, 6: 1}


def test_incremental_replay_is_noop(spark, tmp_path):
    path = str(tmp_path / "state")
    graph.build_cluster_state(_edges(spark, [(1, 2)]), path, n_buckets=4)
    first = _labels(graph.update_cluster_state(spark, path, _edges(spark, [(2, 3)])))
    again = _labels(graph.update_cluster_state(spark, path, _edges(spark, [(2, 3)])))
    assert first == again == {1: 1, 2: 1, 3: 1}


def test_incremental_empty_batch_returns_state_unchanged(spark, tmp_path):
    path = str(tmp_path / "state")
    graph.build_cluster_state(_edges(spark, [(1, 2)]), path, n_buckets=4)
    out = _labels(graph.update_cluster_state(spark, path, _edges(spark, [])))
    assert out == {1: 1, 2: 1}


def test_incremental_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB claim in the docstring: an update's label rewrite is
    bucket-scoped. Build many well-separated components across buckets,
    touch ONE, and assert every file of every untouched bucket partition
    is physically identical (same names — dynamic overwrite never ran
    there)."""
    path = str(tmp_path / "state")
    base = [(i, i + 1) for i in range(0, 1000, 10)]  # 100 two-node components
    graph.build_cluster_state(_edges(spark, base), path, n_buckets=8)
    labels_dir = os.path.join(path, "labels")

    def files_by_bucket():
        out = {}
        for b in os.listdir(labels_dir):
            if b.startswith("bucket="):
                out[b] = sorted(os.listdir(os.path.join(labels_dir, b)))
        return out

    before = files_by_bucket()
    out = graph.update_cluster_state(spark, path, _edges(spark, [(1, 500)]))
    # correctness first: merged component labels to the global min
    lab = _labels(out)
    assert lab[500] == lab[501] == lab[0] == lab[1] == 0
    after = files_by_bucket()
    # the two touched components' buckets (plus the merged label's) may
    # change; every other bucket must be byte-identical by file listing
    changed = {b for b in before if before[b] != after.get(b)}
    import pyspark.sql.functions as F2

    touched_labels = {0, 500}
    touched_buckets = {
        f"bucket={r.b}"
        for r in spark.createDataFrame(
            [(x,) for x in touched_labels], "cluster_id long"
        ).select(F2.pmod(F2.xxhash64("cluster_id"), F2.lit(8)).cast("int").alias("b")).collect()
    }
    assert changed <= touched_buckets, (changed, touched_buckets)
    assert len(changed) < len(before)  # most buckets untouched


def test_incremental_crash_window_heals_on_replay(spark, tmp_path):
    """update_cluster_state documents one crash window: between the
    dynamic overwrite and the stale-empty-bucket removal, a merged-away
    cluster's old rows can survive in their old bucket. Replaying the
    same batch must heal — the stale labels re-enter the touched set and
    their bucket rewrites to empty."""
    path = str(tmp_path / "state")
    graph.build_cluster_state(_edges(spark, [(10, 11), (20, 21)]), path, n_buckets=4)
    batch = [(11, 20)]
    graph.update_cluster_state(spark, path, _edges(spark, batch))

    # resurrect the pre-merge rows in their old bucket (the crash state)
    labels_dir = os.path.join(path, "labels")
    stale = spark.createDataFrame(
        [(20, 20), (21, 21 * 0 + 20)], "id long, cluster_id long"
    ).withColumn("bucket", F.pmod(F.xxhash64("cluster_id"), F.lit(4)).cast("int"))
    stale.write.mode("append").partitionBy("bucket").parquet(labels_dir)
    assert spark.read.parquet(labels_dir).count() == 6  # duplicates present

    out = graph.update_cluster_state(spark, path, _edges(spark, batch))
    assert _labels(out) == {10: 10, 11: 10, 20: 10, 21: 10}
    assert spark.read.parquet(labels_dir).count() == 4  # healed, no dups


def test_incremental_state_survives_string_ids(spark, tmp_path):
    """Node-id-type agnostic, same as connected_components."""
    e = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    path = str(tmp_path / "state")
    graph.build_cluster_state(e, path, n_buckets=4)
    out = _labels(
        graph.update_cluster_state(
            spark, path, spark.createDataFrame([("b", "c")], "id_a string, id_b string")
        )
    )
    assert out == {"a": "a", "b": "a", "c": "a"}


# ---------------------------------------------------------------------------
# round-11 additions 2: boilerplate removal, LSH recall eval, domain cap

def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_chunking_width(spark):
    """25 words at chunk_words=10 -> chunks of 10/10/5, in order."""
    from execute_sync_spark.functions.text import boilerplate_chunks

    words = [f"w{i}" for i in range(25)]
    out = boilerplate_chunks(
        _docs_df(spark, [(1, " ".join(words))]), chunk_words=10
    ).orderBy("chunk_id").collect()
    assert [r.chunk_id for r in out] == [0, 1, 2]
    assert out[0].chunk == " ".join(words[:10])
    assert out[2].chunk == " ".join(words[20:])


def test_boilerplate_removal_semantics(spark):
    """Only chunks shared by >= min_docs DISTINCT docs are removed; a
    chunk repeated twice WITHIN one doc (df=1) survives both times, and
    a fully-boilerplate doc rebuilds to the empty string."""
    from execute_sync_spark.functions.text import boilerplate_removal

    shared = " ".join(f"s{i}" for i in range(3))   # in docs 1,2,3 -> boiler
    inner = " ".join(f"u{i}" for i in range(3))    # twice in doc 1 only
    solo = " ".join(f"v{i}" for i in range(3))     # doc 2 only
    rows = [
        (1, f"{shared} {inner} {inner}"),
        (2, f"{shared} {solo}"),
        (3, shared),
    ]
    out = {
        r.doc_id: r
        for r in boilerplate_removal(
            _docs_df(spark, rows), min_docs=2, chunk_words=3
        ).collect()
    }
    assert out[1].text_clean == f"{inner} {inner}"   # within-doc dup kept
    assert (out[1].n_chunks, out[1].n_removed) == (3, 1)
    assert out[2].text_clean == solo
    assert out[3].text_clean == "" and out[3].n_removed == 1


def test_boilerplate_removal_keeps_order(spark):
    """Surviving chunks reassemble in original position order even when
    a removed chunk sits between them."""
    from execute_sync_spark.functions.text import boilerplate_removal

    boiler = "x x x"
    rows = [(1, f"a a a {boiler} b b b"), (2, boiler)]
    out = {r.doc_id: r.text_clean for r in boilerplate_removal(
        _docs_df(spark, rows), min_docs=2, chunk_words=3).collect()}
    assert out[1] == "a a a b b b"


def test_domain_cap_keeps_topk_per_domain(spark):
    """Cap keeps min(K, group size) rows per domain, highest quality
    first, ties broken to the LOWER id."""
    from execute_sync_spark.functions.curation import domain_cap

    rows = [
        (1, "a", 100), (2, "a", 300), (3, "a", 300), (4, "a", 50),
        (5, "b", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = domain_cap(df, per_domain=2).collect()
    kept = {(r.doc_id, r.rank_in_domain) for r in out}
    assert kept == {(2, 1), (3, 2), (5, 1)}  # tie 300/300 -> id 2 ranks first


def test_lsh_recall_exact_duplicates_always_hit(spark):
    """Identical texts have identical MinHash signatures, so they collide
    in EVERY band: the jaccard=1.0 decile of the s-curve must show
    recall 1.0 (the property that makes banding safe for exact dups)."""
    from execute_sync_spark.functions import dedupe

    text = " ".join(f"t{i}" for i in range(40))
    other = " ".join(f"z{i}" for i in range(40))
    docs = _docs_df(spark, [(1, text), (2, text), (3, other)])
    truth = dedupe.ngram_jaccard_pairs(docs, threshold=0.05)
    sigs = dedupe.minhash_signatures(docs, num_hashes=8)
    cand = dedupe.lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)
    t = {(r.id_a, r.id_b) for r in truth.filter(F.col("jaccard") >= 1.0).collect()}
    c = {(r.id_a, r.id_b) for r in cand.collect()}
    assert t == {(1, 2)}
    assert t <= c


# --- round-11 addition 3: gumbel resample / knn join / shard assign ---


def _h32_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_gumbel_resample_matches_manual_selection(spark):
    """The drawn sample is a pure function of (id, weight): an
    independent Python reimplementation of u -> gumbel -> key selects
    the same rows Spark does (the cross-engine portability contract the
    oracle relies on)."""
    import math

    from execute_sync_spark.functions.curation import gumbel_topk_resample

    rows = [(i, float(i % 7) / 7.0) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = gumbel_topk_resample(df, n=10, weight_col="w").collect()

    def key(i, w):
        u = (_h32_py(f"23#{i}") + 0.5) / 2**32
        return round(w - math.log(-math.log(u)), 6)

    expect = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:10]
    assert sorted((r.doc_id, r.w) for r in got) == sorted(expect)
    assert all(abs(r.gumbel_key - key(r.doc_id, r.w)) < 1e-9 for r in got)


def test_gumbel_resample_prefers_heavy_weights(spark):
    """A log-weight gap of +-30 (e^60 odds) makes the heavy half win
    every slot: the sampler respects the weights, not just the hash."""
    from execute_sync_spark.functions.curation import gumbel_topk_resample

    rows = [(i, 30.0 if i <= 20 else -30.0) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r.doc_id for r in gumbel_topk_resample(df, n=20, weight_col="w").collect()}
    assert got == set(range(1, 21))


def test_gumbel_resample_stable_under_repartition(spark):
    from execute_sync_spark.functions.curation import gumbel_topk_resample

    rows = [(i, float(i % 5)) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = {r.doc_id for r in gumbel_topk_resample(df, n=7, weight_col="w").collect()}
    b = {r.doc_id for r in gumbel_topk_resample(df.repartition(13), n=7, weight_col="w").collect()}
    assert a == b and len(a) == 7


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")


def test_knn_join_matches_bruteforce(spark):
    """Per-block kNN equals a numpy brute force with the same rounding
    and tie-break (sim DESC, neighbor_id ASC)."""
    import numpy as np

    from execute_sync_spark.functions.similarity import knn_join_blocked

    rng = np.random.default_rng(7)
    rows = [
        (i, "a" if i < 8 else "b", [float(x) for x in rng.normal(size=4)])
        for i in range(12)
    ]
    got = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in knn_join_blocked(_emb_df(spark, rows), k=3).collect()
    }
    import math

    by_block = {}
    for i, lab, v in rows:
        by_block.setdefault(lab, []).append((i, np.array(v)))
    n_rows = 0
    for lab, members in by_block.items():
        for i, v in members:
            sims = []
            for j, w in members:
                if j == i:
                    continue
                c = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
                # same half-up rounding as the engine
                c = math.floor(abs(c) * 10**4 + 0.5) / 10**4 * (1 if c >= 0 else -1)
                sims.append((j, c))
            sims.sort(key=lambda t: (-t[1], t[0]))
            for rank, (j, c) in enumerate(sims[:3], start=1):
                n_rows += 1
                nb, cs = got[(i, rank)]
                assert nb == j and abs(cs - c) < 1e-12, (i, rank, nb, j)
    assert len(got) == n_rows


def test_knn_join_small_blocks(spark):
    """k larger than the block emits block_size-1 neighbors; a
    single-vector block emits nothing (no self-neighbor)."""
    from execute_sync_spark.functions.similarity import knn_join_blocked

    rows = [
        (1, "a", [1.0, 0.0]), (2, "a", [0.0, 1.0]),
        (3, "solo", [1.0, 1.0]),
    ]
    out = knn_join_blocked(_emb_df(spark, rows), k=5).collect()
    assert {(r.vec_id, r.neighbor_id) for r in out} == {(1, 2), (2, 1)}


def test_knn_join_cells_exhaustive_probe_equals_exact(spark):
    """With nprobe >= number of cells every vector scores every candidate,
    so the IVF-cell kNN graph must equal the exact single-block graph —
    the same exhaustive-probe==exact property the query-set ANN family
    pins; it proves per-cell pruning uses the global merge key."""
    import numpy as np

    from execute_sync_spark.functions.similarity import (
        knn_join_blocked,
        knn_join_cells,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, "all", [float(x) for x in rng.normal(size=4)]) for i in range(20)
    ]
    df = _emb_df(spark, rows)
    exact = {
        (r.vec_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in knn_join_blocked(df, k=3).collect()
    }
    cents = df.filter("vec_id < 4")
    cells = {
        (r.vec_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in knn_join_cells(df, cents, k=3, nprobe=4).collect()
    }
    assert cells == exact and len(exact) == 20 * 3


def test_knn_join_cells_multiprobe_recovers_boundary(spark):
    """A vector whose true nearest neighbor homes in the OTHER cell:
    nprobe=1 returns the within-cell runner-up, nprobe=2 the true
    neighbor — the recall knob doing its one job."""
    from execute_sync_spark.functions.similarity import knn_join_cells

    rows = [
        (1, "c", [1.0, 0.0]),        # centroid A
        (2, "c", [0.0, 1.0]),        # centroid B
        (10, "x", [1.0, 0.05]),      # home A
        (11, "x", [1.0, 0.3]),       # home A; true NN of 12
        (12, "x", [0.70, 0.75]),     # home B (barely), true NN = 11
        (13, "x", [0.05, 1.0]),      # home B
    ]
    df = _emb_df(spark, rows)
    cents = df.filter("vec_id <= 2")
    corpus = df.filter("vec_id >= 10")
    one = {r.neighbor_id for r in
           knn_join_cells(corpus, cents, k=1, nprobe=1).collect()
           if r.vec_id == 12}
    two = {r.neighbor_id for r in
           knn_join_cells(corpus, cents, k=1, nprobe=2).collect()
           if r.vec_id == 12}
    assert one == {13} and two == {11}


def test_knn_join_cells_single_member_cell(spark):
    """A cell with one home member offers only the self-pair to its own
    member — who still gets neighbors from its second probe cell."""
    from execute_sync_spark.functions.similarity import knn_join_cells

    rows = [
        (1, "c", [1.0, 0.0]), (2, "c", [0.0, 1.0]),
        (10, "x", [1.0, 0.01]), (11, "x", [0.9, 0.1]),
        (12, "x", [0.01, 1.0]),  # alone in cell B
    ]
    df = _emb_df(spark, rows)
    cents = df.filter("vec_id <= 2")
    corpus = df.filter("vec_id >= 10")
    out = knn_join_cells(corpus, cents, k=2, nprobe=2).collect()
    mine = sorted(r.neighbor_id for r in out if r.vec_id == 12)
    assert mine == [10, 11]
    assert all(r.neighbor_id != r.vec_id for r in out)


def test_ivfpq_rerank_exhaustive_shortlist_equals_exact(spark):
    """With shortlist >= corpus and nprobe >= cells the ADC stage prunes
    nothing, so exact re-ranking must reproduce brute-force cosine top-k
    bit-for-bit — the refine stage's correctness anchor."""
    import numpy as np

    from execute_sync_spark.functions.similarity import (
        cosine_topk,
        ivfpq_rerank_topk,
        pq_codebook,
    )

    rng = np.random.default_rng(5)
    rows = [
        (i, "x", [float(x) for x in rng.normal(size=64)]) for i in range(24)
    ]
    df = _emb_df(spark, rows)
    queries = df.filter("vec_id < 4")
    cents = df.filter("vec_id < 3")
    cb = pq_codebook(df.filter("vec_id < 16"))
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivfpq_rerank_topk(
            df, queries, cents, cb, k=3, shortlist=30, nprobe=3
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in cosine_topk(df, queries, k=3).collect()
    }
    assert got == want and len(got) == 4 * 3


def test_ivfpq_rerank_subset_of_shortlist(spark):
    """The re-ranked winners are always drawn from the ADC shortlist, and
    exactly k rows per query come back with contiguous ranks."""
    import numpy as np

    from execute_sync_spark.functions.similarity import (
        ivfpq_rerank_topk,
        ivfpq_topk,
        pq_codebook,
    )

    rng = np.random.default_rng(9)
    rows = [
        (i, "x", [float(x) for x in rng.normal(size=64)]) for i in range(30)
    ]
    df = _emb_df(spark, rows)
    queries = df.filter("vec_id < 5")
    cents = df.filter("vec_id < 4")
    cb = pq_codebook(df.filter("vec_id < 16"))
    short = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(df, queries, cents, cb, k=9, nprobe=2).collect()
    }
    out = ivfpq_rerank_topk(df, queries, cents, cb, k=3, shortlist=9, nprobe=2).collect()
    assert all((r.query_id, r.neighbor_id) in short for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    assert all(len(v) == 3 for v in by_q.values())


def test_knn_join_sqrt_sound_and_deterministic(spark):
    """The sqrt-cells kNN graph (kmeans centroids, not oracle-expressible):
    every reported edge's cos_sim equals the exact rounded cosine of that
    pair, no self-edges, ranks contiguous per vector, and the whole
    relation is stable under repartitioning (deterministic sample fit)."""
    import math

    import numpy as np

    from execute_sync_spark.functions.similarity import (
        kmeans_fit_sample,
        knn_join_cells,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, "x", [float(x) for x in rng.normal(size=8)]) for i in range(60)
    ]
    df = _emb_df(spark, rows)
    cents = kmeans_fit_sample(df, k=max(8, math.isqrt(60)), iters=10)
    out = knn_join_cells(df, cents, k=3, nprobe=2).collect()
    vecs = {i: np.asarray(v) for i, _, v in rows}

    def exact_cos(a, b):
        c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
        return math.floor(abs(c) * 10**4 + 0.5) / 10**4 * (1 if c >= 0 else -1)

    assert out, "graph must be non-empty on a 60-vector corpus"
    by_v = {}
    for r in out:
        assert r.neighbor_id != r.vec_id
        assert abs(r.cos_sim - exact_cos(r.vec_id, r.neighbor_id)) < 1e-12
        by_v.setdefault(r.vec_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_v.values())

    cents2 = kmeans_fit_sample(df.repartition(7), k=max(8, math.isqrt(60)), iters=10)
    out2 = knn_join_cells(df.repartition(5), cents2, k=3, nprobe=2).collect()
    key = lambda r: (r.vec_id, r.rank, r.neighbor_id, r.cos_sim)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))


def test_shard_assign_complete_balanced_stable(spark):
    """Every doc lands in exactly one shard; positions are 1..n_shard
    contiguous; the whole assignment is invariant under repartitioning."""
    from execute_sync_spark.functions.curation import shard_assign

    df = spark.createDataFrame([(i,) for i in range(1, 201)], "doc_id long")
    out = shard_assign(df, n_shards=8).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    assert all(0 <= r.shard < 8 for r in out)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # balance in expectation: no shard is empty or >2x the mean at n=200
    sizes = [len(v) for v in by_shard.values()]
    assert len(by_shard) == 8 and max(sizes) <= 2 * (200 // 8)
    again = shard_assign(df.repartition(11), n_shards=8).collect()
    assert {(r.doc_id, r.shard, r.pos_in_shard) for r in again} == {
        (r.doc_id, r.shard, r.pos_in_shard) for r in out
    }
