"""Round-14 operators: char entropy, Zipf slope, sqrt-stratified sampling,
triangle counting, Matryoshka prefix-rerank ANN, MinHash estimate-vs-true.

Each test pins the semantics on hand-built fixtures (the driver's DuckDB
gate covers the sf0.01 corpus separately)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from execute_sync_spark.functions import curation, dedupe, graph, similarity, text


# ---------------------------------------------------------------------------
# char_entropy


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in text.char_entropy(docs).collect()}
    assert rows[1].entropy_bits == 0.0 and rows[1].top_char_frac == 1.0
    assert rows[1].n_chars == 4 and rows[1].n_distinct_chars == 1
    assert rows[2].entropy_bits == 1.0 and rows[2].top_char_frac == 0.5
    # empty docs have no characters: excluded, like the oracle's range(0)
    assert 3 not in rows


def test_char_entropy_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, f"some text {i} with repeated letters zzz") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, text.char_entropy(docs).collect()))
    b = sorted(map(tuple, text.char_entropy(docs.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# zipf_slope


def test_zipf_slope_two_point_exact(spark):
    # freq(a)=10 rank 1, freq(b)=5 rank 2 -> slope (ln5-ln10)/(ln2-ln1) = -1
    words = ["a"] * 10 + ["b"] * 5
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en")], "doc_id long, text string, lang string"
    )
    rows = text.zipf_slope(docs).collect()
    assert len(rows) == 1
    assert rows[0].lang == "en" and rows[0].n_terms == 2
    assert rows[0].zipf_slope == -1.0


def test_zipf_slope_min_count_valve(spark):
    # tokens under the min_count=5 valve never reach the ranking
    docs = spark.createDataFrame(
        [(1, "rare " + "common " * 10, "en")], "doc_id long, text string, lang string"
    )
    rows = text.zipf_slope(docs).collect()
    assert rows[0].n_terms == 1  # 'rare' (freq 1) valved out
    assert rows[0].zipf_slope is None  # one point: slope undefined, not an error


# ---------------------------------------------------------------------------
# sqrt_stratified_sample


def test_sqrt_stratified_quotas_and_determinism(spark):
    rows = [(i, "en", "src0") for i in range(100)] + [
        (1000 + i, "de", "src1") for i in range(9)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = curation.sqrt_stratified_sample(docs, ["lang", "source"]).collect()
    by = {}
    for r in out:
        by.setdefault((r.lang, r.source), []).append(r)
    # n=100 -> quota ceil(4*10)=40; n=9 -> quota 12 >= 9 keeps everything
    assert len(by[("en", "src0")]) == 40
    assert all(r.quota == 40 and r.stratum_size == 100 for r in by[("en", "src0")])
    assert len(by[("de", "src1")]) == 9
    # deterministic under physical reordering
    out2 = curation.sqrt_stratified_sample(docs.repartition(13), ["lang", "source"])
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2.collect())


# ---------------------------------------------------------------------------
# triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_triangle_counts_basic(spark):
    # one triangle (1,2,3) plus a dangling edge 3-4
    out = {
        r.node: r.n_triangles
        for r in graph.triangle_counts(_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_shared_edge_and_duplicates(spark):
    # triangles (1,2,3) and (2,3,4) share edge 2-3; reversed/duplicate
    # input edges must not double-count
    pairs = [(1, 2), (1, 3), (2, 3), (3, 2), (2, 4), (3, 4), (4, 2)]
    out = {r.node: r.n_triangles for r in graph.triangle_counts(_edges(spark, pairs)).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


# ---------------------------------------------------------------------------
# matryoshka_topk


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_matryoshka_full_shortlist_equals_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    got = similarity.matryoshka_topk(emb, qs, d_prefix=16, m_shortlist=n, k=3)
    want = similarity.cosine_topk_vectorized(emb, qs, k=3)
    got_set = {(r.query_id, r.neighbor_id, r.cos_sim) for r in got.collect()}
    want_rows = want.collect()
    # brute force returns per-query top-3 by the same (cos desc, id) key
    assert got_set == {(r.query_id, r.neighbor_id, r.cos_sim) for r in want_rows}


def test_matryoshka_prefix_rank_carried(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 3)
    rows = similarity.matryoshka_topk(emb, qs, d_prefix=8, m_shortlist=20, k=5).collect()
    assert rows and all(1 <= r.prefix_rank <= 20 for r in rows)
    assert all(1 <= r.rank <= 5 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))


# ---------------------------------------------------------------------------
# minhash_estimate_vs_true


def test_minhash_est_identical_and_disjoint(spark):
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 " * 3
    other = "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 " * 3
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, other)], "doc_id long, text string"
    )
    rows = dedupe.minhash_estimate_vs_true(docs).collect()
    got = {(r.id_a, r.id_b): r for r in rows}
    # identical docs: jaccard 1, estimate 1, banding must find them
    r = got[(1, 2)]
    assert r.jaccard == 1.0 and r.minhash_est == 1.0 and r.abs_err == 0.0
    assert r.lsh_found
    # disjoint docs never pair (true jaccard 0 < threshold)
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_est_error_consistency(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = dedupe.minhash_estimate_vs_true(docs, max_df=20).collect()
    assert rows, "fixture corpus lost its near-dup pairs"
    for r in rows:
        assert 0.0 <= r.minhash_est <= 1.0
        assert abs(r.abs_err - round(abs(r.minhash_est - r.jaccard), 4)) <= 1e-9
        if r.lsh_found:
            # a band hit needs 2 equal components
            assert r.minhash_est >= 0.25 - 1e-9


# ---------------------------------------------------------------------------
# sketch agreement rows + lang confusion


def test_vocab_hll_agreement(spark):
    from execute_sync_spark.plans import workload

    rows = workload.text_vocab_hll(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hll_ok, (r.source, r.n_distinct_tokens)
        assert 0 < r.n_distinct_tokens <= r.n_tokens


def test_quantiles_sketch_agreement(spark):
    from execute_sync_spark.plans import workload

    rows = workload.q_quantiles_sketch(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sketch_p50_ok and r.sketch_p99_ok
        assert 0 < r.p50_exact <= r.p99_exact


def test_lang_confusion_partitions_corpus(spark):
    from execute_sync_spark.plans import workload

    rows = workload.text_lang_confusion(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs  # every doc lands in one cell
    assert all(r.n_docs > 0 for r in rows)


# ---------------------------------------------------------------------------
# ADVICE r13 protocol fixes


def test_bm25_full_rebuild_resets_stale_batch_stats(spark, tmp_path):
    """ADVICE r13 (medium): build_bm25_index over an index that already
    received appends must reset BOTH sidecars — before the fix, the
    static-overwrite postings write replaced the postings tree but stale
    stats/batch_id=b1 dirs survived, silently overcounting (N, avgdl) and
    drifting every score from the in-flight oracle."""
    from execute_sync_spark.functions import text as text_fns

    texts = [
        "spark shuffles data between executors during wide operations",
        "broadcast joins avoid the shuffle for small dimension tables",
        "adaptive execution re-plans skewed shuffles at runtime",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    path = str(tmp_path / "bm25_idx")
    text_fns.build_bm25_index(docs, path)
    extra = spark.createDataFrame(
        [(100, "an appended document about shuffle history")],
        "doc_id long, text string",
    )
    text_fns.append_bm25_index(extra, path, batch_id="b1")
    # FULL rebuild from the base corpus only: the b1 stats must not survive
    text_fns.build_bm25_index(docs, path)
    terms = ["shuffle", "broadcast"]
    got = [
        (r.doc_id, r.rank, r.score)
        for r in text_fns.bm25_topk_indexed(spark, path, terms, k=4).collect()
    ]
    want = [
        (r.doc_id, r.rank, r.score)
        for r in text_fns.bm25_topk(docs, terms, k=4).collect()
    ]
    assert want and got == want


def test_sweep_merges_aside_manifest_into_live_manifest(tmp_path):
    """ADVICE r13 (low): when sweep moves an aside's __compacted__ dir
    into a live leaf that ALREADY has a manifest, the aside's
    folded-batches ledger must MERGE into the live manifest (before the
    fix it was discarded with the aside, so a replayed append of a folded
    batch_id would not be absorbed and would duplicate rows)."""
    import json
    import os

    from execute_sync_spark import storage
    from execute_sync_spark.functions import index_commit

    spec = index_commit.BM25_SPEC
    root = str(tmp_path / "postings")
    # build the leaf layout by hand: a live dir holding a manifest (but NOT
    # covering the aside) and an aside holding __compacted__ + its manifest
    rel = spec.rel(("tb=1",))
    live = os.path.join(root, rel)
    os.makedirs(os.path.join(live, "batch_id=b9"))
    storage.STORE.write_text(
        os.path.join(live, index_commit.MANIFEST), json.dumps({"batches": ["b9"]})
    )
    aside = os.path.join(root, spec.aside_name(spec.key(("tb=1",)), "pid"))
    os.makedirs(os.path.join(aside, "batch_id=__compacted__"))
    storage.STORE.write_text(
        os.path.join(aside, index_commit.MANIFEST),
        json.dumps({"batches": ["b1", "b2"]}),
    )
    res = index_commit.sweep(root, spec)
    assert res["restored"]
    live_m = json.loads(
        storage.STORE.read_text(os.path.join(live, index_commit.MANIFEST))
    )
    # the ledger travelled with the data: folded batches merged, b9 kept
    assert set(live_m["batches"]) == {"b1", "b2", "b9"}
    assert storage.STORE.isdir(os.path.join(live, "batch_id=__compacted__"))


def test_matryoshka_recall_full_prefix_is_perfect(spark):
    """With d_prefix = full dimension the shortlist ordering IS the exact
    ordering, so recall@5 at m=50 must be 1.0 for every query; the gated
    d=16 form's recall is whatever the corpus gives (measured, not
    pinned), but n_exact is always k."""
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    got = similarity.matryoshka_topk(emb, qs, d_prefix=64, m_shortlist=50, k=5)
    exact = similarity.cosine_topk_vectorized(emb, qs, k=5)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert g == e


# ---------------------------------------------------------------------------
# streaming-maintained mixture stats


def _mix_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _mix_rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_mixture_maintenance_equals_flat(spark, tmp_path):
    """After any prefix of micro-batches, mixture_from_stats equals
    temperature_mixture run flat over every document delivered so far —
    cadence, restart, and replay included."""
    import os

    from execute_sync_spark.functions import curation
    from execute_sync_spark.streaming.mixture import (
        mixture_from_stats,
        stream_mixture_maintenance,
        write_mixture_stats,
    )

    base = _mix_docs(spark, [
        (1, "alpha beta gamma delta", "src0"),
        (2, "one two three", "src0"),
        (3, "uno dos", "src1"),
    ])
    stats = str(tmp_path / "mix_stats")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    write_mixture_stats(base, stats, "__base__")
    assert _mix_rows(mixture_from_stats(spark, stats)) == _mix_rows(
        curation.temperature_mixture(base)
    )

    # two feed files, drained one per micro-batch
    b1 = _mix_docs(spark, [(4, "more text for source one", "src1")])
    b2 = _mix_docs(spark, [(5, "a new third source appears here", "src2"),
                           (6, "and grows", "src2")])
    b1.coalesce(1).write.mode("append").parquet(feed)
    stream_mixture_maintenance(spark, feed, stats, ckpt)
    flat1 = base.unionByName(b1)
    assert _mix_rows(mixture_from_stats(spark, stats)) == _mix_rows(
        curation.temperature_mixture(flat1)
    )

    # restart with the same checkpoint: only the NEW file is processed
    b2.coalesce(1).write.mode("append").parquet(feed)
    stream_mixture_maintenance(spark, feed, stats, ckpt)
    flat2 = flat1.unionByName(b2)
    assert _mix_rows(mixture_from_stats(spark, stats)) == _mix_rows(
        curation.temperature_mixture(flat2)
    )

    # replayed batch overwrites itself: re-writing e.g. the base stats is
    # value-identical, never double-counted
    write_mixture_stats(base, stats, "__base__")
    assert _mix_rows(mixture_from_stats(spark, stats)) == _mix_rows(
        curation.temperature_mixture(flat2)
    )


def test_stream_mixture_starts_on_empty_feed(spark, tmp_path):
    import os

    from execute_sync_spark.streaming.mixture import (
        mixture_from_stats,
        stream_mixture_maintenance,
        write_mixture_stats,
    )

    feed = str(tmp_path / "empty_feed")
    os.makedirs(feed)
    stats = str(tmp_path / "stats")
    write_mixture_stats(
        _mix_docs(spark, [(1, "seed words", "src0")]), stats, "__base__"
    )
    stream_mixture_maintenance(spark, feed, stats, str(tmp_path / "ck"))
    assert mixture_from_stats(spark, stats).count() == 1
