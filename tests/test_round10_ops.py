"""Round-10 additions: ivfpq probe-selection tie-margin monitor and the
ADVICE-r9 fixes (freshness-guard OSError skip, null-lang approx CCNet
bucketing, empty-corpus LSH index probe, LSH cache-key planes digest)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _tie_margins(spark, sf_dir, n_cent=8, n_q=10, nprobe=2):
    """Per-query gap between the cosine of the LAST probed centroid and
    the FIRST unprobed one — the boundary where a last-ulp divergence
    between numpy/Spark/DuckDB evaluation orders could flip the probe
    set (VERDICT r7-r9 monitor)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cent = (
        emb.filter(F.col("vec_id") < n_cent)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .toPandas()
    )
    qs = (
        emb.filter(F.col("vec_id") < n_q)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .toPandas()
    )
    C = np.stack(cent["v"].to_numpy()).astype(np.float64)
    Q = np.stack(qs["v"].to_numpy()).astype(np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = np.sort(Qn @ Cn.T, axis=1)[:, ::-1]  # per query, cos desc
    return S[:, nprobe - 1] - S[:, nprobe]


@pytest.mark.parametrize("sf_dir", [SF_DIR, "/root/testdata/sf0.01"])
def test_ivfpq_probe_selection_has_no_near_ties(spark, sf_dir):
    """The ivfpq family's probe selection compares RAW unrounded cosines
    across three engines (numpy here, Spark expressions, DuckDB oracle).
    That is only gate-safe while no query's nprobe boundary sits within
    float-error distance of a tie. Pin an explicit margin: 64-dim double
    dot products accumulate ~1e-14 relative error, so a 1e-9 margin is
    five orders above any legitimate cross-engine divergence. If the
    fixture ever regenerates into a near-tie, this fails loudly in pytest
    before the driver gate can flake."""
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    margins = _tie_margins(spark, sf_dir)
    assert margins.min() > 1e-9, (
        f"probe-selection near-tie: min margin {margins.min():.3e} — "
        "cross-engine ulp divergence could flip the probe set"
    )


def test_guarded_sweep_skips_on_freshness_stat_failure(spark, tmp_path):
    """ADVICE r9 (medium): a transient stat failure during a GUARDED
    (min_age_s>0) index sweep must skip the dir — treating it as "old
    enough" would let a concurrent compact's fresh aside be reclaimed
    inside its own quarantine window. The unguarded sweep keeps the
    never-stat completeness rule."""
    from execute_sync_spark import storage
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = similarity.build_cell_index(
        emb.filter(F.col("vec_id") < 40), emb.filter(F.col("vec_id") < 4),
        str(tmp_path / "ivf"),
    )
    cell = next(
        n for n in os.listdir(idx) if n.startswith("cell_id=")
    )[len("cell_id="):]
    os.rename(
        os.path.join(idx, f"cell_id={cell}"),
        os.path.join(idx, f"_old_cell_{cell}_99999"),
    )

    class FlakyStatStore(storage.LocalPosixStore):
        def freshness(self, p):
            raise OSError("simulated NFS stat hiccup")

    prev = storage.STORE
    storage.set_store(FlakyStatStore())
    try:
        # guarded sweep + broken stat: touch NOTHING (old code restored it)
        rep = similarity.sweep_index(idx, min_age_s=3600)
        assert rep == {"restored": [], "reclaimed": []}
        assert os.path.isdir(os.path.join(idx, f"_old_cell_{cell}_99999"))
        # unguarded sweep never stats: full recovery even with stat broken
        rep = similarity.sweep_index(idx, min_age_s=0)
        assert f"_old_cell_{cell}_99999" in rep["restored"]
    finally:
        storage.set_store(prev)


def test_ccnet_approx_keeps_null_lang_docs(spark):
    """ADVICE r9 (low): documents with NULL lang must bucket like the
    exact form (whose window treats NULL as its own partition) instead of
    being dropped by a null-rejecting equi-join."""
    from execute_sync_spark.functions import text

    rows = [
        (i, " ".join(["alpha beta gamma delta"] * (1 + i % 5)), lang)
        for i, lang in enumerate(["en"] * 6 + [None] * 6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    exact = {r.doc_id: r.bucket for r in text.ccnet_buckets(docs).collect()}
    approx = {r.doc_id: r.bucket for r in text.ccnet_buckets_approx(docs).collect()}
    null_ids = {i for i in range(6, 12)}
    assert null_ids <= set(exact)
    # the fix: every null-lang doc survives the threshold join
    assert null_ids <= set(approx), f"null-lang docs dropped: {null_ids - set(approx)}"
    assert set(approx) == set(exact)


def test_lsh_indexed_empty_corpus_index_returns_empty(spark, tmp_path):
    """ADVICE r9 (low): an index built from an EMPTY corpus materializes
    no parquet data files, so the probe scan can't infer a schema — the
    probe must honor the shared _empty_result contract, not raise."""
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = similarity.build_lsh_index(
        emb.filter(F.lit(False)), str(tmp_path / "lsh_empty")
    )
    out = similarity.lsh_topk_indexed(spark, idx, emb.filter(F.col("vec_id") < 5))
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "cos_sim"}


def test_lsh_index_cache_key_tracks_plane_constants(monkeypatch):
    """ADVICE r9 (low): the cached persisted-LSH index depends on the LSH
    plane constants, not just the embeddings file — changing seeds/L/b
    must change the cache path (force a rebuild), never silently reuse
    old bucketing."""
    from execute_sync_spark.functions import similarity
    from execute_sync_spark.plans import workload

    before = workload._lsh_index_path(SF_DIR)
    monkeypatch.setattr(
        similarity, "LSH_TABLES", similarity.LSH_TABLES[:-1]
    )
    after = workload._lsh_index_path(SF_DIR)
    assert before != after


# ---------------------------------------------------------------------------
# Round-10 build: LSH index incremental maintenance via the shared commit
# protocol (functions/index_commit.py) — append-equals-rebuild, replay
# idempotency across compaction, crash-sweep recovery; the exact battery
# the IVF/PQ indexes carry (tests/test_round7_ops.py), on the two-level
# (table, bucket) leaf layout.


def _lsh_probe_rows(spark, idx, queries):
    from execute_sync_spark.functions import similarity

    return sorted(
        map(tuple, similarity.lsh_topk_indexed(spark, idx, queries, k=5).collect())
    )


def test_append_lsh_index_equals_rebuild_and_replays_idempotently(spark, tmp_path):
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 40)
    new = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))
    queries = emb.filter(F.col("vec_id") < 5)

    idx = similarity.build_lsh_index(old, str(tmp_path / "lsh"))
    touched = similarity.append_lsh_index(new, idx, batch_id=7)
    assert touched  # two-level (table, bucket) leaves
    assert all(len(t) == 2 for t in touched)

    # append == rebuild: probes against the incrementally-built index
    # match a from-scratch build over the full corpus
    full = similarity.build_lsh_index(
        emb.filter(F.col("vec_id") < 60), str(tmp_path / "lsh_full")
    )
    assert _lsh_probe_rows(spark, idx, queries) == _lsh_probe_rows(spark, full, queries)

    # replay of the same batch_id: same leaves, no duplicate vectors
    n = spark.read.parquet(idx).count()
    assert similarity.append_lsh_index(new, idx, batch_id=7) == touched
    assert spark.read.parquet(idx).count() == n


def test_compact_lsh_index_preserves_probes_and_replay_skips(spark, tmp_path):
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 40)
    new = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 60))
    queries = emb.filter(F.col("vec_id") < 5)

    idx = similarity.build_lsh_index(old, str(tmp_path / "lsh"))
    similarity.append_lsh_index(new, idx, batch_id=7)
    before = _lsh_probe_rows(spark, idx, queries)
    n = spark.read.parquet(idx).count()

    done = similarity.compact_lsh_index(spark, idx)
    assert done
    # every leaf is single-partition __compacted__ now; probes unchanged
    assert _lsh_probe_rows(spark, idx, queries) == before
    assert spark.read.parquet(idx).count() == n

    # compact-then-replay: the absorbed batch is skipped entirely
    assert similarity.append_lsh_index(new, idx, batch_id=7) == []
    assert spark.read.parquet(idx).count() == n


def test_lsh_sweep_recovers_stranded_leaf(spark, tmp_path):
    from execute_sync_spark import storage
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = similarity.build_lsh_index(
        emb.filter(F.col("vec_id") < 40), str(tmp_path / "lsh")
    )
    before = _lsh_probe_rows(spark, idx, queries)

    # crash sim: one live leaf parked aside (compact's first rename)
    t = next(n for n in os.listdir(idx) if n.startswith("table="))[len("table="):]
    b = next(
        n for n in os.listdir(os.path.join(idx, f"table={t}"))
        if n.startswith("bucket=")
    )[len("bucket="):]
    storage.STORE.rename(
        os.path.join(idx, f"table={t}", f"bucket={b}"),
        os.path.join(idx, f"_old_tb_{t}-{b}_99999"),
    )

    # stranded: probe and append both fail loudly, pointing at the sweep
    with pytest.raises(RuntimeError, match="sweep_lsh_index"):
        similarity.lsh_topk_indexed(spark, idx, queries).collect()
    with pytest.raises(RuntimeError, match="sweep_lsh_index"):
        similarity.append_lsh_index(queries, idx, batch_id=9)

    # guarded sweep + fresh aside: untouched; unguarded: rolled back
    assert similarity.sweep_lsh_index(idx, min_age_s=3600) == {
        "restored": [], "reclaimed": [],
    }
    out = similarity.sweep_lsh_index(idx, min_age_s=0)
    assert f"_old_tb_{t}-{b}_99999" in out["restored"]
    assert _lsh_probe_rows(spark, idx, queries) == before


def test_append_lsh_refuses_legacy_two_level_layout(spark, tmp_path):
    """An r9-era LSH index (partitioned (table, bucket) with data files
    directly in the bucket dirs — no batch_id level) must refuse appends:
    mixing layouts would break partition discovery on the next read."""
    from execute_sync_spark.functions import similarity
    from execute_sync_spark.functions.similarity import _with_table_buckets, _as_double

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    legacy = str(tmp_path / "lsh_legacy")
    _with_table_buckets(
        emb.filter(F.col("vec_id") < 40).select(
            "vec_id", _as_double("embedding").alias("v")
        ),
        "v",
        similarity.LSH_TABLES,
    ).write.partitionBy("table", "bucket").parquet(legacy)

    with pytest.raises(ValueError, match="legacy"):
        similarity.append_lsh_index(
            emb.filter(F.col("vec_id") >= 40), legacy, batch_id=1
        )
    # untouched and still readable
    assert spark.read.parquet(legacy).count() > 0


def test_lsh_index_maintained_from_a_stream(spark, tmp_path):
    """A streaming embedding feed wired into append_lsh_index via
    foreachBatch (epoch id = batch_id) keeps the persisted sign-LSH index
    probe-identical to a full rebuild over everything seen — the same
    live-index deployment shape the IVF/PQ indexes carry, now on the
    shared commit protocol's two-level leaves."""
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)

    src = str(tmp_path / "feed")
    os.makedirs(src)
    for i, pred in enumerate((F.col("vec_id") % 3 == 0, F.col("vec_id") % 3 == 1)):
        emb.filter(pred).coalesce(1).write.parquet(src + f"/b{i}")
    files = []
    for d in sorted(os.listdir(src)):
        for f in os.listdir(os.path.join(src, d)):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"{d}.parquet")
                os.rename(os.path.join(src, d, f), dst)
                files.append(dst)
    schema = spark.read.parquet(files[0]).schema

    idx = similarity.build_lsh_index(
        emb.filter(F.col("vec_id") % 3 == 2), str(tmp_path / "lsh")
    )
    sq = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
        .writeStream.foreachBatch(
            lambda df, epoch: similarity.append_lsh_index(df, idx, batch_id=epoch)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(120)

    full = similarity.build_lsh_index(emb, str(tmp_path / "lsh_full"))
    assert _lsh_probe_rows(spark, idx, queries) == _lsh_probe_rows(spark, full, queries)
    # compaction after the stream preserves probes and absorbs the epochs
    similarity.compact_lsh_index(spark, idx)
    assert _lsh_probe_rows(spark, idx, queries) == _lsh_probe_rows(spark, full, queries)
