"""Round-9 regressions: the three ADVICE r8 hardening items on the
persisted-ANN index lifecycle (`functions/similarity.py`), plus behavior
tests for the round's new operators (valved containment, persisted LSH,
approx CCNet, hashed DSIR, sink-landed twins — each is ALSO oracled per
run via test_workload's QUERIES parametrization)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from execute_sync_spark.functions import similarity as sim
from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# ADVICE r8 #2: _index_check_layout must scan ALL cells — an already-mixed
# index (legacy flat cell + two-level cell) must raise regardless of the
# order os.listdir happens to return the cells in.


def _mk_flat_cell(root, cell):
    p = os.path.join(root, f"cell_id={cell}")
    os.makedirs(p)
    with open(os.path.join(p, "part-0000.parquet"), "w") as f:
        f.write("x")


def _mk_batch_cell(root, cell):
    p = os.path.join(root, f"cell_id={cell}", "batch_id=b1")
    os.makedirs(p)
    with open(os.path.join(p, "part-0000.parquet"), "w") as f:
        f.write("x")


def test_layout_check_rejects_mixed_index_any_order(tmp_path):
    # two-level cell sorts FIRST (cell_id=0) so a first-hit short-circuit
    # would wrongly pass; the flat legacy cell must still be found
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _mk_batch_cell(root, 0)
    _mk_flat_cell(root, 1)
    with pytest.raises(ValueError, match="legacy"):
        sim._index_check_layout(root)


def test_layout_check_passes_uniform_two_level(tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _mk_batch_cell(root, 0)
    _mk_batch_cell(root, 1)
    sim._index_check_layout(root)  # no raise


# ---------------------------------------------------------------------------
# ADVICE r8 #1: the min_age_s freshness guard must gate on max(mtime,
# ctime) — os.rename(live, aside) preserves mtime, so an aside created
# seconds ago by a concurrent compact can carry an hours-old mtime. A
# freshly-renamed aside must NOT be swept inside the min_age_s window.


def test_sweep_min_age_uses_ctime_not_just_mtime(tmp_path):
    root = str(tmp_path / "idx")
    live = os.path.join(root, "cell_id=7")
    os.makedirs(live)
    aside = os.path.join(root, "_old_cell_7_12345")
    os.rename(live, aside)  # simulate compact's first rename (mtime preserved)
    old = time.time() - 3600
    os.utime(aside, (old, old))  # hours-old mtime; ctime stays "now"
    out = sim.sweep_index(root, min_age_s=60.0)
    # guard must treat the aside as FRESH (ctime is now) and leave it alone
    assert out == {"restored": [], "reclaimed": []}
    assert os.path.isdir(aside)
    # outside the window the same aside is rolled back to live
    out = sim.sweep_index(root, min_age_s=0.0)
    assert out["restored"] == ["_old_cell_7_12345"]
    assert os.path.isdir(os.path.join(root, "cell_id=7"))


# ---------------------------------------------------------------------------
# ADVICE r8 #3: at min_age_s=0 the sweep must process every aside
# unconditionally — the stat is skipped entirely, so even a dir whose
# stat would transiently fail cannot be silently skipped and left
# stranding its cell.


def test_sweep_default_age_skips_stat(tmp_path, monkeypatch):
    root = str(tmp_path / "idx")
    live = os.path.join(root, "cell_id=3")
    os.makedirs(live)
    os.rename(live, os.path.join(root, "_old_cell_3_999"))

    real_stat = os.stat

    def _boom(p, **kw):
        if "_old_cell_" in str(p) or "_compact_" in str(p):
            raise OSError("transient stat failure")
        return real_stat(p, **kw)

    monkeypatch.setattr(os, "stat", _boom)
    out = sim.sweep_index(root, min_age_s=0.0)
    assert out["restored"] == ["_old_cell_3_999"]


# ---------------------------------------------------------------------------
# hashed-n-gram DSIR (VERDICT r8 task 8): with enough buckets that no two
# fixture tokens collide, the bucketed math is TOKEN-IDENTICAL to the
# unhashed form (bucket counts = token counts, occupied buckets = vocab),
# so the weights must agree to the full 6-dp contract. The gated 10k-bucket
# form is oracled exactly in test_workload; this pins the collision-error
# story: error comes ONLY from bucket collisions, not from the rewrite.


def test_dsir_hashed_matches_unhashed_when_collision_free(spark):
    from execute_sync_spark.functions import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = docs.filter(F.col("lang") == "en")
    exact = {
        r.doc_id: (r.n_tokens, r.dsir_weight)
        for r in curation.dsir_weights(docs, target).collect()
    }
    hashed = {
        r.doc_id: (r.n_tokens, r.dsir_weight)
        for r in curation.dsir_weights_hashed(docs, target, n_buckets=1 << 30).collect()
    }
    assert exact.keys() == hashed.keys()
    for k in exact:
        assert exact[k][0] == hashed[k][0]
        assert abs(exact[k][1] - hashed[k][1]) <= 1e-6, (k, exact[k], hashed[k])


def test_dsir_hashed_state_is_bounded(spark):
    """The whole point of the hashed twin: frequency-table rows never
    exceed n_buckets no matter the vocabulary."""
    from execute_sync_spark.functions import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation.dsir_weights_hashed(docs, docs.limit(50), n_buckets=64)
    assert out.count() == docs.count()  # every doc scored despite heavy collisions


# ---------------------------------------------------------------------------
# approx-percentile CCNet (VERDICT r8 task 7): the one-pass threshold form
# must place nearly every document in the same bucket as the exact NTILE
# tiling — disagreement is confined to tile boundaries.


def test_ccnet_approx_agrees_with_exact_tiling(spark):
    from execute_sync_spark.functions import text

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = text.ccnet_buckets(docs).select("doc_id", "lang", F.col("bucket").alias("e"))
    approx = text.ccnet_buckets_approx(docs).select("doc_id", F.col("bucket").alias("a"))
    j = exact.join(approx, "doc_id").cache()
    try:
        total = j.count()
        agree = j.filter(F.col("a") == F.col("e")).count()
        assert total > 0
        assert agree / total >= 0.90, f"{agree}/{total}"
        # output contract identical to the exact form
        assert set(text.ccnet_buckets_approx(docs).columns) == {
            "doc_id", "lang", "n_tokens", "avg_logprob", "bucket",
        }
    finally:
        j.unpersist()


# ---------------------------------------------------------------------------
# valved containment (VERDICT r8 task 3): the gated _scaled twin is oracled
# exactly in test_workload (same df cutoff both sides); here just pin that
# the valve path engages (df-filter aggregation present in the plan) and
# both forms execute. Note the valved result is NOT a subset of the
# unvalved one — sizes shrink with the vocabulary, so ratios can drift
# upward as the cutoff tightens (same contract as the Jaccard twin).


def test_containment_valve_bounds_join_rows(spark):
    from execute_sync_spark.functions import dedupe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    valved = dedupe.containment_pairs(docs, threshold=0.5, max_df=20)
    unvalved = dedupe.containment_pairs(docs, threshold=0.5)
    # both forms run; the valved plan contains the df-filter aggregation
    plan = valved._jdf.queryExecution().executedPlan().toString()
    assert "count" in plan.lower()
    assert valved.count() >= 0 and unvalved.count() >= 0


# ---------------------------------------------------------------------------
# sqrt(N)-cell SemDeDup (VERDICT r8 task 2): the bench-only deployment form
# (kmeans_fit_sample + BLAS assignment) has no DuckDB oracle — k-means
# centroids aren't SQL-reproducible — so verify its verdicts INDEPENDENTLY:
# recompute every in-cell lower-id max similarity brute-force in numpy and
# check each keep/drop decision, plus determinism across invocations.


def test_semantic_sqrt_verdict_shape(spark):
    import numpy as np

    from execute_sync_spark.plans import workload

    rows = workload.dedup_semantic_sqrt(spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert {r.vec_id for r in rows} == set(emb)  # one verdict per vector
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r.vec_id)
    verdict = {r.vec_id: r.kept for r in rows}

    def cos4(a, b):
        with np.errstate(divide="ignore", invalid="ignore"):
            s = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        return float(sim._np_round_half_up(np.array([s]), 4)[0])

    n_dropped = 0
    for cell, ids in by_cell.items():
        ids = sorted(ids)
        for i, vid in enumerate(ids):
            sims = [cos4(emb[vid], emb[o]) for o in ids[:i]]
            has_mate = any(s >= 0.35 for s in sims if not np.isnan(s))
            assert verdict[vid] == (not has_mate), (vid, cell, sims[:5])
            n_dropped += int(has_mate)
    assert n_dropped > 0  # the fixture corpus contains near-dups; some drop

    # deterministic: sample fit + BLAS assignment give identical verdicts
    again = {r.vec_id: r.kept for r in workload.dedup_semantic_sqrt(spark, SF_DIR).collect()}
    assert again == verdict


# ---------------------------------------------------------------------------
# recursive-CTE plan-integrity pin (VERDICT r8 task 10 / What's-wrong #6):
# Spark 4.1's optimizer rewrites the recursive CTE's anchor attribute to a
# NEW exprId, so the analyzed and optimized plans disagree on the output
# user_id exprId (logged as a plan-integrity warning). Values are correct
# today — the row is DuckDB-oracled in test_workload and the driver gate —
# but this is the warning class that precedes wrong-answer bugs on
# upgrade. Pin BOTH facts: (a) the output contract (names/types) survives
# optimization, and (b) the exprId divergence is PRESENT. If (b) starts
# failing after a Spark upgrade, the upstream quirk was fixed — delete
# this tolerance; if (a) ever fails, stop trusting the query before the
# oracle even runs.


def test_recursive_cte_plan_integrity_pinned(spark):
    from execute_sync_spark.plans import workload

    df = workload.q_recursive_hierarchy(spark, SF_DIR)
    qe = df._jdf.queryExecution()

    def _attrs(plan):  # scala Seq -> python list
        out = plan.output()
        return [out.apply(i) for i in range(out.size())]

    analyzed = [(a.name(), a.dataType().simpleString()) for a in _attrs(qe.analyzed())]
    optimized = [(a.name(), a.dataType().simpleString()) for a in _attrs(qe.optimizedPlan())]
    assert analyzed == optimized  # (a) the output contract is stable

    a_ids = [a.exprId().id() for a in _attrs(qe.analyzed())]
    o_ids = [a.exprId().id() for a in _attrs(qe.optimizedPlan())]
    # (b) the known Spark 4.1 divergence: the recursion anchor's user_id
    # gets a fresh exprId during optimization; depth/sum ids are stable
    assert a_ids[0] != o_ids[0], (
        "recursive-CTE exprId divergence is gone — Spark fixed the "
        "plan-integrity quirk; delete this tolerance (and the registry "
        "comment) after confirming the oracle row stays green"
    )
    assert a_ids[1:] == o_ids[1:]
