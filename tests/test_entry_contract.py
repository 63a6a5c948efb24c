"""Guards on the driver contract itself: registry consistency, importability
of __spark_entry__, and entry() smoke on sf0.001."""

import importlib.util
import os

from tests.conftest import REPO_ROOT


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_oracles_subset_of_queries():
    mod = _entry_module()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(sql, str) and "SELECT" in sql.upper() for sql in oracles.values())
    # round 6: every declared query has an oracle (mm_features gained a
    # DuckDB byte-histogram reconstruction, VERDICT r5 #1b)
    assert set(qs) - set(oracles) == set()
    # the driver gates the first 50 entries. Round-14 rotation
    # (recomputed from the CORRECTNESS_r*.json files; entering
    # distribution r10:10 / r11:50 / r12:47 / r13:50): the 10 new r14
    # ops gate first, then the 4 rows whose semantics/plan changed this
    # round re-gate (12-pair covering band family + in-Arrow fold for
    # the three mm_phash rows; re-aliased recursive-CTE anchor), then
    # the whole r10 queue, then 30 r11 rows — all 14 non-relational
    # r11 rows (incl. the 3 cold-I/O anomaly rows) + 16 relational
    # oldest-first. The 20 deferred r11 rows are all relational q_*
    # (family stays in-window) and lead the r15 queue — the full list
    # and rationale live at workload._GATE_HEAD_R14.
    from execute_sync_spark.plans import workload

    first50 = list(qs)[:50]
    assert first50 == workload._GATE_HEAD_R14
    assert first50[:14] == [
        "text_char_entropy", "text_zipf_slope", "curate_sqrt_stratified",
        "graph_triangle_count", "sim_matryoshka_topk", "dedup_minhash_est",
        "text_vocab_hll", "q_quantiles_sketch", "text_lang_confusion",
        "sim_matryoshka_recall",
        "mm_phash_pairs", "mm_phash_keep", "mm_phash_indexed",
        "q_recursive_hierarchy",
    ]
    # the whole r10 age-boundary queue is inside the window
    assert {
        "dedup_simhash", "text_token_count", "sim_ivf_topk",
        "sim_ivf_multiprobe", "sim_ivfpq_topk", "sim_ivfpq_indexed",
        "sim_lsh_topk", "sim_lsh_multiprobe", "sim_pq_topk",
        "sim_quantized_topk",
    } <= set(first50)
    first50 = set(first50)
    # the extension families stay represented in the window
    for prefix in ("dedup_", "text_", "curate_", "sim_", "mm_", "stream_", "graph_"):
        assert any(k.startswith(prefix) for k in first50), prefix


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns
