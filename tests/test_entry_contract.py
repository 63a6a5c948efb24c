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
    # the driver gates the first 50 entries. Round-13 rotation
    # (recomputed from the CORRECTNESS_r*.json files; entering
    # distribution r09:2 / r10:49 / r11:50 / r12:50): the 6 new ops
    # gate first, then the 3 rows whose SEMANTICS changed this round
    # re-gate (64-bit band-pair phash; sampled recall truth side — a
    # changed oracle never sits outside the window), then the queue
    # fills oldest-first: the 2 r09 rows and 39 of the 49 r10 rows.
    # 9 + 2 + 49 > 50; per the family-representation precedent the 10
    # deferred rows come from the queue's most-populous families (all
    # 8 r10 sim_ rows + text_token_count + dedup_simhash; every family
    # stays in-window several times over), leading slots 51+ as the
    # round-14 queue.
    first50 = set(list(qs)[:50])
    must_gate = {
        # the round-13 new ops + the 3 semantics re-gates
        "mm_phash_indexed", "sim_hybrid_rrf", "curate_temperature_mix",
        "graph_label_propagation", "text_bm25_indexed",
        "curate_apply_mixture",
        "sim_knn_join_sqrt_recall", "mm_phash_pairs", "mm_phash_keep",
        # the r09 queue head
        "mm_features", "stream_window_counts",
        # 39 of the 49 r10-green queue rows
        "graph_centrality_keep", "dedup_jaccard_pairs",
        "dedup_substring_spans", "dedup_span_removal",
        "dedup_embedding_pairs", "dedup_clusters", "dedup_canonical_keep",
        "curate_leakage_safe_split",
        "text_fingerprint", "text_tfidf_top_term", "text_unigram_logprob",
        "text_bm25_topk", "curate_bloom_contamination",
        "curate_quality_rules", "curate_pipeline", "sim_recall_at_k",
        "stream_sessionize_flushed", "stream_enrich_join", "stream_dedup",
        "d2_latest_version", "d2_asof_snapshot", "ingest_roundtrip",
        "v_variant_shred", "q_merge_upsert", "q9_profit_by_nation_year",
        "q21_waiting_supplier", "q_gapfill_timeseries",
        "q_cohort_retention", "text_ccnet_buckets", "curate_dsir_weights",
        "curate_token_budget", "text_corpus_stats",
        "dedup_containment_pairs", "q_rolling_revenue",
        "dedup_jaccard_pairs_scaled", "mm_frame_sample",
        "q2_min_cost_supplier", "q3_top_orders", "q4_priority_exists",
    }
    assert len(must_gate) == 50
    assert must_gate <= first50, sorted(must_gate - first50)
    # the round-14 queue (8 deferred r10 sim_ + text_ + dedup_) leads 51+
    assert list(qs)[50:60] == [
        "sim_ivf_topk", "sim_ivf_multiprobe", "sim_lsh_topk",
        "sim_pq_topk", "sim_quantized_topk", "sim_ivfpq_topk",
        "sim_ivfpq_indexed", "sim_lsh_multiprobe", "text_token_count",
        "dedup_simhash",
    ]
    # the extension families stay represented in the window
    for prefix in ("dedup_", "text_", "curate_", "sim_", "mm_", "stream_", "graph_"):
        assert any(k.startswith(prefix) for k in first50), prefix


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns
