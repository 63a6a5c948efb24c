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
    # the driver gates the first 50 entries. Round-16 rotation
    # (recomputed from the CORRECTNESS_r*.json files; entering
    # distribution r12:25 / r13:47 / r14:49 / r15:50): the 3 new r16
    # ops gate first, then the 2 rows re-gated because the classifier
    # body was factored into shared helpers (plan-change precedent),
    # then the 7 second-wave r16 ops (backoff LM + its streaming twin,
    # PMI + LLR collocations, paragraph dedup, BPE x2), then the ENTIRE
    # 25-row r12 age-boundary queue, then a 13-row family-diverse slice
    # of the r13 queue. The 34 deferred r13 rows lead the r17 queue —
    # full list and rationale at workload._GATE_HEAD_R16.
    from execute_sync_spark.plans import workload

    first50 = list(qs)[:50]
    assert first50 == workload._GATE_HEAD_R16
    assert first50[:12] == [
        "curate_pipeline_full", "stream_classifier_feed",
        "curate_mixture_semantic", "text_backoff_lm", "text_pmi_top",
        "text_llr_top", "dedup_paragraph_rewrite", "text_bpe_merges",
        "text_bpe_tokenize", "stream_backoff_lm_feed",
        "curate_quality_classifier", "curate_pipeline_classifier",
    ]
    # the whole r12 age-boundary queue is inside the window
    assert {
        "curate_mixture_weights", "curate_pack_sequences",
        "curate_stratified_sample", "curate_weighted_sample", "d3_superseded",
        "d_version_churn", "dedup_lsh_pairs", "dedup_minhash_sig",
        "dedup_semantic", "q_event_funnel", "q_range_band_join",
        "q_scd2_history", "q_skew_salted_agg", "q_unpivot_sink",
        "sim_cosine_topk_vec", "sim_range_search", "stream_sessionize_closed",
        "text_ccnet_buckets_approx", "text_lang_id", "text_redact_pii",
        "text_repetition", "text_stats", "v_explode_tokens", "v_shred_props",
        "v_variant_shred_sink",
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
