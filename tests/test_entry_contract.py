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
    # the driver gates the first 50 entries. Round-11 rotation (VERDICT
    # r10 task 4, executing the documented queue): ALL 36 r08-green rows
    # (the relational core) enter, plus the round's 12 new ops, plus the
    # 2 oldest remaining r09-green rows filling the window.
    first50 = set(list(qs)[:50])
    must_gate = {
        # the round-11 new ops gate immediately (never declare a new op
        # outside the window)
        "graph_clusters_incremental",
        "graph_doc_pagerank_scaled", "graph_centrality_keep_scaled",
        "text_boilerplate_removal", "dedup_lsh_recall", "curate_domain_cap",
        "curate_dsir_resample", "sim_knn_join", "sim_knn_join_cells",
        "sim_ivfpq_rerank", "curate_pipeline_fuzzy", "curate_shard_assign",
        # the 36 r08-green rows — the relational core IS the queue, so
        # pin all of it (no spot-check: this was the oldest evidence)
        "q5_revenue_by_nation", "q6_forecast_revenue", "q7_volume_shipping",
        "q8_market_share", "q10_returned_items", "q11_important_parts",
        "q12_ship_lag_buckets", "q13_order_count_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_variety",
        "q17_small_quantity", "q18_large_volume_customers",
        "q19_disjunctive_predicates", "q20_supplier_semi_chain",
        "q22_idle_customers", "q_customers_without_orders",
        "q_window_top3_orders", "q_window_funcs", "q_rollup_status",
        "q_distinct_nations", "q_percentiles", "q_pivot_status",
        "q_cube_qty", "q_grouping_sets", "q_except_intersect",
        "q_string_funcs", "q_date_funcs", "q_top_supplier_per_nation",
        "q_having_big_customers", "q_conditional_agg", "q_asof_join",
        "q_asof_join_merge", "q_unpivot_measures", "q_string_agg",
        "q_sessionize",
        # the 2 r09-green fills (sim_range_search, curate_chunk_windows,
        # text_repetition displaced by the first 6 new ops,
        # dedup_containment_pairs_scaled / text_ccnet_buckets_approx /
        # curate_dsir_weights_hashed by the next 3, sim_lsh_indexed by
        # sim_knn_join_cells, d_version_churn by sim_ivfpq_rerank,
        # v_variant_shred_sink by curate_pipeline_fuzzy — each displaced
        # family keeps another gated member; stream_sliding_counts and
        # mm_resize_plan stay so every family prefix is represented)
        "stream_sliding_counts", "mm_resize_plan",
    }
    assert len(must_gate) == 50
    assert must_gate <= first50, sorted(must_gate - first50)
    # the extension families stay represented in the window
    for prefix in ("dedup_", "text_", "curate_", "sim_", "mm_", "stream_", "graph_"):
        assert any(k.startswith(prefix) for k in first50), prefix


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns
