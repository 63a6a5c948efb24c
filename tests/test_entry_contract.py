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
    # the driver gates the first 50 entries. Round-15 rotation
    # (recomputed from the CORRECTNESS_r*.json files; entering
    # distribution r11:24 / r12:46 / r13:47 / r14:50): the 4 new r15
    # ops gate first, then the 1 row whose physical plan changed this
    # round (dedup_minhash_est: one-shingle-pass threading, ADVICE r14),
    # then the ENTIRE 24-row r11 age-boundary queue (all relational
    # §2.X — the VERDICT r14 task 2 list), then a 21-row family-diverse
    # slice of the r12 queue. The 25 deferred r12 rows lead the r16
    # queue — full list and rationale at workload._GATE_HEAD_R15.
    from execute_sync_spark.plans import workload

    first50 = list(qs)[:50]
    assert first50 == workload._GATE_HEAD_R15
    assert first50[:5] == [
        "curate_pipeline_mm", "curate_quality_classifier",
        "curate_quality_classifier_hashed", "curate_pipeline_classifier",
        "dedup_minhash_est",
    ]
    # the whole r11 age-boundary queue is inside the window
    assert {
        "q18_large_volume_customers", "q19_disjunctive_predicates",
        "q20_supplier_semi_chain", "q22_idle_customers", "q_asof_join",
        "q_asof_join_merge", "q_conditional_agg", "q_cube_qty",
        "q_customers_without_orders", "q_date_funcs", "q_distinct_nations",
        "q_except_intersect", "q_grouping_sets", "q_having_big_customers",
        "q_percentiles", "q_pivot_status", "q_rollup_status", "q_sessionize",
        "q_string_agg", "q_string_funcs", "q_top_supplier_per_nation",
        "q_unpivot_measures", "q_window_funcs", "q_window_top3_orders",
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
