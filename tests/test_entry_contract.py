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
    # the driver gates the first 50 entries. Round-6 contract (VERDICT r5
    # tasks 1c/4/5): the never-gated / stale-green rotation set and the
    # permanent relational-core slots must sit inside the window,
    # alongside the extension surface.
    first50 = set(list(qs)[:50])
    must_gate = {
        # the round-7 new op gates immediately (never declare a new op
        # outside the window)
        "sim_ivfpq_indexed", "text_ccnet_buckets", "curate_dsir_weights",
        "curate_token_budget", "text_corpus_stats",
        "dedup_containment_pairs", "q_rolling_revenue", "sim_recall_at_k",
        # r04-stale greens re-gated on current testdata (3 of 12; the
        # deferred nine lead slots 51+ for round 8)
        "dedup_jaccard_pairs_scaled",
        "mm_frame_sample", "stream_dedup",
        # r02-stale greens: the TPC-H core + window/pivot/grouping-sets/
        # percentile surface (spot-check the corners; the full 39 are in
        # the window per the registry comment)
        "q2_min_cost_supplier", "q7_volume_shipping", "q13_order_count_distribution",
        "q22_idle_customers", "q_window_funcs", "q_pivot_status",
        "q_grouping_sets", "q_percentiles", "q_asof_join", "q_sessionize",
    }
    assert must_gate <= first50, sorted(must_gate - first50)
    # the extension families stay represented in the window
    for prefix in ("dedup_", "text_", "curate_", "sim_", "mm_", "stream_"):
        assert any(k.startswith(prefix) for k in first50), prefix


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns
