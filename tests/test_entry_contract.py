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
        # the round-9 new ops gate immediately (never declare a new op
        # outside the window)
        "dedup_containment_pairs_scaled", "sim_lsh_indexed",
        "text_ccnet_buckets_approx", "curate_dsir_weights_hashed",
        "v_variant_shred_sink", "q_unpivot_sink",
        # the 9 r04-stale rows (4 rounds old after r8's skipped rotation)
        "curate_chunk_windows", "d_version_churn", "text_repetition",
        "sim_range_search", "stream_sliding_counts", "text_bigram_top",
        "curate_pack_sequences", "sim_cosine_topk_vec", "curate_weighted_sample",
        # the 19 r05-stale rows (spot-check the corners; the full 19 are
        # in the window per the registry comment)
        "stream_sessionize_closed", "d2_change_feed", "mm_resize_plan",
        "dedup_embedding_pairs_expr", "q_recursive_hierarchy",
        "q_approx_distinct", "q_skew_salted_agg",
        # permanent relational core restored after its one-round suspension
        "q1_pricing_summary", "d1_latest_batch", "d3_superseded", "v_shred_props",
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
