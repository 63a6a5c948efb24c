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
    # only deliberately rows-only ops lack an oracle
    assert set(qs) - set(oracles) == {"mm_features"}
    # the driver gates the first 50 entries. Round-5 contract (VERDICT r4
    # tasks 1+7): the 8 queries never driver-gated before round 5 and the
    # reserved relational-core rotation slots must sit inside the window,
    # alongside the extension surface.
    first50 = set(list(qs)[:50])
    must_gate = {
        # never green on the driver before round 5
        "q_recursive_hierarchy", "q_range_band_join", "q_scd2_history",
        "q_merge_upsert", "q_skew_salted_agg", "q_asof_join_banded",
        "q_approx_distinct", "dedup_embedding_pairs_expr", "mm_features",
        # core rotation slots (re-gated on regenerated testdata)
        "q1_pricing_summary", "d1_latest_batch", "d3_superseded",
        "v_shred_props",
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
