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
        # never green on the driver before round 6
        "sim_ivf_multiprobe", "sim_ivf_indexed", "q_merge_upsert",
        "mm_features", "dedup_substring_spans", "dedup_span_removal",
        "dedup_canonical_keep", "curate_leakage_safe_split",
        # late-round-6 additions gate immediately (never declare a new op
        # outside the window)
        "dedup_semantic", "text_unigram_logprob", "sim_pq_topk",
        "text_bm25_topk", "q_gapfill_timeseries",
        "q_cohort_retention", "sim_ivfpq_topk",
        # stale greens (r01/r02) re-gated on current testdata
        "d2_latest_version", "d2_asof_snapshot", "ingest_roundtrip",
        "v_variant_shred", "q9_profit_by_nation_year",
        "q21_waiting_supplier",
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
