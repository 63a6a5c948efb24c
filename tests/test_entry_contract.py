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
    # the driver gates the first 50 entries: keep the LLM-pipeline
    # extension surface (dedup/text/curate/sim/mm/stream/...) in front
    first50 = list(qs)[:50]
    assert sum(k.startswith(("q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9"))
               for k in first50) == 0


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns
