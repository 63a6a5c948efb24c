"""Every declared query must run (not crash) on EMPTY input tables.

At 100 TB empty inputs are routine — a partition-pruned scan that matches
nothing, a new tenant with no data yet, a filter window before any batch
landed. An operator that throws on zero rows (np.stack of an empty query
set, max() of nothing, head of an empty frame) is not production-shaped.
The contract checked here: every queries() entry returns a DataFrame that
collects (possibly zero rows) when every source table has its real schema
but no rows."""

import os

import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        src = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        src.limit(0).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    import importlib.util

    from tests.conftest import REPO_ROOT

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    failures = []
    for name, fn in mod.queries().items():
        try:
            rows = fn(spark, empty_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    assert not failures, "\n".join(failures)
