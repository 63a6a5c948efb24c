"""Driver-contract emulation: run every queries() entry and its oracle_sql()
side-by-side (like CORRECTNESS_r{N}.json does at sf0.01) and compare
order-insensitively. SF dir via SPARK_GRAFT_TEST_SF_DIR (default sf0.001)."""

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.util import assert_df_equal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _workload():
    from execute_sync_spark.plans import workload

    return workload


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        metafunc.parametrize("qname", list(_workload().QUERIES))


def test_query_against_oracle(spark, duck, qname):
    w = _workload()
    df = w.QUERIES[qname](spark, SF_DIR)
    sql = w.ORACLES.get(qname)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        n = df.count()
        assert n >= 0
        return
    assert_df_equal(df, duck.sql(sql), qname)
