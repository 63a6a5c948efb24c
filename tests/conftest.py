from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from execute_sync_spark.session import get_spark

    spark = get_spark("execute_sync_spark_tests", cpus="8")
    yield spark


@pytest.fixture(scope="session")
def landed(spark, tmp_path_factory):
    """The fixture feed landed batch-by-batch (with compat chunking) into one
    append-only landing DataFrame, plus a DuckDB connection holding the exact
    same rows as table ``landing`` (the oracle)."""
    import duckdb

    from execute_sync_spark.landing import land_ndjson_lines
    from tests.fixtures import feed

    dfs = [
        land_ndjson_lines(spark, lines, bd, chunk_size=feed.CHUNK_SIZE)
        for lines, bd in zip(feed.batch_lines(), feed.BATCH_DATES)
    ]
    df = dfs[0]
    for other in dfs[1:]:
        df = df.unionByName(other)
    df = df.cache()
    df.count()

    con = duckdb.connect()
    pdf = df.toPandas()
    con.register("landing_src", pdf)
    con.execute("CREATE TABLE landing AS SELECT * FROM landing_src")
    return df, con


@pytest.fixture(scope="session")
def root_schema():
    from execute_sync_spark.schema import load_root_schema

    return load_root_schema(os.path.join(REPO_ROOT, "tests", "fixtures", "schema.json"))
