"""Catalog registration: external landing table + materialized view forest.

Reference parity: the reference registers its warehouse tables/views once at
sink setup (src/internal/warehouses/*/sql.go); here the catalog is Spark's,
and the entries are metadata-only (external table) or parquet snapshots
(materialized views)."""

import os
import shutil

import pytest

from execute_sync_spark.operators import (
    drop_database,
    materialize_views,
    register_landing_table,
)
from execute_sync_spark.schema.model import parse_root_schema
from execute_sync_spark.sinks import ParquetSink
from execute_sync_spark.sources import FileFeedSource, WatermarkStore, sync_once
from tests.fixtures import feed


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    feed.write_batches(d)
    shutil.copy(
        os.path.join(os.path.dirname(__file__), "fixtures", "schema.json"),
        d / "schema.json",
    )
    return str(d)


def test_catalog_registration_and_materialized_views(spark, feed_dir, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "wh"))
    state = WatermarkStore(str(tmp_path / "st"))
    src = FileFeedSource(feed_dir)
    sync_once(spark, src, sink, state, chunk_size=feed.CHUNK_SIZE)

    # external table: metadata-only registration over the sink directory
    register_landing_table(spark, sink.path, name="EXECUTE_DOCUMENTS_CAT")
    cat_rows = spark.table("EXECUTE_DOCUMENTS_CAT").count()
    assert cat_rows == spark.read.parquet(sink.path).count() > 0
    # the partition column survives the catalog round-trip
    assert "type" in spark.table("EXECUTE_DOCUMENTS_CAT").columns
    # catalog-routed partition pruning: filter on the partition column works
    n_afe = (
        spark.table("EXECUTE_DOCUMENTS_CAT").filter("type = 'AFE'").count()
    )
    assert 0 < n_afe < cat_rows

    # materialized views: persistent parquet snapshots of the compiled forest
    views = sink.create_views(parse_root_schema(src.fetch_schema()))
    try:
        written = materialize_views(spark, views, database="execute_views_t")
        assert f"execute_views_t.AFE" in written
        # drop the temp views: the materialized tables must answer on their own
        for name in views:
            spark.catalog.dropTempView(name)
        assert spark.table("execute_views_t.AFE").count() == 3
        got = spark.sql(
            "SELECT count(*) AS n, sum(QTY) AS q FROM execute_views_t.TICKET_LINES"
        ).first()
        assert (got.n, got.q) == (25, 300)
        # the session catalog stores identifiers lowercased; lookups stay
        # case-insensitive (spark.table("execute_views_t.AFE") above)
        tables = {t.name.upper() for t in spark.catalog.listTables("execute_views_t")}
        assert {"AFE", "AFE_PARTNERS", "TICKET_LINES", "VENDOR"} <= tables
    finally:
        drop_database(spark, "execute_views_t")
        spark.sql("DROP TABLE IF EXISTS EXECUTE_DOCUMENTS_CAT")
