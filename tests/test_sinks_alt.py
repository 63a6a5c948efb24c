"""Alternative warehouse sinks: DuckDB (real SQL warehouse, row-sink parity)
and ORC file format."""

from pyspark.sql import functions as F

from execute_sync_spark.landing import land_ndjson_lines
from execute_sync_spark.sinks import DuckDBSink, ParquetSink
from execute_sync_spark.sources import FileFeedSource, WatermarkStore, sync_once
from tests.fixtures import feed


def _feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir(exist_ok=True)
    feed.write_batches(d)
    import os
    import shutil

    shutil.copy(
        os.path.join(os.path.dirname(__file__), "fixtures", "schema.json"),
        d / "schema.json",
    )
    return str(d)


def test_duckdb_sink_end_to_end(spark, tmp_path):
    import duckdb

    sink = DuckDBSink(spark, str(tmp_path / "wh.duckdb"))
    state = WatermarkStore(str(tmp_path / "st"))
    n = sync_once(spark, FileFeedSource(_feed_dir(tmp_path)), sink, state,
                  chunk_size=feed.CHUNK_SIZE)
    assert n == 14

    # the warehouse is a real SQL database: query it directly
    con = duckdb.connect(str(tmp_path / "wh.duckdb"))
    assert con.execute("SELECT COUNT(*) FROM EXECUTE_DOCUMENTS").fetchone()[0] == 14

    # D3 as actual warehouse DML
    assert sink.prune() == 1
    assert sink.prune() == 0
    assert con.execute("SELECT COUNT(*) FROM EXECUTE_DOCUMENTS").fetchone()[0] == 13

    # INSERT OR REPLACE parity: re-appending the exact same landed batch
    # (same PKs) replaces instead of duplicating
    replay = land_ndjson_lines(spark, feed.batch_lines()[0], feed.BATCH_DATES[0])
    n13 = con.execute("SELECT COUNT(*) FROM EXECUTE_DOCUMENTS").fetchone()[0]
    sink.append(replay)
    sink.append(replay)
    assert con.execute("SELECT COUNT(*) FROM EXECUTE_DOCUMENTS").fetchone()[0] == n13 + 4

    # views compile over the DuckDB-backed landing
    from execute_sync_spark.schema.model import parse_root_schema

    views = sink.create_views(parse_root_schema(FileFeedSource(_feed_dir(tmp_path)).fetch_schema()))
    assert spark.sql("SELECT count(*) AS n FROM TICKET_LINES").first().n == 25
    assert {"AFE", "VENDOR"} <= set(views)


def test_orc_sink_roundtrip(spark, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "wh_orc"), file_format="orc")
    for lines, bd in zip(feed.batch_lines(), feed.BATCH_DATES):
        sink.append(land_ndjson_lines(spark, lines, bd, chunk_size=feed.CHUNK_SIZE))
    assert sink.read().count() == 14
    assert sink.prune() == 1
    assert sink.read().count() == 13
    # partitioned layout preserved, typed reads work
    afe = sink.read().filter(F.col("type") == "AFE")
    assert afe.count() == 6
