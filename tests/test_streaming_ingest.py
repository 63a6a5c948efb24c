"""Streaming ingest (file stream + foreachBatch) and idempotent txn appends."""

import json
import os

from pyspark.sql import functions as F

from execute_sync_spark.landing import land_ndjson_lines
from execute_sync_spark.sinks import ParquetSink
from execute_sync_spark.streaming import stream_sync
from tests.fixtures import feed


def test_stream_sync_discovers_and_checkpoints(spark, tmp_path):
    feed_dir = tmp_path / "spool"
    feed_dir.mkdir()
    feed.write_batches(feed_dir)
    sink = ParquetSink(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    stream_sync(spark, str(feed_dir), sink, ckpt)
    total = sink.read().count()
    assert total == 11  # 4 + 5 + 2 valid docs (no compat chunking here)

    # a new page arrives; availableNow re-run processes ONLY the new file
    extra = {"$TYPE": "VENDOR", "DOCUMENT_ID": "vnd-09", "$VERSION": 1,
             "$AUTHOR_ID": "u-1", "$DATE": "2026-03-05T00:00:00Z", "$DELETED": False,
             "VENDOR_NAME": "Delta Works", "RATING": 2}
    with open(os.path.join(str(feed_dir), "batch_4.ndjson"), "w") as f:
        f.write(json.dumps(extra) + "\n")
    stream_sync(spark, str(feed_dir), sink, ckpt)
    assert sink.read().count() == total + 1
    # re-run with nothing new: checkpoint prevents reprocessing
    stream_sync(spark, str(feed_dir), sink, ckpt)
    assert sink.read().count() == total + 1


def test_txn_append_idempotent(spark, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "wh_txn"))
    landed = land_ndjson_lines(spark, feed.batch_lines()[0], feed.BATCH_DATES[0])
    n = sink.append(landed, txn_id="page-1")
    assert n == 4
    # same txn re-applied (crash between append and watermark save) -> no-op
    assert sink.append(landed, txn_id="page-1") == 0
    assert sink.read().count() == 4
    # a different txn id appends normally
    assert sink.append(landed, txn_id="page-2") == 4
    # txn markers survive prune
    sink.prune()
    assert sink.append(landed, txn_id="page-1") == 0


def test_sync_once_crash_replay_exactly_once(spark, tmp_path):
    """Watermark lost after upload -> the page is re-fetched; the txn guard
    makes the re-append a no-op (stronger than the reference's append+dedup)."""
    from execute_sync_spark.sources import FileFeedSource, WatermarkStore, sync_once

    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    feed.write_batches(feed_dir)
    sink = ParquetSink(spark, str(tmp_path / "wh2"))
    state = WatermarkStore(str(tmp_path / "st"))
    n1 = sync_once(spark, FileFeedSource(str(feed_dir)), sink, state)
    # simulate crash before watermark save: reset the cursor, re-sync
    state.save("1900-01-01T00:00:00Z")
    # FileFeedSource with the reset cursor replays everything; txn markers
    # absorb all three pages
    assert sync_once(spark, FileFeedSource(str(feed_dir)), sink, state) == 0
    assert sink.read().count() == n1


def test_stage_stream_dir_handles_directory_sources(spark, tmp_path):
    """Streaming queries must see the SAME rows whether the source is a
    single parquet file (testdata) or a Spark-written directory of
    part-files (the 10x synthesis). Symlinking a directory into the stream
    dir makes the non-recursive file-stream listing silently process an
    EMPTY stream — caught in round 5 when every stream_* 10x timing
    collapsed to ~0.2 s."""
    import os

    from execute_sync_spark.streaming.util import stage_stream_dir

    src_file = "/root/testdata/sf0.001/events.parquet"
    n_expected = spark.read.parquet(src_file).count()

    # Spark-written directory form of the same data, multiple part-files
    src_dir = str(tmp_path / "events.parquet")
    spark.read.parquet(src_file).repartition(3).write.parquet(src_dir)

    for src in (src_file, src_dir):
        staged = stage_stream_dir(src, prefix="t_stage_")
        got = spark.read.parquet(staged).count()
        assert got == n_expected, (src, got, n_expected)

    # replicas: the dedup double-replay shape
    staged2 = stage_stream_dir(src_dir, prefix="t_stage2_", replicas=2)
    assert spark.read.parquet(staged2).count() == 2 * n_expected

    # directory with no data files is an explicit error, not an empty stream
    empty = tmp_path / "empty.parquet"
    empty.mkdir()
    (empty / "_SUCCESS").touch()
    import pytest

    with pytest.raises(ValueError, match="no data files"):
        stage_stream_dir(str(empty))
