"""End-to-end ingest pipeline tests: source pagination + watermark resume +
sink append/views/prune + config precedence + CLI (SURVEY §2.A, §2.C, §3.1)."""

import http.server
import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from execute_sync_spark.config import resolve_config
from execute_sync_spark.sinks import ParquetSink
from execute_sync_spark.sources import (
    ExecuteClient,
    FileFeedSource,
    WatermarkStore,
    sync_once,
)
from tests.fixtures import feed


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    feed.write_batches(d)
    import shutil

    shutil.copy(
        os.path.join(os.path.dirname(__file__), "fixtures", "schema.json"),
        d / "schema.json",
    )
    return str(d)


def test_file_source_pagination(feed_dir):
    src = FileFeedSource(feed_dir)
    pages = list(src.pages("1900-01-01T00:00:00Z"))
    assert len(pages) == 3
    assert [p.truncated for p in pages] == [True, True, False]
    assert pages[-1].highwater_mark == "batch_3.ndjson"
    # resume from the middle
    resumed = list(src.pages("batch_1.ndjson"))
    assert [p.highwater_mark for p in resumed] == ["batch_2.ndjson", "batch_3.ndjson"]


def test_sync_once_and_resume(spark, feed_dir, tmp_path):
    sink = ParquetSink(spark, str(tmp_path / "warehouse"))
    state = WatermarkStore(str(tmp_path / "state"))
    n = sync_once(spark, FileFeedSource(feed_dir), sink, state, chunk_size=feed.CHUNK_SIZE)
    assert n == 4 + 8 + 2  # valid docs incl. chunk rows (see test_landing)
    assert state.load() == "batch_3.ndjson"

    # nothing new -> no-op
    assert sync_once(spark, FileFeedSource(feed_dir), sink, state) == 0

    # a fourth page arrives -> only it is ingested
    extra = {"$TYPE": "VENDOR", "DOCUMENT_ID": "vnd-03", "$VERSION": 1,
             "$AUTHOR_ID": "u-1", "$DATE": "2026-03-04T00:00:00Z", "$DELETED": False,
             "VENDOR_NAME": "Cirrus Corp", "RATING": 4}
    with open(os.path.join(feed_dir, "batch_4.ndjson"), "w") as f:
        f.write(json.dumps(extra) + "\n")
    assert sync_once(spark, FileFeedSource(feed_dir), sink, state) == 1
    assert state.load() == "batch_4.ndjson"

    # force re-ingests everything; D1/D2 unchanged except batch dates
    from execute_sync_spark.operators import latest

    before = latest(sink.read()).count()
    assert sync_once(spark, FileFeedSource(feed_dir), sink, state, force=True,
                     chunk_size=feed.CHUNK_SIZE) == 15
    assert latest(sink.read()).count() == before


def test_sink_views_and_prune(spark, feed_dir, tmp_path):
    from execute_sync_spark.schema.model import parse_root_schema

    sink = ParquetSink(spark, str(tmp_path / "wh"))
    state = WatermarkStore(str(tmp_path / "st"))
    src = FileFeedSource(feed_dir)
    sync_once(spark, src, sink, state, chunk_size=feed.CHUNK_SIZE)

    views = sink.create_views(parse_root_schema(src.fetch_schema()))
    assert {"AFE", "AFE_PARTNERS", "TICKET_LINES", "VENDOR"} <= set(views)
    assert spark.table("EXECUTE_DOCUMENTS_LATEST").count() > 0
    assert spark.sql("SELECT count(*) AS n FROM TICKET_LINES").first().n == 25

    removed = sink.prune()
    assert removed == 1  # the superseded afe-0001 v2 batch-2 copy
    assert sink.prune() == 0


def test_http_client_end_to_end(spark, tmp_path):
    """Exercise the real HTTP source against an in-process Execute-style
    server: Basic auth, limit/since params, highwater/truncated headers."""
    lines = feed.batch_lines()
    requests_seen = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            requests_seen.append((self.path, self.headers.get("Authorization")))
            if self.path.startswith("/fetch/document/schema"):
                body = json.dumps({"VENDOR": {"VENDOR_NAME": {
                    "NAME": "VENDOR_NAME", "ACTIVE": True, "TYPE": "TEXT", "NULLABLE": True}}})
                page = None
            else:
                since = self.path.split("since=")[1].split("&")[0]
                page = 0 if "1900" in since else int(since) + 1
                body = "\n".join(lines[page]) if page < len(lines) else ""
            self.send_response(200)
            if page is not None:
                self.send_header("X-Sync-Highwater-Mark", str(page))
                self.send_header("X-Sync-Truncated", "TRUE" if page < len(lines) - 1 else "FALSE")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):
            pass

    httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        client = ExecuteClient(
            f"http://127.0.0.1:{httpd.server_address[1]}", "key-id", "key-secret",
            max_documents=1000,
        )
        sink = ParquetSink(spark, str(tmp_path / "wh_http"))
        state = WatermarkStore(str(tmp_path / "st_http"))
        n = sync_once(spark, client, sink, state, chunk_size=feed.CHUNK_SIZE)
        assert n == 14  # same rows as file-based sync
        assert state.load() == "2"
        assert client.fetch_schema() == {"VENDOR": {"VENDOR_NAME": {
            "NAME": "VENDOR_NAME", "ACTIVE": True, "TYPE": "TEXT", "NULLABLE": True}}}
        # Basic auth actually sent
        assert all(auth and auth.startswith("Basic ") for _, auth in requests_seen)
        assert "limit=1000" in requests_seen[0][0]
    finally:
        httpd.shutdown()


def test_config_precedence(monkeypatch):
    """Mirrors the reference's only unit tests (config_test.go:35-77)."""
    cfg = resolve_config()
    assert cfg.max_documents == 10000 and cfg.wait == 600 and cfg.chunk_size == 10000

    monkeypatch.setenv("EXECUTESYNC_MAX_DOCUMENTS", "55")
    monkeypatch.setenv("EXECUTESYNC_INCLUDE_CALCS", "true")
    cfg = resolve_config()
    assert cfg.max_documents == 55 and cfg.include_calcs is True

    cfg = resolve_config({"max_documents": 77})
    assert cfg.max_documents == 77  # CLI beats env
    assert cfg.include_calcs is True  # env still applies where no flag


def test_config_env_file(monkeypatch, tmp_path):
    """.env loading (config.go:99-108): defaults < file < env < flags."""
    env_file = tmp_path / ".env"
    env_file.write_text(
        "# comment\n"
        "EXECUTESYNC_MAX_DOCUMENTS=123\n"
        "export EXECUTESYNC_WAIT=42\n"
        'EXECUTESYNC_EXECUTE_URL="https://example.test/api"\n'
        "EXECUTESYNC_CHUNK_SIZE=99 # inline comment stripped (godotenv)\n"
        'EXECUTESYNC_DATABASE_DSN="dsn with # kept when quoted"\n'
        "malformed line without equals ignored? no - has no =\n"
    )
    cfg = resolve_config(env_file=str(env_file))
    assert cfg.max_documents == 123          # file beats default
    assert cfg.wait == 42                    # export prefix stripped
    assert cfg.execute_url == "https://example.test/api"  # quotes stripped
    assert cfg.chunk_size == 99              # unquoted inline comment dropped
    assert cfg.database_dsn == "dsn with # kept when quoted"

    monkeypatch.setenv("EXECUTESYNC_MAX_DOCUMENTS", "55")
    cfg = resolve_config(env_file=str(env_file))
    assert cfg.max_documents == 55           # process env beats file (godotenv)
    assert cfg.wait == 42

    cfg = resolve_config({"max_documents": 77}, env_file=str(env_file))
    assert cfg.max_documents == 77           # flags beat both

    # CWD discovery: .env preferred over config.env
    monkeypatch.chdir(tmp_path)
    (tmp_path / "config.env").write_text("EXECUTESYNC_WAIT=7\n")
    cfg = resolve_config()
    assert cfg.wait == 42                    # .env wins
    env_file.unlink()
    cfg = resolve_config()
    assert cfg.wait == 7                     # falls back to config.env


def test_cli_push_and_views(spark, feed_dir, tmp_path, capsys):
    from execute_sync_spark.cli import main

    wh = str(tmp_path / "cli_wh")
    common = [
        "--execute-url", f"file://{feed_dir}",
        "--database-type", "parquet", "--database-dsn", wh,
        "--state-dir", str(tmp_path / "cli_state"),
        "--compat-chunking", "--chunk-size", str(feed.CHUNK_SIZE),
    ]
    assert main(["push", *common]) == 0
    assert "landed 14 documents" in capsys.readouterr().out
    assert main(["create_views", *common]) == 0
    assert "AFE" in capsys.readouterr().out
    assert main(["prune", *common]) == 0
    assert "pruned 1" in capsys.readouterr().out
    assert main(["config", *common]) == 0
    out = capsys.readouterr().out
    assert json.loads(out)["database_type"] == "parquet"


def test_cli_sync_loop_bounded(spark, feed_dir, tmp_path, capsys):
    """The sync command's poll loop, bounded to one iteration for tests."""
    from execute_sync_spark.cli import main

    args = [
        "sync",
        "--execute-url", f"file://{feed_dir}",
        "--database-type", "parquet", "--database-dsn", str(tmp_path / "sync_wh"),
        "--state-dir", str(tmp_path / "sync_state"),
        "--wait", "0", "--max-iterations", "1",
    ]
    assert main(args) == 0
    wm = (tmp_path / "sync_state" / "last_sync_date.txt").read_text()
    assert wm == "batch_3.ndjson"
