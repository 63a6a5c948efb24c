"""Incremental Execute-API document source (SURVEY §2.A S1-S5).

Semantics mirrored from /root/reference/src/cmd_sync.go:77-206:

- ``GET {url}/fetch/document/?limit=N&since=MARK[&calc=true]`` with HTTP Basic
  auth (key id / key secret); the NDJSON body is one page of documents.
- Response headers: ``X-Sync-Highwater-Mark`` (next cursor) and
  ``X-Sync-Truncated`` (loop while != FALSE) — S2/S3 pagination.
- Watermark state: ``last_sync_date.txt`` under STATE_DIR, written only after
  a successful upload (crash-consistency: re-runs re-ingest, dedup absorbs).
- ``force`` resets the cursor to 1900-01-01 (full refresh).
- Schema: ``GET {url}/fetch/document/schema[?calc=true]``.

``FileFeedSource`` is the file-based fake for tests: a directory of
``*.ndjson`` pages served in name order with synthetic highwater marks.
"""

from __future__ import annotations

import base64
import json
import os
import urllib.request
from dataclasses import dataclass
from typing import Iterator, Optional

FORCE_MARK = "1900-01-01T00:00:00Z"
STATE_FILE = "last_sync_date.txt"


@dataclass
class FetchPage:
    lines: list[str]
    highwater_mark: Optional[str]
    truncated: bool


class WatermarkStore:
    """last_sync_date.txt-compatible cursor state (cmd_sync.go:189-206)."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _path(self) -> str:
        return os.path.join(self.state_dir, STATE_FILE)

    def load(self, force: bool = False) -> str:
        if force:
            return FORCE_MARK
        try:
            with open(self._path) as f:
                return f.read().strip() or FORCE_MARK
        except FileNotFoundError:
            return FORCE_MARK

    def save(self, mark: str) -> None:
        with open(self._path, "w") as f:
            f.write(mark)


class ExecuteClient:
    """HTTP source. Pages stream lazily; each page is one NDJSON body."""

    def __init__(self, url: str, key_id: str, key_secret: str, max_documents: int = 10000, include_calcs: bool = False, timeout: int = 120):
        self.url = url.rstrip("/")
        self.max_documents = max_documents
        self.include_calcs = include_calcs
        self.timeout = timeout
        token = base64.b64encode(f"{key_id}:{key_secret}".encode()).decode()
        self._auth = f"Basic {token}"

    def _get(self, path: str) -> tuple[bytes, dict]:
        req = urllib.request.Request(self.url + path, headers={"Authorization": self._auth})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read(), {k.lower(): v for k, v in resp.headers.items()}

    def fetch_page(self, since: str) -> FetchPage:
        path = f"/fetch/document/?limit={self.max_documents}&since={since}"
        if self.include_calcs:
            path += "&calc=true"
        body, headers = self._get(path)
        return FetchPage(
            lines=[l for l in body.decode("utf-8").splitlines() if l.strip()],
            highwater_mark=headers.get("x-sync-highwater-mark"),
            truncated=headers.get("x-sync-truncated", "FALSE").upper() != "FALSE",
        )

    def pages(self, since: str) -> Iterator[FetchPage]:
        """S2: repeat while the server reports truncation."""
        while True:
            page = self.fetch_page(since)
            yield page
            if not page.truncated or not page.highwater_mark:
                break
            since = page.highwater_mark

    def fetch_schema(self) -> dict:
        path = "/fetch/document/schema"
        if self.include_calcs:
            path += "?calc=true"
        body, _ = self._get(path)
        return json.loads(body)


class FileFeedSource:
    """Test/file-based source: ``*.ndjson`` files in name order, one per page.

    Highwater mark = the file's name; a page is truncated iff more files
    follow. A ``schema.json`` in the directory serves the schema fetch.
    """

    def __init__(self, feed_dir: str, **_ignored):
        self.feed_dir = feed_dir

    def _files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.feed_dir) if f.endswith(".ndjson")
        )

    def pages(self, since: str) -> Iterator[FetchPage]:
        files = [f for f in self._files() if f > since] if since != FORCE_MARK else self._files()
        for i, fname in enumerate(files):
            with open(os.path.join(self.feed_dir, fname)) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
            yield FetchPage(lines=lines, highwater_mark=fname, truncated=i < len(files) - 1)

    def fetch_schema(self) -> dict:
        with open(os.path.join(self.feed_dir, "schema.json")) as f:
            return json.load(f)
