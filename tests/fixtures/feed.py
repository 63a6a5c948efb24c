"""Deterministic Execute-style document feed (FIXTURES.md §A2).

Three batches with strictly increasing batch dates; exercises versioning
(afe-0001 re-synced copy), soft delete (afe-0002 v3), null/empty fields
(afe-0003), chunk splitting (tkt-0001 with 25 LINES @ CHUNK_SIZE=10),
FK references (vnd-01/vnd-02), a malformed line and an unknown doc type.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone


def _dt(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


BATCH_DATES = [_dt("2026-03-01T00:00:00"), _dt("2026-03-02T00:00:00"), _dt("2026-03-03T00:00:00")]

CHUNK_SIZE = 10


def _afe(doc_id, version, date, deleted=False, author="u-7", **fields):
    rec = {
        "$TYPE": "AFE",
        "DOCUMENT_ID": doc_id,
        "$VERSION": version,
        "$AUTHOR_ID": author,
        "$DATE": date,
        "$DELETED": deleted,
    }
    rec.update(fields)
    return rec


AFE1_V2_PAYLOAD = dict(
    AFE_NUMBER="AFE-001",
    WELL_UWI="100/04-11-082-05W6/0",
    EXT_GUID="9f0e8a3c-1111-2222-3333-444455556666",
    LINE_COUNT=3,
    ESTIMATE=125000.5,
    IS_CAPITAL=True,
    SPUD_DATE="2026-04-01T00:00:00",
    APPROVED_AT="2026-03-04T18:30:00Z",
    OPERATOR={"DOCUMENT_ID": "vnd-01"},
    DETAILS={"COST_CENTER": "CC-9", "DEPTH_M": 2150.0, "AUDIT": {"REVIEWED": True}},
    PARTNERS=[
        {"LISTITEM_ID": "li-1", "PARTNER": {"DOCUMENT_ID": "vnd-01"}, "SHARE": 0.6,
         "NOTE": {"KIND": "lead"}},
        {"LISTITEM_ID": "li-2", "PARTNER": {"DOCUMENT_ID": "vnd-02"}, "SHARE": 0.4},
    ],
)


def _vendor(doc_id, version, date, name, rating):
    return {
        "$TYPE": "VENDOR", "DOCUMENT_ID": doc_id, "$VERSION": version,
        "$AUTHOR_ID": "u-1", "$DATE": date, "$DELETED": False,
        "VENDOR_NAME": name, "RATING": rating,
    }


def batch_records() -> list[list[dict | str]]:
    """Three batches; strings are raw lines (malformed-JSON cases)."""
    b1: list[dict | str] = [
        _afe("afe-0001", 1, "2026-02-20T10:00:00Z", ESTIMATE=100000.0, AFE_NUMBER="AFE-001",
             IS_CAPITAL=False, LINE_COUNT=1),
        _afe("afe-0002", 1, "2026-02-21T09:00:00Z", AFE_NUMBER="AFE-002", IS_CAPITAL=True,
             ESTIMATE=5000.0),
        _vendor("vnd-01", 1, "2026-02-01T00:00:00Z", "Acme Drilling", 5),
        _vendor("vnd-02", 1, "2026-02-02T00:00:00Z", "Borealis Ltd", 3),
        '{"this is not valid json',  # parse-skip path (cmd_sync.go:154-157)
    ]
    b2: list[dict | str] = [
        _afe("afe-0001", 2, "2026-03-01T10:00:00Z", **AFE1_V2_PAYLOAD),
        _afe("afe-0002", 2, "2026-03-01T11:00:00Z", AFE_NUMBER="AFE-002", IS_CAPITAL=True,
             ESTIMATE=5500.0),
        _afe("afe-0003", 1, "2026-03-01T12:00:00Z", AFE_NUMBER="AFE-003", IS_CAPITAL=False,
             PARTNERS=[]),
        {"$TYPE": "WIDGET", "DOCUMENT_ID": "wid-01", "$VERSION": 1, "$AUTHOR_ID": "u-9",
         "$DATE": "2026-03-01T13:00:00Z", "$DELETED": False, "COLOR": "red"},  # unknown type
        {
            "$TYPE": "TICKET", "DOCUMENT_ID": "tkt-0001", "$VERSION": 1, "$AUTHOR_ID": "u-2",
            "$DATE": "2026-03-01T14:00:00Z", "$DELETED": False, "SUBJECT": "large ticket",
            "LINES": [
                {"LISTITEM_ID": f"tl-{i:02d}", "QTY": i, "COST": round(i * 1.5, 2)}
                for i in range(25)
            ],
        },
    ]
    b3: list[dict | str] = [
        # same (TYPE,ID,VERSION) as batch 2 → D1 must keep only this copy
        _afe("afe-0001", 2, "2026-03-01T10:00:00Z", **AFE1_V2_PAYLOAD),
        _afe("afe-0002", 3, "2026-03-02T08:00:00Z", deleted=True, AFE_NUMBER="AFE-002",
             IS_CAPITAL=True, ESTIMATE=5500.0),
    ]
    return [b1, b2, b3]


def batch_lines() -> list[list[str]]:
    return [
        [rec if isinstance(rec, str) else json.dumps(rec, separators=(",", ":")) for rec in batch]
        for batch in batch_records()
    ]


def write_batches(dirpath) -> list[str]:
    import os

    paths = []
    for i, lines in enumerate(batch_lines(), start=1):
        p = os.path.join(str(dirpath), f"batch_{i}.ndjson")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        paths.append(p)
    return paths
