"""Bad-payload robustness: documents whose field values disagree with the
schema must degrade to nulls (PERMISSIVE from_json), never fail the view."""

import json

from pyspark.sql import functions as F

from execute_sync_spark.landing import land_ndjson_lines
from execute_sync_spark.operators import create_views, latest
from execute_sync_spark.schema import parse_root_schema
from tests.fixtures.feed import BATCH_DATES

SCHEMA = {
    "T": {
        "N": {"NAME": "N", "ACTIVE": True, "TYPE": "INTEGER", "NULLABLE": True},
        "B": {"NAME": "B", "ACTIVE": True, "TYPE": "BOOLEAN", "NULLABLE": True},
        "L": {"NAME": "L", "ACTIVE": True, "TYPE": "RECORD LIST", "NULLABLE": True,
              "RECORD_TYPE": {"Q": {"NAME": "Q", "ACTIVE": True, "TYPE": "INTEGER", "NULLABLE": True}}},
    }
}


def _doc(doc_id, **fields):
    rec = {"$TYPE": "T", "DOCUMENT_ID": doc_id, "$VERSION": 1, "$AUTHOR_ID": "u",
           "$DATE": "2026-01-01T00:00:00Z", "$DELETED": False}
    rec.update(fields)
    return json.dumps(rec)


def test_type_mismatches_degrade_to_null(spark):
    root = parse_root_schema(SCHEMA)
    lines = [
        _doc("ok", N=5, B=True, L=[{"LISTITEM_ID": "a", "Q": 1}]),
        _doc("bad-scalar", N="not-a-number", B="maybe"),
        _doc("bad-list", L="not-an-array"),
        _doc("list-of-scalars", L=[1, 2, 3]),
    ]
    landing = land_ndjson_lines(spark, lines, BATCH_DATES[0])
    views = create_views(latest(landing), root, register=False)

    rows = {r.DOCUMENT_ID: r for r in views["T"].collect()}
    assert len(rows) == 4  # every document lands; no view failure
    assert rows["ok"].N == 5 and rows["ok"].B is True
    assert rows["bad-scalar"].N is None and rows["bad-scalar"].B is None

    items = views["T_L"].collect()
    # only the well-formed list yields items; malformed lists explode to nothing
    assert [(r.DOCUMENT_ID, r.Q) for r in items] == [("ok", 1)]
