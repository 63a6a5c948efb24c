"""Schema-system edge cases (SURVEY §7.3 risk a): deep recursion, view-name
collisions, and empty/degenerate schemas."""

import json
import logging

from pyspark.sql import types as T

from execute_sync_spark.landing import land_ndjson_lines
from execute_sync_spark.operators import create_views, latest
from execute_sync_spark.schema import doc_type_struct, parse_root_schema
from tests.fixtures.feed import BATCH_DATES


def _field(type_, **kw):
    out = {"NAME": "X", "ACTIVE": True, "TYPE": type_, "NULLABLE": True}
    out.update(kw)
    return out


def test_deep_record_recursion():
    """50-level nested RECORD compiles without blowing the stack."""
    depth = 50
    inner: dict = {"LEAF": _field("TEXT")}
    for i in range(depth):
        inner = {f"L{i}": _field("RECORD", RECORD_TYPE=inner)}
    root = parse_root_schema({"DEEP": inner})
    struct = doc_type_struct(root["DEEP"])
    # walk to the bottom
    t = struct
    levels = 0
    while isinstance(t, T.StructType) and len(t.fields) == 1 and isinstance(t.fields[0].dataType, T.StructType):
        t = t.fields[0].dataType
        levels += 1
    assert levels == depth


def test_view_name_collision_warns_and_last_wins(spark, caplog):
    """A + B_C vs A_B + C produce the same underscore-joined view name; we
    keep the later definition (schema order) and warn, instead of the
    reference's random-map-order silent replace."""
    raw = {
        "A": {
            "B_C": _field("RECORD", RECORD_TYPE={"P": _field("TEXT")}),
            "B": _field("RECORD", RECORD_TYPE={"C": _field("RECORD", RECORD_TYPE={"Q": _field("TEXT")})}),
        }
    }
    root = parse_root_schema(raw)
    doc = {
        "$TYPE": "A", "DOCUMENT_ID": "a-1", "$VERSION": 1, "$AUTHOR_ID": "u",
        "$DATE": "2026-01-01T00:00:00Z", "$DELETED": False,
        "B_C": {"P": "p-val"}, "B": {"C": {"Q": "q-val"}},
    }
    landing = land_ndjson_lines(spark, [json.dumps(doc)], BATCH_DATES[0])
    with caplog.at_level(logging.WARNING):
        views = create_views(latest(landing), root, register=False)
    assert any("collision" in r.message for r in caplog.records)
    # last definition (A -> B -> C) wins deterministically
    row = views["A_B_C"].first()
    assert row.Q == "q-val"


def test_empty_doc_schema(spark):
    """A doc type with no fields still yields a root view with metadata."""
    root = parse_root_schema({"BARE": {}})
    doc = {"$TYPE": "BARE", "DOCUMENT_ID": "b-1", "$VERSION": 1,
           "$AUTHOR_ID": "u", "$DATE": "2026-01-01T00:00:00Z", "$DELETED": False}
    landing = land_ndjson_lines(spark, [json.dumps(doc)], BATCH_DATES[0])
    views = create_views(latest(landing), root, register=False)
    row = views["BARE"].first()
    assert row.DOCUMENT_ID == "b-1" and row._VERSION == 1


def test_all_unknown_types_yield_metadata_only_view(spark):
    root = parse_root_schema({"W": {"GEO": _field("GEOMETRY"), "BLOB": _field("RASTER")}})
    doc = {"$TYPE": "W", "DOCUMENT_ID": "w-1", "$VERSION": 1,
           "$AUTHOR_ID": "u", "$DATE": "2026-01-01T00:00:00Z", "$DELETED": False,
           "GEO": "POINT(1 2)"}
    landing = land_ndjson_lines(spark, [json.dumps(doc)], BATCH_DATES[0])
    views = create_views(latest(landing), root, register=False)
    assert set(views["W"].columns) == {"DOCUMENT_ID", "_DELETED", "_AUTHOR", "_VERSION", "_DATE"}


def test_schema_evolution_added_and_dropped_fields(spark):
    """Schema drift across syncs (the reference re-creates views from the
    latest schema every sync): a field added to the schema AFTER old docs
    landed reads as NULL for them; a field present in landed JSON but no
    longer in the schema is simply not projected. The landing log itself
    never rewrites — evolution is entirely at view-compile time."""
    root_v2 = parse_root_schema({
        "EV": {"OLD_F": _field("TEXT"), "NEW_F": _field("DECIMAL")}
    })
    old_doc = {"$TYPE": "EV", "DOCUMENT_ID": "e-1", "$VERSION": 1,
               "$AUTHOR_ID": "u", "$DATE": "2026-01-01T00:00:00Z",
               "$DELETED": False, "OLD_F": "v1", "GONE_F": "dropped"}
    new_doc = {"$TYPE": "EV", "DOCUMENT_ID": "e-2", "$VERSION": 1,
               "$AUTHOR_ID": "u", "$DATE": "2026-01-02T00:00:00Z",
               "$DELETED": False, "OLD_F": "v2", "NEW_F": 7.5}
    landing = land_ndjson_lines(
        spark, [json.dumps(old_doc)], BATCH_DATES[0]
    ).unionByName(land_ndjson_lines(spark, [json.dumps(new_doc)], BATCH_DATES[1]))
    views = create_views(latest(landing), root_v2, register=False)
    rows = {r.DOCUMENT_ID: r for r in views["EV"].collect()}
    assert rows["e-1"].OLD_F == "v1" and rows["e-1"].NEW_F is None
    assert rows["e-2"].NEW_F == 7.5
    assert "GONE_F" not in views["EV"].columns
