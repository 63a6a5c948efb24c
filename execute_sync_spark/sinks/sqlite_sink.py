"""SQLite row sink — true end-to-end parity with the reference's SQLite
warehouse (/root/reference/src/internal/warehouses/sqlite/sqlite.go) on the
Python stdlib ``sqlite3`` module, so unlike the JDBC wrapper it is fully
testable in this environment.

Semantics mirrored (all verified by tests/test_sinks_alt.py):

- bootstrap DDL: 9-column EXECUTE_DOCUMENTS with the composite PRIMARY KEY
  (BATCH_DATE, TYPE, ID, VERSION, CHUNK) — sqlite.go:31-50;
- ``append``: one transaction of ``INSERT OR REPLACE`` on that PK
  (sqlite.go:87-150) — re-landing the same batch is idempotent;
- ``prune``: the targeted anti-join ``DELETE ... NOT IN (GROUP BY max)``
  executed in-warehouse (sqlite.go:62-69) — no table rewrite;
- ``create_views``: SQLite-NATIVE view DDL — ``_LATEST_ALL_VERSIONS`` (D1)
  and ``_LATEST`` (D2) tuple-IN views (sqlite.go:167-191) plus the recursive
  per-type json_extract view forest (sqlite.go:200-270): scalar fields via
  ``json_extract(DATA, '$.F')``, DOCUMENT fields via ``'$.F.DOCUMENT_ID'``,
  RECORD recursion into ``PARENT_FIELD`` views, RECORD LIST flatten via
  ``json_each`` across ALL chunk rows (chunk slices re-union), the
  LISTITEM_ID projection for records-in-lists, list-in-list skipped, and
  ``chunk = 0`` on every non-flattened view.

Timestamps are stored as ISO-8601 TEXT exactly like the reference (SQLite has
no timestamp type); ``read`` parses them back for Spark.

This is a driver-side embedded store — the same deployment shape as the
reference's SQLite target (a local single-file warehouse). The distributed
path at scale is ParquetSink; this sink exists for small-warehouse parity and
for exercising the generated-DDL dialect against a real SQL engine.
"""

from __future__ import annotations

import sqlite3
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from execute_sync_spark.landing.schema import LANDING_COLUMNS, LANDING_SCHEMA
from execute_sync_spark.sinks.ddl import _check_ident
from execute_sync_spark.schema.model import (
    SCALAR_TYPES,
    T_DOCUMENT,
    T_RECORD,
    T_RECORD_LIST,
    DocumentSchema,
    RootSchema,
)

TABLE = "EXECUTE_DOCUMENTS"

_DDL = f"""
CREATE TABLE IF NOT EXISTS {TABLE} (
    BATCH_DATE TEXT NOT NULL,
    TYPE TEXT NOT NULL,
    ID TEXT NOT NULL,
    VERSION INTEGER NOT NULL,
    CHUNK INTEGER NOT NULL,
    AUTHOR TEXT,
    DATE TEXT NOT NULL,
    DELETED BOOLEAN NOT NULL,
    DATA TEXT NOT NULL,
    PRIMARY KEY (BATCH_DATE, TYPE, ID, VERSION, CHUNK)
)
"""

# Fixed-width ISO text with microseconds: two sync pages landed within the
# same second keep distinct BATCH_DATE PKs, and lexicographic MAX()/ordering
# on the TEXT column equals timestamp ordering (sqlite.go stores TEXT too).
_ISO = "%Y-%m-%d %H:%M:%S.%f"


def _iso(ts: datetime | None) -> str | None:
    return ts.strftime(_ISO) if ts is not None else None


def _from_iso(s: str | None) -> datetime | None:
    return datetime.strptime(s, _ISO) if s else None


class SqliteSink:
    def __init__(self, spark: SparkSession, db_path: str):
        self.spark = spark
        self.db_path = db_path
        with self._connect() as con:
            con.execute(_DDL)

    def _connect(self) -> sqlite3.Connection:
        return sqlite3.connect(self.db_path)

    # -- Database interface (warehouse.go:29-33) ---------------------------

    def append(self, landed: DataFrame, txn_id: str | None = None,
               batch_rows: int = 10_000) -> int:
        """One transaction of INSERT OR REPLACE on the composite PK.

        The embedded single-file DB forces rows through the driver, but via
        ``toLocalIterator`` + chunked ``executemany`` so driver memory is
        bounded by ``batch_rows``, not the sync size — one Spark partition at
        a time is materialized, never the whole batch."""
        sql = (
            f"INSERT OR REPLACE INTO {TABLE}"
            " (BATCH_DATE, TYPE, ID, VERSION, CHUNK, AUTHOR, DATE, DELETED, DATA)"
            " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)"
        )
        n = 0
        with self._connect() as con:
            buf: list[tuple] = []
            for r in landed.select(*LANDING_COLUMNS).toLocalIterator():
                buf.append((
                    _iso(r.batch_date), r.type, r.id, r.version, r.chunk,
                    r.author, _iso(r.date), bool(r.deleted), r.data,
                ))
                if len(buf) >= batch_rows:
                    con.executemany(sql, buf)
                    n += len(buf)
                    buf.clear()
            if buf:
                con.executemany(sql, buf)
                n += len(buf)
        return n

    def prune(self) -> int:
        """D3 as in-warehouse DML — the reference's targeted anti-join DELETE
        (sqlite.go:62-69); only superseded rows are touched."""
        with self._connect() as con:
            (before,) = con.execute(f"SELECT COUNT(*) FROM {TABLE}").fetchone()
            con.execute(
                f"""DELETE FROM {TABLE}
                    WHERE (TYPE, ID, VERSION, BATCH_DATE) NOT IN (
                        SELECT TYPE, ID, VERSION, MAX(BATCH_DATE)
                        FROM {TABLE} GROUP BY TYPE, ID, VERSION)"""
            )
            (after,) = con.execute(f"SELECT COUNT(*) FROM {TABLE}").fetchone()
        return before - after

    def read(self) -> DataFrame:
        """Landing table back into Spark (ISO text -> timestamps)."""
        with self._connect() as con:
            raw = con.execute(
                f"SELECT BATCH_DATE, TYPE, ID, VERSION, CHUNK, AUTHOR, DATE,"
                f" DELETED, DATA FROM {TABLE}"
            ).fetchall()
        data = [
            (_from_iso(b), t, i, v, c, a, _from_iso(d), bool(dl), dt)
            for (b, t, i, v, c, a, d, dl, dt) in raw
        ]
        return self.spark.createDataFrame(data, schema=LANDING_SCHEMA)

    def create_views(self, root: RootSchema) -> dict[str, str]:
        """Generate and install the SQLite-native view forest; returns
        {view_name: CREATE VIEW sql} for inspection."""
        created: dict[str, str] = {}
        with self._connect() as con:
            con.execute(
                f"""CREATE VIEW IF NOT EXISTS {TABLE}_LATEST_ALL_VERSIONS AS
                    SELECT * FROM {TABLE} ed
                    WHERE (ed.TYPE, ed.ID, ed.VERSION, ed.BATCH_DATE) IN (
                        SELECT TYPE, ID, VERSION, MAX(BATCH_DATE)
                        FROM {TABLE} GROUP BY TYPE, ID, VERSION)"""
            )
            con.execute(
                f"""CREATE VIEW IF NOT EXISTS {TABLE}_LATEST AS
                    SELECT * FROM {TABLE}_LATEST_ALL_VERSIONS ed
                    WHERE (ed.TYPE, ed.ID, ed.VERSION) IN (
                        SELECT TYPE, ID, MAX(VERSION)
                        FROM {TABLE} GROUP BY TYPE, ID)"""
            )
            for doc_type, doc_schema in root.items():
                # doc types / field names come from the externally-fetched
                # schema and are interpolated into DDL — validate them first
                # (the reference interpolates raw; a quoted or spaced name
                # would break or inject SQL in the warehouse)
                self._create_view(con, created, _check_ident(doc_type), doc_type,
                                  doc_schema, parent=None, json_field="DATA",
                                  json_root="$", flatten="")
        return created

    # -- recursive per-type view generator (sqlite.go:200-270) -------------

    def _create_view(
        self,
        con: sqlite3.Connection,
        created: dict[str, str],
        doc_type: str,
        view_name: str,
        schema: DocumentSchema,
        parent: str | None,
        json_field: str,
        json_root: str,
        flatten: str,
    ) -> None:
        cols = [f"{TABLE}_LATEST.ID AS DOCUMENT_ID"]
        if flatten and json_root != "$":
            # record-in-list rows carry their list identity
            cols.append(f"json_extract({json_field}, '$.LISTITEM_ID') AS LISTITEM_ID")
        if parent is None:
            cols += [
                'DELETED AS "_DELETED"',
                'AUTHOR AS "_AUTHOR"',
                'VERSION AS "_VERSION"',
                'DATE AS "_DATE"',
            ]
        for fname, fmeta in schema.items():
            if fname == "DOCUMENT_ID":
                continue
            _check_ident(fname)
            if fmeta.type in SCALAR_TYPES:
                cols.append(f"json_extract({json_field}, '{json_root}.{fname}') AS {fname}")
            elif fmeta.type == T_DOCUMENT:
                cols.append(
                    f"json_extract({json_field}, '{json_root}.{fname}.DOCUMENT_ID') AS {fname}"
                )
            elif fmeta.type == T_RECORD:
                self._create_view(
                    con, created, doc_type, f"{view_name}_{fname}",
                    fmeta.record_type or {}, parent=view_name,
                    json_field=json_field, json_root=f"{json_root}.{fname}",
                    flatten=flatten,
                )
            elif fmeta.type == T_RECORD_LIST:
                if json_field != "DATA":
                    continue  # list-in-list unsupported (sqlite.go:236-240)
                self._create_view(
                    con, created, doc_type, f"{view_name}_{fname}",
                    fmeta.record_type or {}, parent=view_name,
                    json_field="value", json_root="$",
                    flatten=f", json_each(DATA, '{json_root}.{fname}')",
                )
            # unknown types skipped (sqlite.go:242-243)

        sql = (
            f"CREATE VIEW {view_name} AS SELECT {', '.join(cols)}"
            f" FROM {TABLE}_LATEST{flatten}"
            f" WHERE {TABLE}_LATEST.TYPE = '{doc_type}'"
        )
        if not flatten:
            sql += " AND CHUNK = 0"
        con.execute(f"DROP VIEW IF EXISTS {view_name}")
        con.execute(sql)
        created[view_name] = sql

    # -- convenience for tests / CLI ---------------------------------------

    def query(self, sql: str) -> list[tuple]:
        with self._connect() as con:
            return con.execute(sql).fetchall()
