"""The dynamic document-schema tree.

Mirrors the semantics of the reference's schema system
(/root/reference/src/internal/execute/schema.go:16-32): the schema is *not*
fixed in code — it is fetched (or loaded from a fixture file) as JSON of shape

    RootSchema      = {docType: DocumentSchema}
    DocumentSchema  = {fieldName: FieldMetadata}
    FieldMetadata   = {NAME, ACTIVE, TYPE, NULLABLE, SIZE?, RECORD_TYPE?,
                       FORMULA?, DOCUMENT_TYPE?, DATE_UNZONED?}

and compiled at runtime. ``RECORD_TYPE`` recurses (RECORD / RECORD LIST).

``filter_inactive`` mirrors the recursive inactive-field pruning applied when
HIDE_INACTIVE_FIELDS is set (schema.go:96-119).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

# Field type constants — the complete set the reference's view generators
# switch on (/root/reference/src/internal/warehouses/snowflake/snowflake.go:336-359).
SCALAR_TYPES = frozenset({"TEXT", "GUID", "UWI", "INTEGER", "DECIMAL", "BOOLEAN", "DATETIME"})
T_DOCUMENT = "DOCUMENT"
T_RECORD = "RECORD"
T_RECORD_LIST = "RECORD LIST"


@dataclass
class FieldMetadata:
    name: str
    active: bool = True
    type: str = "TEXT"
    nullable: bool = True
    size: Optional[int] = None
    record_type: Optional[dict[str, "FieldMetadata"]] = None
    formula: Optional[str] = None
    document_type: Optional[str] = None
    date_unzoned: bool = False

    @property
    def is_calc(self) -> bool:
        return self.formula is not None and self.formula != ""


# DocumentSchema / RootSchema are plain dicts to keep recursion simple.
DocumentSchema = dict[str, FieldMetadata]
RootSchema = dict[str, DocumentSchema]


def _parse_field(name: str, raw: dict) -> FieldMetadata:
    record_type = None
    if raw.get("RECORD_TYPE"):
        record_type = {k: _parse_field(k, v) for k, v in raw["RECORD_TYPE"].items()}
    return FieldMetadata(
        name=raw.get("NAME", name),
        active=bool(raw.get("ACTIVE", True)),
        type=str(raw.get("TYPE", "TEXT")).upper(),
        nullable=bool(raw.get("NULLABLE", True)),
        size=raw.get("SIZE"),
        record_type=record_type,
        formula=raw.get("FORMULA"),
        document_type=raw.get("DOCUMENT_TYPE"),
        date_unzoned=bool(raw.get("DATE_UNZONED", False)),
    )


def parse_root_schema(raw: dict) -> RootSchema:
    """JSON dict (as returned by GET /fetch/document/schema) -> RootSchema."""
    return {
        doc_type: {fname: _parse_field(fname, fmeta) for fname, fmeta in doc_schema.items()}
        for doc_type, doc_schema in raw.items()
    }


def load_root_schema(path: str) -> RootSchema:
    with open(path) as f:
        return parse_root_schema(json.load(f))


def filter_inactive(root: RootSchema) -> RootSchema:
    """Recursively drop fields with ACTIVE == false (schema.go:96-119).

    Returns a new tree; the input is not mutated.
    """

    def _filter_doc(doc: DocumentSchema) -> DocumentSchema:
        out: DocumentSchema = {}
        for fname, fmeta in doc.items():
            if not fmeta.active:
                continue
            if fmeta.record_type is not None:
                fmeta = FieldMetadata(
                    name=fmeta.name,
                    active=fmeta.active,
                    type=fmeta.type,
                    nullable=fmeta.nullable,
                    size=fmeta.size,
                    record_type=_filter_doc(fmeta.record_type),
                    formula=fmeta.formula,
                    document_type=fmeta.document_type,
                    date_unzoned=fmeta.date_unzoned,
                )
            out[fname] = fmeta
        return out

    return {doc_type: _filter_doc(doc) for doc_type, doc in root.items()}


def filter_calcs(root: RootSchema) -> RootSchema:
    """Drop FORMULA (calculated) fields — the state when the feed is fetched
    without calc=true (schema.go:51-53, config INCLUDE_CALCS)."""

    def _filter_doc(doc: DocumentSchema) -> DocumentSchema:
        out: DocumentSchema = {}
        for fname, fmeta in doc.items():
            if fmeta.is_calc:
                continue
            if fmeta.record_type is not None:
                fmeta = FieldMetadata(
                    name=fmeta.name,
                    active=fmeta.active,
                    type=fmeta.type,
                    nullable=fmeta.nullable,
                    size=fmeta.size,
                    record_type=_filter_doc(fmeta.record_type),
                    formula=fmeta.formula,
                    document_type=fmeta.document_type,
                    date_unzoned=fmeta.date_unzoned,
                )
            out[fname] = fmeta
        return out

    return {doc_type: _filter_doc(doc) for doc_type, doc in root.items()}
