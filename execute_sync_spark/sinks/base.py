"""Warehouse abstraction mirroring the reference's ``Database`` interface
(/root/reference/src/internal/warehouses/warehouse.go:29-33):
{Prune, Upload, CreateViews} -> {prune, append, create_views}."""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame

from execute_sync_spark.schema.model import RootSchema


class Sink(Protocol):
    def append(self, landed: DataFrame) -> int:
        """Append one landed batch; returns rows written."""
        ...

    def create_views(self, root: RootSchema) -> dict[str, DataFrame]:
        """Register the dedup views + view forest over the landing table."""
        ...

    def prune(self) -> int:
        """D3 compaction; returns rows removed."""
        ...
