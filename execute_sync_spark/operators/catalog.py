"""Metastore registration: make the landing table and the compiled view
forest visible to every Spark session through the catalog, instead of
session-scoped temp views.

Two persistence levels (ref: the reference engine registers its warehouse
tables/views once at sink setup, src/internal/warehouses/*/sql.go):

- ``register_landing_table`` — an EXTERNAL ``CREATE TABLE ... USING parquet``
  over the sink's partitioned directory plus partition recovery, so the
  catalog entry is metadata-only (no copy) and partition pruning still
  reaches the scan via the catalog's partition index.
- ``materialize_views`` — ``saveAsTable`` snapshots of compiled views into a
  database; readers that can't run the view-compiler (BI tools, plain SQL
  clients) query these.

With the default in-memory catalog these entries live for the session; on a
cluster with a persistent metastore (Hive/Glue/Unity) the same calls make
them durable — the code path is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["register_landing_table", "materialize_views", "drop_database"]


def _q(name: str) -> str:
    """Quote an identifier (document-type names may collide with keywords)."""
    return "`" + name.replace("`", "``") + "`"


def register_landing_table(
    spark: SparkSession,
    path: str,
    name: str = "EXECUTE_DOCUMENTS_CAT",
    file_format: str = "parquet",
) -> None:
    """Register the landing directory as an external catalog table.

    Metadata-only: the files stay where the sink wrote them. Partition
    columns (the ``type=.../`` layout) are discovered by
    ``recoverPartitions``, which populates the catalog's partition index —
    the thing that lets a catalog-routed query prune partitions without
    listing the whole table directory (the listing itself is the bottleneck
    at 100 TB).
    """
    spark.sql(f"DROP TABLE IF EXISTS {_q(name)}")
    spark.sql(
        f"CREATE TABLE {_q(name)} USING {file_format} LOCATION '{path}'"
    )
    try:
        spark.catalog.recoverPartitions(name)
    except Exception:
        # unpartitioned layout: nothing to recover
        pass


def materialize_views(
    spark: SparkSession,
    views: dict[str, DataFrame],
    database: str = "execute_views",
    mode: str = "overwrite",
) -> list[str]:
    """Persist compiled views as managed tables in ``database``.

    ``saveAsTable`` writes parquet into the warehouse dir and registers the
    table; ``overwrite`` replaces atomically per table. Returns the
    fully-qualified names written.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_q(database)}")
    written: list[str] = []
    for view_name, df in views.items():
        fq = f"{database}.{view_name}"
        df.write.mode(mode).format("parquet").saveAsTable(f"{_q(database)}.{_q(view_name)}")
        written.append(fq)
    return written


def drop_database(spark: SparkSession, database: str = "execute_views") -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {_q(database)} CASCADE")
