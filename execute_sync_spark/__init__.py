"""execute_sync_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``afenav/execute-sync``.

The reference (see /root/reference) is an incremental ELT tool: it pulls
versioned JSON documents from a REST API, lands them append-only into a
warehouse, and compiles a schema-metadata tree into a forest of SQL views
(dedup to latest version + JSON shredding). This package re-expresses those
semantics Spark-first:

- ``schema``     — dynamic schema tree (RootSchema) -> Spark StructType compiler
- ``landing``    — NDJSON batches -> 9-column landing DataFrame (append-only log)
- ``operators``  — dedup (latest-batch / latest-version / prune) and the
                   recursive view-forest compiler (JSON shredding)
- ``sources``    — Execute-API style incremental source with watermark state
- ``sinks``      — warehouse abstraction (parquet/delta-dir, JDBC)
- ``functions``  — large-scale pipeline operators: dedup (exact, MinHash-LSH,
                   SimHash, n-gram Jaccard), similarity search, text analysis,
                   multimodal column plumbing
- ``streaming``  — Structured Streaming ingest & windowed aggregation
"""

__version__ = "0.1.0"

from execute_sync_spark.session import get_spark  # noqa: F401
