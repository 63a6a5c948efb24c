"""The 9-column append-only landing table (``EXECUTE_DOCUMENTS``).

Mirror of the raw table every reference warehouse creates
(snowflake.go:47-60, databricks.go:116-126, sqlserver.go:37-50, sqlite.go:36-48):

    BATCH_DATE  timestamp  -- sync-run timestamp (one per batch)
    TYPE        string     -- document type ($TYPE)
    ID          string     -- document identity (DOCUMENT_ID)
    VERSION     long       -- document version ($VERSION)
    CHUNK       int        -- 0 = document row; 1..n = split-list slices
    AUTHOR      string     -- $AUTHOR_ID (nullable)
    DATE        timestamp  -- version timestamp ($DATE)
    DELETED     boolean    -- soft-delete flag ($DELETED)
    DATA        string     -- the (possibly chunk-modified) JSON object

Logical primary key: (BATCH_DATE, TYPE, ID, VERSION, CHUNK). Spark/Delta does
not enforce PKs; idempotency comes from in-batch dropDuplicates on the PK plus
query-time dedup (operators.dedup) across batches — SURVEY §4 P10.

At 100 TB the physical layout matters more than the schema: partition the
landing table by ``type`` (and optionally date(batch_date)) so per-doc-type
views prune partitions, and sort/Z-order within files by (id, version) so
dedup shuffles read clustered input.
"""

from pyspark.sql import types as T

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("batch_date", T.TimestampType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("version", T.LongType(), False),
        T.StructField("chunk", T.IntegerType(), False),
        T.StructField("author", T.StringType(), True),
        T.StructField("date", T.TimestampType(), True),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("data", T.StringType(), True),
    ]
)

LANDING_COLUMNS = [f.name for f in LANDING_SCHEMA.fields]

# JSON metadata fields extracted from each document on landing
# (snowflake.go:199-209).
META_FIELDS = ["$TYPE", "DOCUMENT_ID", "$VERSION", "$AUTHOR_ID", "$DATE", "$DELETED"]
