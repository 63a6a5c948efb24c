"""CSV staging round-trip — the reference's bulk-load wire format.

The Snowflake path stages each batch as a quoted CSV then bulk-copies it
(temp CSV -> PUT @stage -> Snowpipe REFRESH, snowflake.go:235-248); the
Databricks path stages TSV to DBFS then COPY INTO (databricks.go:237-253).
Spark's native columnar write makes staging unnecessary for our own sink,
but the FORMAT still matters for interop: an external warehouse fed by this
engine receives exactly this CSV. RFC-4180 double-quote escaping (quote and
escape both '"') matches what COPY INTO / Snowpipe parse, and survives JSON
payloads full of quotes and commas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from execute_sync_spark.landing.schema import LANDING_COLUMNS, LANDING_SCHEMA

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',  # RFC 4180 doubled quotes, as COPY INTO expects
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def write_csv_stage(landing: DataFrame, path: str) -> None:
    """Stage a landing batch as quoted CSV (one directory of part files —
    the distributed analog of the reference's single temp file)."""
    w = landing.select(*LANDING_COLUMNS).write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv_stage(spark: SparkSession, path: str) -> DataFrame:
    """Read a staged batch back with the landing schema (what the warehouse's
    COPY INTO does). Round-trips bit-exactly with write_csv_stage."""
    r = spark.read.schema(LANDING_SCHEMA)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return r.csv(path).select(*LANDING_COLUMNS)
