from execute_sync_spark.sinks.base import Sink  # noqa: F401
from execute_sync_spark.sinks.parquet_sink import ParquetSink  # noqa: F401
from execute_sync_spark.sinks.jdbc_sink import JdbcSink  # noqa: F401
from execute_sync_spark.sinks.duckdb_sink import DuckDBSink  # noqa: F401
from execute_sync_spark.sinks.sqlite_sink import SqliteSink  # noqa: F401
