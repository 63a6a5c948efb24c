from execute_sync_spark.streaming.windowed import stream_window_counts  # noqa: F401
from execute_sync_spark.streaming.windowed import stream_dedup_events  # noqa: F401
from execute_sync_spark.streaming.windowed import stream_sliding_counts  # noqa: F401
from execute_sync_spark.streaming.ingest import stream_sync  # noqa: F401
from execute_sync_spark.streaming.stateful import streaming_sessionize  # noqa: F401
from execute_sync_spark.streaming.stateful import streaming_sessionize_flushed  # noqa: F401
from execute_sync_spark.streaming.joins import stream_purchase_attribution  # noqa: F401
from execute_sync_spark.streaming.clusters import stream_cluster_maintenance  # noqa: F401
