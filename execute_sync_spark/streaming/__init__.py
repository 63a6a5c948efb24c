from execute_sync_spark.streaming.windowed import stream_window_counts  # noqa: F401
