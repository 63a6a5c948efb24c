from execute_sync_spark.sources.execute_api import (  # noqa: F401
    ExecuteClient,
    FetchPage,
    FileFeedSource,
    WatermarkStore,
)
from execute_sync_spark.sources.sync import sync_once, sync_loop  # noqa: F401
