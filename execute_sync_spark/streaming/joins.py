"""Stream-stream join: attribute each purchase to the page views by the same
user in the preceding hour (two live streams, not stream-static).

Spark buffers both sides in state; the watermark plus the time-range join
condition bound how much state each side keeps (purchases wait at most 1 h of
view history, views are dropped once no future purchase can reach back to
them). Inner joins emit matches as soon as both sides arrive — over a finite
backlog the result equals the batch self-join, which is what makes this
oracle-checkable.

At scale both sides shuffle on user_id once; state per key is the events
inside the watermark horizon only.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from execute_sync_spark.streaming.stateful import _events_stream


def stream_purchase_attribution(
    spark: SparkSession,
    sf_dir: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Purchases joined to same-user views within ``lookback`` before the
    purchase, as a real two-stream join (memory sink, availableNow)."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_event_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    joined = purchases.join(
        views,
        (F.col("p_user_id") == F.col("v_user_id"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")),
        "inner",
    ).select("p_event_id", "p_user_id", "p_ts", "p_value", "v_event_id", "v_ts")

    # a stream-stream join keeps FOUR state stores per shuffle partition
    # (keyToNumValues + keyWithIndexToValue per side); run_to_memory sizes
    # the shuffle to the key cardinality and is safe under concurrent starts
    from execute_sync_spark.streaming.util import run_to_memory

    return run_to_memory(spark, joined, "append", "attribution")
