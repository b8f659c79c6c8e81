from streamkit_spark.streaming.subscribe import (
    at_least_once_dedup,
    status_stream,
    subscribe_segment_status,
)
from streamkit_spark.streaming.watermark import SpaceWatermarks

__all__ = [
    "SpaceWatermarks",
    "status_stream",
    "subscribe_segment_status",
    "at_least_once_dedup",
]
