from streamkit_spark.operators.consume import (
    ConsumeBounds,
    consume,
    consume_segment,
    consume_space,
    peek,
    peek_all,
)
from streamkit_spark.operators.status import (
    get_segments,
    get_spaces,
    segment_status,
)

__all__ = [
    "ConsumeBounds",
    "consume",
    "consume_segment",
    "consume_space",
    "peek",
    "peek_all",
    "segment_status",
    "get_spaces",
    "get_segments",
]
