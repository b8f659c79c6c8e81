from streamkit_spark.functions import (
    analytics,
    curation,
    dedup,
    layout,
    multimodal,
    similarity,
    sketch,
    text,
)

__all__ = [
    "text",
    "dedup",
    "similarity",
    "curation",
    "multimodal",
    "analytics",
    "sketch",
    "layout",
]
