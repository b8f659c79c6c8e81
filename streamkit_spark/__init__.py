"""streamkit_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fgrzl/streamkit, re-expressed Spark-first.

The reference (read-only at /root/reference) is a Go hierarchical
event-streaming platform: stores → spaces → segments → ordered entries,
with a fixed catalog of range-scan / merge / point-lookup / status-stream
operations (see SURVEY.md §2).  This package reproduces those semantics on
DataFrames + Structured Streaming and extends them with the relational and
LLM-data-pipeline operators a 100 TB training-data pipeline needs.

Layout:
    session       SparkSession factory tuned for the engine
    schema        canonical StructTypes + column bindings
    errors        typed error taxonomy (transient/permanent)
    operators/    consume (S1-S4), status (A1-A2), produce (S5-S6), invariants
    functions/    json/text/dedup/similarity/multimodal column functions
    plans/        plan inspection helpers (pushdown/broadcast assertions)
    streaming/    Structured Streaming subscriptions + watermark fence
    sources/      batch/stream source registry
"""

from streamkit_spark.engine import StreamkitEngine
from streamkit_spark.operators.produce import Store
from streamkit_spark.pipeline import CurationConfig, curate, curation_report
from streamkit_spark.session import get_spark
from streamkit_spark.telemetry import StreamProgressListener, Telemetry

__all__ = [
    "get_spark",
    "StreamkitEngine",
    "Store",
    "curate",
    "curation_report",
    "CurationConfig",
    "Telemetry",
    "StreamProgressListener",
]
__version__ = "0.1.0"
