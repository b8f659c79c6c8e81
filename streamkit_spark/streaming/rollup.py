"""Continuously-maintained rollups — the hypertable continuous-aggregate
pattern on Structured Streaming.

The reference's read surface always aggregates from raw events
(SegmentStatus scans, internal/enumerate/enumerate.go); a 100 TB event
table cannot afford that for dashboard-grade queries.  This module keeps
a day × event_type rollup table incrementally correct:

* watermarked event-time tumbling aggregate (bounded state — closed
  windows are evicted once the watermark passes),
* ``update`` output mode: each micro-batch emits ONLY the
  (day, event_type) groups the batch touched, carrying their full new
  totals,
* foreachBatch upsert via DYNAMIC partition overwrite: the sink is a
  parquet table partitioned by exactly the aggregate key, so replacing
  the touched partitions with the emitted rows IS the merge — no
  read-modify-write, no lock, and replaying a micro-batch is idempotent
  (same totals → same partition contents).

The combination is exactly-once at the partition level: totals are
recomputed from state, not incremented in place, so at-least-once
delivery of a batch cannot double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["rollup_aggregate", "maintain_rollup", "read_rollup"]


def rollup_aggregate(events: DataFrame, late: str = "10 minutes") -> DataFrame:
    """The shared aggregate definition (one definition serves batch
    backfill and streaming maintenance — parity-tested): daily event
    counts + value sums per space.

    ``events``: raw envelope rows with ``ts`` in epoch-ns and
    ``event_type``/``value`` columns.  Money-style exactness: the value
    sum goes through DECIMAL(18,2) so totals are partition-order
    independent."""
    ev = events.select(
        F.timestamp_millis(F.expr("ts div 1000000")).alias("event_time"),
        F.col("event_type"),
        F.col("value"),
    )
    if events.isStreaming:
        ev = ev.withWatermark("event_time", late)
    return (
        ev.groupBy(
            F.window("event_time", "1 day").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("value_sum"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            F.col("value_sum").cast("double").alias("value_sum"),
        )
    )


def maintain_rollup(
    events: DataFrame,
    path: str,
    checkpoint: str,
    late: str = "10 minutes",
):
    """Start the maintenance query: streaming events → incrementally
    upserted parquet rollup at ``path`` partitioned by (day, event_type).

    Each update-mode batch holds the full new totals for every touched
    (day, event_type); dynamic partition overwrite swaps exactly those
    partitions."""
    agg = rollup_aggregate(events, late)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "event_type")
            .parquet(path)
        )

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(upsert)
        .start()
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The maintained rollup as a queryable frame (partition pruning on
    day/event_type comes free from the layout).  Partition-column type
    inference turns ``day`` into a DATE; cast it back to the aggregate's
    yyyy-MM-dd string contract."""
    return (
        spark.read.parquet(path)
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
        .select("day", "event_type", "n_events", "value_sum")
    )
