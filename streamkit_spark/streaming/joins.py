"""Stream-stream joins (Structured Streaming surface the batch layer
expresses as range/as-of joins — operators/asof.py, range_join).

The reference correlates two live feeds client-side (subscribe to both,
merge by timestamp — the S3 k-way merge contract, pkg/client/client.go
consume merge); the engine's native form is Spark's watermarked
stream-stream interval join: both sides declare event-time watermarks, the
join condition bounds how far the timestamps may drift, and Spark sizes /
evicts the join state from exactly those two facts (state is bounded by
watermark + interval; without them a stream-stream join grows forever).

Scale notes: the join shuffles both streams on the equi-keys per
micro-batch; state per key is O(rows within the interval window).  Skewed
keys behave like any shuffle join — salt or enlarge parallelism.  The
interval predicate must be on the SAME event-time columns the watermarks
are declared on, or Spark cannot prove state eviction and falls back to
unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamkit_spark.streaming.windows import with_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lower_ms: int,
    upper_ms: int,
    left_ts_ms: str = "ts",
    right_ts_ms: str = "ts",
    left_late: str = "2 minutes",
    right_late: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: rows pair when their equi-keys match
    and ``right.ts - left.ts`` lies in ``[lower_ms, upper_ms]``.

    Works identically on batch DataFrames (watermarks are no-ops there),
    so batch==stream parity is testable with the same call.  Column names
    from the right side are suffixed ``_r`` to keep the output join-safe.
    """
    lt = with_event_time(left, left_ts_ms, "l_time")
    rt = with_event_time(right, right_ts_ms, "r_time")
    if lt.isStreaming:
        lt = lt.withWatermark("l_time", left_late)
    if rt.isStreaming:
        rt = rt.withWatermark("r_time", right_late)
    renames = {c: f"{c}_r" for c in rt.columns if c in lt.columns}
    for old, new in renames.items():
        rt = rt.withColumnRenamed(old, new)
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lt[k] == rt[renames.get(k, k)])
    cond = (
        cond
        & (F.col("r_time") >= F.col("l_time") + F.expr(f"INTERVAL {lower_ms} MILLISECOND"))
        & (F.col("r_time") <= F.col("l_time") + F.expr(f"INTERVAL {upper_ms} MILLISECOND"))
    )
    return lt.join(rt, cond, how).drop("l_time", "r_time")
