"""Time-window operators: tumbling aggregation and sessionization
(SURVEY §2.9 T8 — the reference has no windows; these are the Spark-native
extensions its users would reach for).

Batch forms here (pure window/groupBy compositions); the streaming forms
are ``F.window``/``F.session_window`` over the same columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_ms: Column,
    width_ms: int,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed tumbling windows on an epoch-ms column: the window id is pure
    integer division — no shuffle beyond the aggregation itself, and the
    window id is a monotone partition-prunable key at scale."""
    win = (ts_ms / width_ms).cast("long").alias("window_id")
    return df.groupBy(win, *keys).agg(*aggs)


def sessionize(
    df: DataFrame,
    key: str,
    ts_ms: Column,
    gap_ms: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_ms``.

    Classic lag + running-sum over one (key, ts) window — a single shuffle
    on the key; each partition sorts once and both window functions share
    the frame."""
    w = Window.partitionBy(key).orderBy(ts_ms)
    gap = ts_ms - F.lag(ts_ms).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    df: DataFrame, key: str, ts_ms: Column, gap_ms: int
) -> DataFrame:
    """Per-key session summary: session count, events, span."""
    s = sessionize(df, key, ts_ms, gap_ms)
    ts = ts_ms
    per_session = s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("start_ms"),
        F.max(ts).alias("end_ms"),
    )
    return (
        per_session.groupBy(key)
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.col("end_ms") - F.col("start_ms")).alias("longest_session_ms"),
        )
        .orderBy(key)
    )
