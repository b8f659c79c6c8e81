"""Streaming window operators (SURVEY §2.9 T8 — engine extensions; the
reference has no windows, its time bounds are query parameters).

These are the streaming twins of operators/windows.py: same semantics,
expressed with event-time watermarks so state is bounded and late data has
a defined cutoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_event_time(
    stream: DataFrame, ts_ms_col: str = "ts", out_col: str = "event_time"
) -> DataFrame:
    """Attach a TimestampType event-time column from an epoch-ms long."""
    return stream.withColumn(out_col, F.timestamp_millis(F.col(ts_ms_col)))


def tumbling_counts(
    stream: DataFrame,
    width: str = "1 minute",
    late: str = "2 minutes",
    keys: list[str] | None = None,
    ts_ms_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.
    Append-mode-compatible: windows finalize once the watermark passes."""
    keys = keys or ["space", "segment"]
    s = with_event_time(stream, ts_ms_col)
    return (
        s.withWatermark("event_time", late)
        .groupBy(F.window("event_time", width).alias("win"), *keys)
        .agg(F.count("*").alias("n"), F.max("sequence").alias("max_sequence"))
        .select(
            F.unix_millis(F.col("win.start")).alias("window_start_ms"),
            *keys,
            "n",
            "max_sequence",
        )
    )


def session_counts(
    stream: DataFrame,
    gap: str = "5 minutes",
    late: str = "2 minutes",
    key: str = "segment",
    ts_ms_col: str = "ts",
) -> DataFrame:
    """Session-window aggregation (dynamic-gap sessions per key)."""
    s = with_event_time(stream, ts_ms_col)
    return (
        s.withWatermark("event_time", late)
        .groupBy(F.session_window("event_time", gap).alias("win"), key)
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("win.start")).alias("session_start_ms"),
            F.unix_millis(F.col("win.end")).alias("session_end_ms"),
            key,
            "n",
        )
    )


def running_segment_status(stream: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: the live
    SegmentStatus fold with explicit state (first/last sequence + ts),
    emitting one updated row per key per micro-batch.

    Functionally equivalent to the built-in agg in subscribe.status_stream
    — kept as the template for stateful logic the built-ins *can't* express
    (reference analog: mergeSegmentStatus, pebblekit/store.go:411-425)."""
    import pandas as pd  # noqa: PLC0415

    out_schema = (
        "space string, segment string, first_sequence long, first_ts long, "
        "last_sequence long, last_ts long"
    )
    state_schema = "first_sequence long, first_ts long, last_sequence long, last_ts long"

    def update(key, pdfs, state):
        first_seq = first_ts = last_seq = last_ts = None
        if state.exists:
            first_seq, first_ts, last_seq, last_ts = state.get
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("sequence")
            lo, hi = pdf.iloc[0], pdf.iloc[-1]
            if first_seq is None or lo["sequence"] < first_seq:
                first_seq, first_ts = int(lo["sequence"]), int(lo["ts"])
            if last_seq is None or hi["sequence"] > last_seq:
                last_seq, last_ts = int(hi["sequence"]), int(hi["ts"])
        state.update((first_seq, first_ts, last_seq, last_ts))
        yield pd.DataFrame(
            [
                {
                    "space": key[0],
                    "segment": key[1],
                    "first_sequence": first_seq,
                    "first_ts": first_ts,
                    "last_sequence": last_seq,
                    "last_ts": last_ts,
                }
            ]
        )

    return stream.groupBy("space", "segment").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
